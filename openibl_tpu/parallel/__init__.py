from openibl_tpu.parallel.mesh import get_mesh, data_sharding, replicated  # noqa: F401
