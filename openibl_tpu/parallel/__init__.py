from openibl_tpu.parallel.mesh import (  # noqa: F401
    copy_tree,
    data_sharding,
    get_mesh,
    global_batch,
    globalize_tree,
    local_view_tree,
    maybe_init_distributed,
    process_local_mesh,
    replicated,
)
