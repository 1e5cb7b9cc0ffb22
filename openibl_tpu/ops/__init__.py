from openibl_tpu.ops import losses, distance, pca  # noqa: F401
