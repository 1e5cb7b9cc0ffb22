from openibl_tpu.utils.meters import AverageMeter
from openibl_tpu.utils.logging import Logger
from openibl_tpu.utils.padding import pad_index_lists

import numpy as np
import jax.numpy as jnp


def to_numpy(x):
    """Device array / list → numpy array (host)."""
    if isinstance(x, np.ndarray):
        return x
    return np.asarray(x)


def l2_normalize(x, axis=-1, eps=1e-12):
    """L2-normalize along ``axis`` (safe at zero norm).

    Matches the semantics of torch.nn.functional.normalize(p=2) used
    throughout the reference (e.g. /root/reference/ibl/models/netvlad.py:47).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)
