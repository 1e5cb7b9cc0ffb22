"""Fixed-shape padding helpers.

TPU/XLA compilation requires static shapes; the reference's samplers juggle
variable-length Python lists (/root/reference/ibl/utils/data/sampler.py:76-88).
We instead represent ragged index lists as dense ``(N, Lmax)`` int32 arrays
padded with ``-1`` plus an implicit validity mask (``idx >= 0``), so mining
runs as masked fixed-size top-k on device (SURVEY.md §7 "hard parts" #2).
"""

import numpy as np


def pad_index_lists(lists, pad_value=-1, max_len=None, dtype=np.int32):
    """Convert a list of int lists into a dense padded array.

    Returns (padded [N, Lmax] array, lengths [N] array).
    """
    n = len(lists)
    if max_len is None:
        max_len = max((len(l) for l in lists), default=0)
    max_len = max(max_len, 1)
    out = np.full((n, max_len), pad_value, dtype=dtype)
    lengths = np.zeros((n,), dtype=dtype)
    for i, l in enumerate(lists):
        k = min(len(l), max_len)
        out[i, :k] = l[:k]
        lengths[i] = k
    return out, lengths
