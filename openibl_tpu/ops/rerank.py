"""k-reciprocal Jaccard re-ranking (CVPR'17, Zhong et al.).

Re-implements the published k-reciprocal encoding algorithm used by the
reference for eval --rerank and SFRS difficult-positive mining
(/root/reference/ibl/utils/rerank.py:32-100, k1=25/20, k2=1, lambda≈0):

  1. squared distances, normalized per column by the column max, transposed
  2. per item: k-reciprocal neighbor set, expanded by half-k-reciprocal sets
     of its members when they overlap > 2/3
  3. V = exp(-d) over the expansion set, L1-normalized (sparse rows)
  4. optional query expansion (k2 > 1: mean of top-k2 neighbors' V rows)
  5. Jaccard distance from sparse min/sum intersection of V rows
  6. final = (1-λ)·jaccard + λ·original

This implementation vectorizes steps 3-5 with scipy.sparse (the V matrix has
~k1 nonzeros per row) instead of the reference's dense Python loops; an
optional C++ kernel (native/rerank.cpp, loaded via ctypes) accelerates the
neighbor-expansion loop of step 2.
"""

import numpy as np

try:
    import scipy.sparse as sp
except ImportError:  # pragma: no cover
    sp = None

from openibl_tpu.ops import _native


def _k_reciprocal(initial_rank, i, k):
    """k-reciprocal neighbors of item i (rank includes self at position 0)."""
    forward = initial_rank[i, : k + 1]
    backward = initial_rank[forward, : k + 1]
    fi = np.nonzero(backward == i)[0]
    return forward[fi]


def _expansion_index(initial_rank, k1):
    """Per-item k-reciprocal expansion sets (step 2). Returns a list of
    index arrays."""
    n = initial_rank.shape[0]
    half = int(np.around(k1 / 2.0))
    out = []
    for i in range(n):
        k_recip = _k_reciprocal(initial_rank, i, k1)
        expansion = k_recip
        for candidate in k_recip:
            cand_recip = _k_reciprocal(initial_rank, candidate, half)
            if len(np.intersect1d(cand_recip, k_recip)) > (2.0 / 3.0) * len(
                cand_recip
            ):
                expansion = np.append(expansion, cand_recip)
        out.append(np.unique(expansion))
    return out


def re_ranking(q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6, lambda_value=0.3,
               initial_rank=None):
    """Re-ranked (Q, G) distance matrix. Same signature/semantics as the
    reference re_ranking (rerank.py:32).

    ``initial_rank``: optional (N, >=max(k1+1,k2)) precomputed nearest-
    neighbor indices over the q∪g union (row-wise top-k of the raw distances
    — the per-row normalization is order-preserving, so a device top-k of
    the un-normalized matrix is valid). Skips the host partial sort."""
    q_g_dist = np.asarray(q_g_dist, np.float32)
    n_q = q_g_dist.shape[0]
    n = n_q + q_g_dist.shape[1]
    # assemble the squared, column-max-normalized, transposed block matrix
    # in place — out-of-place numpy chains cost ~17s at N=8k on one core
    original = np.empty((n, n), np.float32)
    original[:n_q, :n_q] = q_q_dist
    original[:n_q, n_q:] = q_g_dist
    original[n_q:, :n_q] = q_g_dist.T
    original[n_q:, n_q:] = g_g_dist
    np.multiply(original, original, out=original)
    # the block matrix is symmetric (it is the full q∪g pairwise matrix), so
    # the reference's (X / colmax).T equals X / rowmax[:, None] — row max is
    # contiguous (fast) and the 256MB transpose copy disappears
    rowmax = original.max(axis=1)
    original /= rowmax[:, None]
    query_num = n_q

    # only the top max(k1+1, k2) neighbors per row are ever consulted
    # (k-reciprocal checks and query expansion) — partial selection is
    # O(N²) instead of the full argsort's O(N² log N), the dominant host
    # cost at Pitts30k scale (~17k x 17k)
    depth = min(max(k1 + 1, k2), n)
    if initial_rank is not None:
        assert initial_rank.shape[0] == n and initial_rank.shape[1] >= depth
        initial_rank = np.ascontiguousarray(initial_rank, np.int32)
    elif depth < n:
        part = np.argpartition(original, depth - 1, axis=1)[:, :depth]
        vals = np.take_along_axis(original, part, axis=1)
        order = np.argsort(vals, axis=1, kind="stable")
        initial_rank = np.take_along_axis(part, order, axis=1).astype(np.int32)
    else:
        initial_rank = np.argsort(original, axis=1).astype(np.int32)

    if _native.available():
        rows, cols, vals = _native.expansion_weights(original, initial_rank, k1)
    else:
        expansion = _expansion_index(initial_rank, k1)
        rows = np.concatenate(
            [np.full(len(e), i, np.int32) for i, e in enumerate(expansion)]
        )
        cols = np.concatenate(expansion).astype(np.int32)
        weights = [np.exp(-original[i, e]) for i, e in enumerate(expansion)]
        vals = np.concatenate([w / w.sum() for w in weights]).astype(np.float32)

    if sp is not None:
        v_mat = sp.csr_matrix((vals, (rows, cols)), shape=(n, n), dtype=np.float32)
    else:  # dense fallback
        v_dense = np.zeros((n, n), np.float32)
        v_dense[rows, cols] = vals
        v_mat = v_dense

    if k2 != 1:
        if sp is not None and sp.issparse(v_mat):
            v_new = sp.lil_matrix((n, n), dtype=np.float32)
            for i in range(n):
                v_new[i] = v_mat[initial_rank[i, :k2]].mean(axis=0)
            v_mat = v_new.tocsr()
        else:
            v_mat = np.stack(
                [v_mat[initial_rank[i, :k2]].mean(axis=0) for i in range(n)]
            )

    # Jaccard from sparse intersection: for queries only
    jaccard = _jaccard_from_v(v_mat, n, query_num)

    original_q = original[:query_num]
    final = jaccard * (1 - lambda_value) + original_q * lambda_value
    return final[:, query_num:]


def _jaccard_from_v(v_mat, n, query_num):
    if sp is not None and sp.issparse(v_mat):
        v_csr = v_mat.tocsr()
        jaccard = np.zeros((query_num, n), np.float32)
        v_csc = v_csr.T.tocsr()  # column access
        for i in range(query_num):
            row = v_csr.getrow(i)
            temp_min = np.zeros(n, np.float32)
            for j, vij in zip(row.indices, row.data):
                colj = v_csc.getrow(j)  # V[:, j] nonzeros
                temp_min[colj.indices] += np.minimum(vij, colj.data)
            jaccard[i] = 1.0 - temp_min / (2.0 - temp_min)
        return jaccard
    # dense
    jaccard = np.zeros((query_num, n), np.float32)
    for i in range(query_num):
        temp_min = np.minimum(v_mat[i][None, :], v_mat).sum(axis=1)
        jaccard[i] = 1.0 - temp_min / (2.0 - temp_min)
    return jaccard
