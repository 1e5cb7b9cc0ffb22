"""IVF (inverted-file) coarse-quantized gallery search.

Beyond-parity serving feature: the reference always scores every gallery
item (full Q x G distmat, /root/reference/ibl/evaluators.py:105-129), and our
exact paths (ops.distance.topk_nearest) stream the whole index per query —
single-query latency is bounded by reading the entire index from HBM. IVF
buckets the gallery into ``nlist`` k-means cells and scores only the
``nprobe`` cells nearest each query, cutting HBM traffic per query by
~nlist/nprobe (e.g. 32x at nlist=1024, nprobe=32) at a small, tunable recall
cost. nprobe=nlist is exhaustive and matches the exact ranking.

TPU-native design:
  * static shapes throughout — cells are capacity-capped at build time
    (overflow spills to each row's next-nearest cell, so membership is
    exactly a partition); the padded (nlist, maxlen) id table makes every
    probe a fixed-size gather;
  * the query is a lax.scan over probe ranks merging a running top-k — the
    same streaming pattern as topk_nearest — so peak memory is one
    (Q, maxlen, D) candidate tile, never nprobe x maxlen at once;
  * int8/f16 reduced-precision galleries dequantize per tile inside the
    scan (composes with ops.distance.quantize_index_int8's storage format).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def build_ivf(descriptors, nlist=None, maxlen=None, iters=25, seed=0,
              train_size=65536):
    """Cluster a descriptor index into capacity-capped IVF cells.

    Args:
      descriptors: (N, D) float array (the SAME vectors the search will run
        over — for an int8 index, pass the dequantized ``codes * scales``).
      nlist: number of cells; default ~sqrt(N) rounded to a power of two.
      maxlen: per-cell capacity; default ceil(2 * N / nlist) (k-means cells
        are imbalanced; 2x average + spill keeps every row placed).
      iters: Lloyd iterations for the coarse quantizer (ops.kmeans).
      train_size: k-means subsample size (clustering cost control).

    Returns dict {"centroids": (nlist, D) f32, "lists": (nlist, maxlen)
    int32, -1 padded} — every gallery id appears in exactly one cell.
    """
    from openibl_tpu.ops.distance import topk_nearest
    from openibl_tpu.ops.kmeans import kmeans

    x = np.asarray(descriptors, np.float32)
    n = x.shape[0]
    if n == 0:
        raise ValueError("cannot build an IVF index over an empty gallery")
    if nlist is None:
        nlist = 2 ** int(np.round(np.log2(max(np.sqrt(n), 1.0))))
    nlist = int(min(max(nlist, 1), n))
    if maxlen is None:
        maxlen = -(-2 * n // nlist)
    maxlen = int(maxlen)
    if maxlen * nlist < n:
        raise ValueError(
            f"capacity nlist*maxlen={nlist * maxlen} < N={n}: every row "
            f"needs a cell"
        )

    rs = np.random.RandomState(seed)
    train = x if n <= train_size else x[rs.choice(n, train_size, False)]
    centroids, _ = kmeans(train, nlist, iters=iters, seed=seed)

    # rank each row's nearest cells on device, then fill capacity-capped
    # cells greedily on host
    depth = min(nlist, 8)
    _, ranked = topk_nearest(x, centroids, k=depth)
    lists = fill_lists(np.asarray(ranked), nlist, maxlen, x=x,
                       centroids=np.asarray(centroids, np.float32))
    return {"centroids": centroids.astype(np.float32), "lists": lists}


def fill_lists(ranked, nlist, maxlen, x=None, centroids=None):
    """Greedy capacity-capped cell assignment from per-row cell rankings.

    ``ranked`` (N, depth) int: each row's nearest cells, best first. A row
    lands in its nearest cell with room (k-means cells are imbalanced; the
    spill keeps shapes static without dropping rows — the search gathers
    cells, so membership must be a partition of the gallery). Returns the
    (nlist, maxlen) int32 id table, -1 padded.

    Rows whose ranked cells are ALL full spill to the nearest open cell by
    centroid distance when ``x``/``centroids`` are given (ADVICE r3: an
    arbitrary open cell makes overflow rows near-unreachable at low nprobe —
    a silent recall loss concentrated exactly on the dense regions that
    overflow); without geometry they take the first open cell. A warning
    reports the overflow count either way. ``x`` may be a DEVICE array:
    only the overflow rows are gathered/transferred (bench.py passes its
    HBM-resident gallery directly so it never crosses the tunnel whole).
    """
    n = ranked.shape[0]
    if nlist * maxlen < n:
        raise ValueError(
            f"capacity nlist*maxlen={nlist * maxlen} < N={n}: every row "
            f"needs a cell"
        )
    lists = np.full((nlist, maxlen), -1, np.int32)
    fill = np.zeros(nlist, np.int64)
    overflow = []
    for i in range(n):
        for c in ranked[i]:
            if fill[c] < maxlen:
                lists[c, fill[c]] = i
                fill[c] += 1
                break
        else:
            overflow.append(i)
    if overflow:  # all ranked cells full: spill to an open cell
        import warnings

        open_mask = fill < maxlen
        rank_geo = x is not None and centroids is not None
        if rank_geo:
            # one (O, nlist) distance block via a single matmul — the
            # per-row recompute was O(overflow * nlist * D) host work,
            # minutes of single-core numpy exactly when a large fraction
            # of a big gallery overflows
            xo = np.asarray(x[np.asarray(overflow)], np.float32)
            cc = np.asarray(centroids, np.float32)
            d_all = (
                np.sum(np.square(xo), axis=1, keepdims=True)
                - 2.0 * xo @ cc.T
                + np.sum(np.square(cc), axis=1)[None]
            )
        for j, i in enumerate(overflow):
            if rank_geo:
                c = int(np.argmin(np.where(open_mask, d_all[j], np.inf)))
            else:
                c = int(np.argmax(open_mask))  # first open cell
            lists[c, fill[c]] = i
            fill[c] += 1
            if fill[c] == maxlen:
                open_mask[c] = False
        warnings.warn(
            f"IVF: {len(overflow)} rows overflowed their {ranked.shape[1]} "
            f"nearest cells and spilled to the "
            f"{'nearest' if rank_geo else 'first'} open cell — consider a "
            f"larger maxlen if this is a large fraction of the gallery",
            stacklevel=2,
        )
    return lists


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search(query, gallery, centroids, lists, k, nprobe,
               gallery_scale=None, gallery_sqnorm=None):
    """Approximate k nearest gallery rows via the ``nprobe`` nearest cells.

    query (Q, D) f32; gallery (N, D) in storage dtype (f32/f16/bf16/int8 —
    int8 passes ``gallery_scale`` (N,) like ops.distance.topk_nearest);
    centroids/lists from build_ivf. Returns (sq_dists (Q, k), indices
    (Q, k)); unfilled result slots (fewer than k candidates probed) are
    (inf, -1). Exact squared-L2 distances on the probed subset — identical
    values to topk_nearest, just over fewer candidates.

    ``gallery_sqnorm`` (N,) f32: precomputed squared norms of the
    (dequantized) rows; probed tiles then gather norms instead of
    recomputing them from the gathered rows (see
    ops.distance.topk_nearest).

    NOTE batched-query cost: each query gathers its OWN nprobe cells, so
    probe traffic is Q * nprobe * maxlen rows — past Q*nprobe*maxlen ≈ N a
    single shared full scan (topk_nearest) is both exact AND cheaper
    (measured 4x at Q=16, nprobe=32 on a 100k gallery:
    logs/tpu_collect_r04/serving_latency.json). Serving auto-routes on
    exactly this inequality (serving.RetrievalService).
    """
    q = jnp.asarray(query, jnp.float32)
    g = jnp.asarray(gallery)
    c = jnp.asarray(centroids, jnp.float32)
    nlist = c.shape[0]
    nprobe = min(nprobe, nlist)
    k = min(k, g.shape[0])

    # coarse ranking: one small (Q, nlist) matmul. HIGHEST precision so the
    # query-time probe ranking agrees with the HIGHEST-precision build-time
    # cell assignment near cell boundaries (bf16 rounding there silently
    # drops the true neighbor's cell from the nprobe set)
    qc = jnp.dot(q, c.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(jnp.square(c), axis=1)[None, :]
    _, probe_ids = jax.lax.top_k(-(c2 - 2.0 * qc), nprobe)  # (Q, nprobe)

    q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
    init = (
        jnp.full((q.shape[0], k), jnp.inf, jnp.float32),
        jnp.full((q.shape[0], k), -1, jnp.int32),
    )

    def body(carry, j):
        best_d, best_i = carry
        ids = jnp.take(lists, probe_ids[:, j], axis=0)  # (Q, maxlen)
        safe = jnp.maximum(ids, 0)
        rows = jnp.take(g, safe.reshape(-1), axis=0)  # (Q*maxlen, D)
        rows = rows.astype(jnp.float32)  # transient upcast, one tile
        if gallery_scale is not None:
            s = jnp.take(jnp.asarray(gallery_scale, jnp.float32),
                         safe.reshape(-1))
            rows = rows * s[:, None]
        rows = rows.reshape(ids.shape + (g.shape[1],))  # (Q, maxlen, D)
        if gallery_sqnorm is not None:
            t2 = jnp.take(jnp.asarray(gallery_sqnorm, jnp.float32),
                          safe.reshape(-1)).reshape(ids.shape)
        else:
            t2 = jnp.sum(jnp.square(rows), axis=2)
        d = (q2 + t2
             - 2.0 * jnp.einsum(
                 "qd,qmd->qm", q, rows,
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST))
        d = jnp.where(ids < 0, jnp.inf, d)
        # cells partition the gallery: no id appears under two probes, so a
        # plain rowwise merge keeps indices unique
        md = jnp.concatenate([best_d, d], axis=1)
        mi = jnp.concatenate([best_i, ids], axis=1)
        neg_d, pos = jax.lax.top_k(-md, k)
        return (-neg_d, jnp.take_along_axis(mi, pos, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(init=init, xs=jnp.arange(nprobe),
                                       f=body)
    return best_d, best_i
