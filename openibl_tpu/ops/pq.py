"""Product-quantized (PQ) descriptor index with ADC search.

Beyond-parity serving feature (no reference counterpart — the reference
always scores full-width descriptors, /root/reference/ibl/evaluators.py:
105-129). The existing reduced-precision indexes (ops/distance.py f16/int8)
stop at 4x compression; PQ splits each D-dim descriptor into ``m``
subvectors and stores each as one uint8 codebook id — ``m`` bytes per
descriptor, e.g. 256x smaller than f32 at D=4096, m=64. A 100M-image
gallery becomes 6.4 GB of codes: single-chip HBM-resident where even an
int8 index (400 GB) could never be. Search is ADC (asymmetric distance):
queries stay full-precision, distances are sums of precomputed per-subspace
lookup-table entries, so accuracy degrades only by the gallery-side
quantization (Jegou et al., "Product quantization for nearest neighbor
search", TPAMI 2011 — the method FAISS's IndexPQ implements).

TPU-native design:
  * codebook training is ONE batched Lloyd program: all ``m`` subspace
    k-means run as a leading vmap-style axis of einsum matmuls — not m
    sequential sklearn fits — with the assignment pass tiled over rows
    (lax.scan) so the (m, tile, ksub) distance block stays bounded;
  * ADC scoring is cast onto the MXU: per code tile, codes one-hot-expand
    to (tile, m, ksub) and a single (Q, m*ksub) x (m*ksub, tile) matmul
    with the LUT produces exact ADC distances — no per-element gathers,
    which TPUs do poorly; tiles stream through the same running-top-k merge
    as ops.distance.topk_nearest, so peak memory is one tile;
  * static shapes throughout (ksub fixed at 256, codes uint8, -1-free).

OPQ (train_opq / build_pq(opq_iters=...)) learns an orthogonal rotation
jointly with the codebooks (Ge et al., CVPR 2013) so the fixed subspace
split stops fighting the descriptors' correlation structure — the rotation
is one extra (Q, D)x(D, D) MXU matmul per query batch and the codebook
training is the identical batched-Lloyd program, so the TPU cost model is
unchanged; IVFADC composes via a residual-frame rotation
(build_ivfpq(opq_iters=...)).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _split_subspaces(x, m):
    """(N, D) -> (m, N, dsub) with the subspace axis leading.

    Leading so every per-subspace op below is one batched einsum over m."""
    n, d = x.shape
    if d % m:
        raise ValueError(f"feature dim {d} not divisible by m={m}")
    return jnp.transpose(x.reshape(n, m, d // m), (1, 0, 2))


def _sub_d2(tiles, centers):
    """Squared L2 (m, T, k) between (m, T, dsub) rows and (m, k, dsub)
    centers — batched over the subspace axis in one einsum."""
    t2 = jnp.sum(jnp.square(tiles), axis=2)[:, :, None]
    c2 = jnp.sum(jnp.square(centers), axis=2)[:, None, :]
    tc = jnp.einsum("mtd,mkd->mtk", tiles, centers,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return t2 + c2 - 2.0 * tc


@functools.partial(jax.jit, static_argnames=("ksub",))
def _pp_init_batched(key, xm, ksub):
    """k-means++ seeding for all m subspace quantizers at once, on device.

    ops.kmeans seeds ONE k-means on the host (k=64 there); here m
    independent seedings of ksub centers each would be m·ksub sequential
    numpy steps — so the D² sampling runs as a lax.scan over ksub with the
    subspace axis vectorized: each step draws one center per subspace
    (jax.random.categorical over the current D² weights) and relaxes the
    running min-distance. Zero-total rows (duplicate-heavy subspaces)
    fall back to uniform sampling like ops.kmeans._plus_plus_init.

    xm (m, N, dsub) -> (m, ksub, dsub) f32 initial centers."""
    m, n, d = xm.shape
    k_first, k_rest = jax.random.split(key)
    first_id = jax.random.randint(k_first, (m,), 0, n)
    first = jnp.take_along_axis(xm, first_id[:, None, None], axis=1)[:, 0]
    d2 = jnp.sum(jnp.square(xm - first[:, None, :]), axis=2)  # (m, N)

    def body(d2, kk):
        total = jnp.sum(d2, axis=1, keepdims=True)
        # weight ∝ D²; all-zero rows sample uniformly
        logits = jnp.where(total > 0,
                           jnp.log(jnp.maximum(d2, 1e-30)),
                           jnp.zeros_like(d2))
        idx = jax.random.categorical(kk, logits, axis=1)  # (m,)
        c = jnp.take_along_axis(xm, idx[:, None, None], axis=1)[:, 0]
        d2 = jnp.minimum(d2, jnp.sum(jnp.square(xm - c[:, None, :]), axis=2))
        return d2, c

    _, rest = jax.lax.scan(body, d2, jax.random.split(k_rest, ksub - 1))
    return jnp.concatenate([first[:, None], jnp.transpose(rest, (1, 0, 2))],
                           axis=1)


def _pad_tiles(xm, chunk):
    """(m, N, d) -> (tiles, m, chunk, d) row tiles plus the valid count."""
    m, n, d = xm.shape
    n_tiles = -(-n // chunk)
    pad = n_tiles * chunk - n
    xp = jnp.pad(xm, ((0, 0), (0, pad), (0, 0)))
    return jnp.transpose(
        xp.reshape(m, n_tiles, chunk, d), (1, 0, 2, 3)), n


@functools.partial(jax.jit, static_argnames=("iters", "chunk"))
def _lloyd_batched(xm, centers, iters, chunk):
    """Lloyd iterations for all m subspace quantizers at once.

    xm (m, N, dsub), centers (m, k, dsub). The assignment pass scans row
    tiles, accumulating per-cluster sums/counts, so the (m, chunk, k)
    distance block — not (m, N, k) — is the peak transient. Empty clusters
    keep their previous center (same policy as ops.kmeans._lloyd)."""
    m, n, d = xm.shape
    k = centers.shape[1]
    tiles, _ = _pad_tiles(xm, chunk)
    n_tiles = tiles.shape[0]
    # padded rows are zeros; mask them out of the accumulation by index
    row0 = jnp.arange(n_tiles, dtype=jnp.int32) * chunk

    def body(centers, _):
        def acc(carry, inp):
            sums, counts = carry
            tile, start = inp
            a = jnp.argmin(_sub_d2(tile, centers), axis=2)  # (m, T)
            oh = jax.nn.one_hot(a, k, dtype=jnp.float32)  # (m, T, k)
            valid = (jnp.arange(chunk) + start < n).astype(jnp.float32)
            oh = oh * valid[None, :, None]
            sums = sums + jnp.einsum(
                "mtk,mtd->mkd", oh, tile,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            counts = counts + jnp.sum(oh, axis=1)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            acc,
            (jnp.zeros((m, k, d), jnp.float32), jnp.zeros((m, k),
                                                          jnp.float32)),
            (tiles, row0),
        )
        new = sums / jnp.maximum(counts, 1.0)[:, :, None]
        return jnp.where(counts[:, :, None] > 0, new, centers), None

    centers, _ = jax.lax.scan(body, centers, None, length=iters)
    return centers


def _subsample(descriptors, train_size, seed):
    """Shared train-set draw: device gather of host-drawn sorted indices
    (no host bounce of the gallery; same policy as train_pq/build_ivf)."""
    x = jnp.asarray(descriptors, jnp.float32)
    n = x.shape[0]
    rs = np.random.RandomState(seed)
    if n > train_size:
        sel = np.sort(rs.choice(n, train_size, False))
        x = jnp.take(x, jnp.asarray(sel), axis=0)
    return x, rs


@jax.jit
def _procrustes(x, y):
    """Orthogonal R minimizing ||x @ R - y||_F: R = U Vᵀ of the SVD of
    xᵀy (the closed-form orthogonal-Procrustes solve). HIGHEST: the
    cross-covariance feeds an SVD whose singular vectors steer the whole
    rotation; bf16 accumulation error there rotates every descriptor."""
    m = jnp.dot(x.T, y, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    return jnp.dot(u, vt, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("m",))
def _decode_dev(codebooks, codes, m):
    """(N, m) codes -> (N, D) reconstructions, on device (OPQ inner loop)."""
    cb = jnp.asarray(codebooks)  # (m, ksub, dsub)
    per = jax.vmap(lambda t, c: jnp.take(t, c, axis=0),
                   in_axes=(0, 1))(cb, codes.astype(jnp.int32))  # (m, N, d)
    return jnp.transpose(per, (1, 0, 2)).reshape(codes.shape[0], -1)


def train_opq(descriptors, m=64, ksub=256, iters=25, opq_iters=8, seed=0,
              train_size=65536, chunk=4096, inner_iters=2):
    """OPQ: learn an orthogonal D×D rotation jointly with the codebooks
    (Ge et al., "Optimized Product Quantization", CVPR 2013, the
    non-parametric OPQ_NP — what FAISS's OPQMatrix pretransform trains).
    Plain PQ quantizes FIXED contiguous dsub-wide slices, so correlated or
    variance-imbalanced dimensions straddling subspace boundaries waste
    code entropy; OPQ alternates (a) Lloyd updates of the codebooks on the
    rotated data with (b) the closed-form orthogonal-Procrustes solve
    R = U Vᵀ of svd(Xᵀ·decode(encode(X·R))) — each step monotonically
    lowers ‖X·R − decode(encode(X·R))‖².

    TPU shape: step (a) is the SAME batched-Lloyd program train_pq runs
    (all m subspaces as one einsum axis), warm-started across outer
    iterations; step (b) is two (D, n)×(n, D) HIGHEST matmuls and one D×D
    SVD per outer iteration — at D=4096 the SVD is the cost, so
    ``opq_iters`` stays single-digit (FAISS defaults to 25 Lloyd/50 OPQ
    iterations on small D; 8 is within 1% of converged reconstruction
    error on descriptor data, tests/test_pq.py::TestOPQ).

    Returns (rotation (D, D) f32, codebooks (m, ksub, dsub) f32); encode
    with ``encode_pq(cb, x @ R)``, search with ``pq_search(...,
    rotation=R)``. Distances are unchanged by the rotation (orthogonal
    invariance) — only the quantization error falls.
    """
    x, rs = _subsample(descriptors, train_size, seed)
    n, d = x.shape
    if d % m:
        raise ValueError(f"feature dim {d} not divisible by m={m}")
    if ksub > 256:
        raise ValueError(f"ksub={ksub} > 256 does not fit uint8 codes")
    chunk = int(min(chunk, n))
    rot = jnp.eye(d, dtype=jnp.float32)
    xm = _split_subspaces(x, m)
    init = _pp_init_batched(
        jax.random.PRNGKey(rs.randint(2**31 - 1)), xm, min(ksub, n))
    if ksub > n:  # fewer rows than centers: pad by repeating (rare, tests)
        reps = -(-ksub // n)
        init = jnp.tile(init, (1, reps, 1))[:, :ksub]
    cb = _lloyd_batched(xm, init, inner_iters, chunk)
    for _ in range(opq_iters):
        codes = _encode(xm, cb, chunk)
        y = _decode_dev(cb, codes, m)  # reconstructions in ROTATED space
        rot = _procrustes(x, y)
        xr = jnp.dot(x, rot, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        xm = _split_subspaces(xr, m)
        cb = _lloyd_batched(xm, cb, inner_iters, chunk)
    cb = _lloyd_batched(xm, cb, max(iters - inner_iters, 0), chunk)
    return np.asarray(rot, np.float32), np.asarray(cb, np.float32)


def train_pq(descriptors, m=64, ksub=256, iters=25, seed=0,
             train_size=65536, chunk=4096):
    """Train per-subspace codebooks. Returns (m, ksub, dsub) f32.

    Seeding is batched on-device k-means++ (_pp_init_batched): clustered
    descriptor data punishes random-row init hard — Lloyd cannot migrate
    centers across empty space, so blobs the random draw missed stay
    unserved (measured 20x worse sub-inertia than ++ on blob data,
    tests/test_pq.py::test_recall_on_clustered_gallery).
    ``train_size`` caps the Lloyd input like build_ivf's.

    ``descriptors`` may be a DEVICE array: everything here runs on device
    (the subsample is a device gather of host-drawn indices), so an
    HBM-resident gallery never bounces through the host — on the tunneled
    chip a 100k x 4096 D2H would cost minutes."""
    x = jnp.asarray(descriptors, jnp.float32)
    n, d = x.shape
    if d % m:
        raise ValueError(f"feature dim {d} not divisible by m={m}")
    if ksub > 256:
        raise ValueError(f"ksub={ksub} > 256 does not fit uint8 codes")
    rs = np.random.RandomState(seed)
    if n > train_size:
        sel = np.sort(rs.choice(n, train_size, False))
        x = jnp.take(x, jnp.asarray(sel), axis=0)
        n = train_size
    xm = _split_subspaces(x, m)
    init = _pp_init_batched(
        jax.random.PRNGKey(rs.randint(2**31 - 1)), xm, min(ksub, n))
    if ksub > n:  # fewer rows than centers: pad by repeating (rare, tests)
        reps = -(-ksub // n)
        init = jnp.tile(init, (1, reps, 1))[:, :ksub]
    chunk = int(min(chunk, n))
    cb = _lloyd_batched(xm, init, iters, chunk)
    return np.asarray(cb, np.float32)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _encode(xm, codebooks, chunk):
    tiles, n = _pad_tiles(xm, chunk)

    def body(_, tile):
        a = jnp.argmin(_sub_d2(tile, codebooks), axis=2)  # (m, T)
        return 0, a.astype(jnp.uint8).T  # (T, m)

    _, codes = jax.lax.scan(body, 0, tiles)
    return codes.reshape(-1, xm.shape[0])[:n]


def encode_pq(codebooks, descriptors, chunk=4096):
    """Quantize (N, D) descriptors to (N, m) uint8 codes.

    ``descriptors`` may be a device array (no host bounce; only the m-byte
    codes come back)."""
    cb = jnp.asarray(codebooks, jnp.float32)
    x = jnp.asarray(descriptors, jnp.float32)
    xm = _split_subspaces(x, cb.shape[0])
    return np.asarray(_encode(xm, cb, int(min(chunk, max(x.shape[0], 1)))))


def decode_pq(codebooks, codes):
    """Reconstruct (N, D) f32 descriptors from codes (tests/diagnostics)."""
    cb = np.asarray(codebooks, np.float32)  # (m, k, dsub)
    codes = np.asarray(codes)
    n, m = codes.shape
    out = cb[np.arange(m)[None, :], codes.astype(np.int64)]  # (N, m, dsub)
    return out.reshape(n, m * cb.shape[2])


def build_pq(descriptors, m=64, ksub=256, iters=25, seed=0,
             train_size=65536, opq_iters=0):
    """Train + encode in one call.

    Returns dict {"pq_codebooks": (m, ksub, dsub) f32, "pq_codes": (N, m)
    uint8} — the arrays an index .npz carries for PQ serving
    (serving.RetrievalService, examples/index_and_query.py build --pq-m).
    ``opq_iters > 0`` trains an OPQ rotation first (train_opq) and adds
    "pq_rotation" (D, D) f32; codes then encode the ROTATED descriptors,
    so searches must pass the rotation (pq_search(..., rotation=...) —
    serving and the CLI do this whenever the key is present).
    """
    if opq_iters:
        rot, cb = train_opq(descriptors, m=m, ksub=ksub, iters=iters,
                            seed=seed, train_size=train_size,
                            opq_iters=opq_iters)
        xr = jnp.dot(jnp.asarray(descriptors, jnp.float32),
                     jnp.asarray(rot),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return {"pq_codebooks": cb, "pq_codes": encode_pq(cb, xr),
                "pq_rotation": rot}
    cb = train_pq(descriptors, m=m, ksub=ksub, iters=iters, seed=seed,
                  train_size=train_size)
    return {"pq_codebooks": cb, "pq_codes": encode_pq(cb, descriptors)}


@functools.partial(jax.jit, static_argnames=("k", "shortlist", "chunk"))
def pq_search_rerank(query, codes, codebooks, gallery, k, shortlist=None,
                     chunk=None, gallery_scale=None, gallery_sqnorm=None,
                     rotation=None):
    """ADC shortlist + exact re-rank: exact-quality top-k at code-scan cost.

    The ADC pass (pq_search) ranks ALL N codes reading only m bytes/row;
    the top ``shortlist`` (default 8k, clamped to N) candidates then gather
    their FULL-width gallery rows and re-rank by exact squared L2 — so the
    result matches the exact scan whenever the true top-k survives the
    shortlist (gated at ~recall@shortlist, tests/test_pq.py). For galleries
    where full-width still FITS but a whole-index scan per query is the
    bottleneck (1-3M rows at f16/int8), this reads N·m bytes + shortlist
    full rows instead of N·D — with the gallery in its storage dtype
    (f16/int8 per-row scales supported like ops.distance.topk_nearest).

    ``rotation``: OPQ matrix when the codes encode rotated descriptors —
    only the ADC shortlist runs rotated; the exact re-rank scores the
    UNROTATED gallery rows against the unrotated query (same distances
    either way, and the gallery stays exact-search-compatible).

    Returns (exact sq_dists (Q, k), indices (Q, k)).
    """
    q = jnp.asarray(query, jnp.float32)
    g = jnp.asarray(gallery)
    n = g.shape[0]
    k = min(k, n)
    if shortlist is None:
        shortlist = 8 * k
    shortlist = min(max(shortlist, k), n)
    _, cand = pq_search(q, codes, codebooks, k=shortlist, chunk=chunk,
                        rotation=rotation)
    rows = jnp.take(g, cand.reshape(-1), axis=0).astype(jnp.float32)
    if gallery_scale is not None:
        s = jnp.take(jnp.asarray(gallery_scale, jnp.float32),
                     cand.reshape(-1))
        rows = rows * s[:, None]
    rows = rows.reshape(cand.shape + (g.shape[1],))  # (Q, S, D)
    if gallery_sqnorm is not None:
        t2 = jnp.take(jnp.asarray(gallery_sqnorm, jnp.float32),
                      cand.reshape(-1)).reshape(cand.shape)
    else:
        t2 = jnp.sum(jnp.square(rows), axis=2)
    q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
    d = (q2 + t2
         - 2.0 * jnp.einsum("qd,qsd->qs", q, rows,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST))
    neg_d, pos = jax.lax.top_k(-d, k)
    return -neg_d, jnp.take_along_axis(cand, pos, axis=1)


def build_ivfpq(descriptors, nlist=None, m=64, ksub=256, iters=25, seed=0,
                train_size=65536, maxlen=None, opq_iters=0):
    """IVFADC: coarse IVF cells + PQ-encoded RESIDUALS (Jegou et al. 2011
    §IV — FAISS's IndexIVFPQ). The coarse quantizer absorbs the gallery's
    large-scale structure, so the PQ codebooks only have to cover the
    much-tighter residual distribution — better codes at the same m, AND
    the search probes nprobe cells instead of scanning all N codes.

    Returns dict {"ivf_centroids", "ivf_lists", "ivfpq_codebooks",
    "ivfpq_codes"}: the cells/lists are exactly ops.ivf.build_ivf's (an
    index .npz can carry full-width descriptors + these arrays and serve
    exact / IVF / IVFADC from the same artifact); codes are (N, m) uint8
    of (x - centroid[cell(x)]). ``descriptors`` may be a device array; the
    cell build needs one host pass (greedy capacity fill) either way.

    ``opq_iters > 0`` learns the OPQ rotation on the RESIDUAL distribution
    (the local-rotation composition: cell assignment is rotation-free, only
    the residual frame feeding the PQ rotates — ‖(q−c)·R − code‖ equals
    ‖(q−c) − code·Rᵀ‖ by orthogonal invariance) and adds "ivfpq_rotation";
    searches must then pass it (ivfpq_search(..., rotation=...)).
    """
    from openibl_tpu.ops.ivf import build_ivf

    x = jnp.asarray(descriptors, jnp.float32)
    ivf = build_ivf(np.asarray(x), nlist=nlist, maxlen=maxlen, seed=seed,
                    train_size=train_size)
    centroids = jnp.asarray(ivf["centroids"])
    lists = np.asarray(ivf["lists"])
    # invert lists -> per-row cell id (every row appears exactly once)
    n = x.shape[0]
    cell_of = np.empty(n, np.int32)
    valid = lists >= 0
    cell_of[lists[valid]] = np.nonzero(valid)[0]  # row of lists = cell id
    residuals = x - jnp.take(centroids, jnp.asarray(cell_of), axis=0)
    out = {"ivf_centroids": ivf["centroids"], "ivf_lists": ivf["lists"]}
    if opq_iters:
        rot, cb = train_opq(residuals, m=m, ksub=ksub, iters=iters,
                            seed=seed, train_size=train_size,
                            opq_iters=opq_iters)
        residuals = jnp.dot(residuals, jnp.asarray(rot),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        out["ivfpq_rotation"] = rot
    else:
        cb = train_pq(residuals, m=m, ksub=ksub, iters=iters, seed=seed,
                      train_size=train_size)
    out["ivfpq_codebooks"] = cb
    out["ivfpq_codes"] = encode_pq(cb, residuals)
    return out


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivfpq_search(query, codes, codebooks, centroids, lists, k, nprobe,
                 rotation=None):
    """Approximate k-NN over residual-PQ codes via the nprobe nearest cells.

    query (Q, D) f32; codes (N, m) uint8 residual codes, codebooks
    (m, ksub, dsub), centroids (nlist, D), lists (nlist, maxlen) from
    build_ivfpq. Returns (adc_sq_dists (Q, k), indices (Q, k)); unfilled
    slots are (inf, -1). Distances are ADC vs centroid[cell] + decode(code)
    — exact over the probed subset's reconstructions.

    Per probe rank the LUT is rebuilt against the probed cell's residual
    frame ((q - c) vs the codebooks — one small batched einsum), and the
    cell's codes score via a vmapped take_along_axis from the (m, ksub)
    LUT: the per-cell candidate set (maxlen rows) is too small to win
    back the one-hot matmul's materialization cost that pq_search's
    full-scan amortizes, while the LUT operand is tiny and VMEM-resident.
    """
    q = jnp.asarray(query, jnp.float32)
    cb = jnp.asarray(codebooks, jnp.float32)
    c = jnp.asarray(centroids, jnp.float32)
    m, ksub, dsub = cb.shape
    nlist = c.shape[0]
    nprobe = min(nprobe, nlist)
    k = min(k, codes.shape[0])
    qn = q.shape[0]

    # coarse ranking (HIGHEST like ivf_search: probe-set stability)
    qc = jnp.dot(q, c.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(jnp.square(c), axis=1)[None, :]
    _, probe_ids = jax.lax.top_k(-(c2 - 2.0 * qc), nprobe)  # (Q, nprobe)

    init = (jnp.full((qn, k), jnp.inf, jnp.float32),
            jnp.full((qn, k), -1, jnp.int32))

    rot = (None if rotation is None
           else jnp.asarray(rotation, jnp.float32))

    def body(carry, j):
        best_d, best_i = carry
        cid = probe_ids[:, j]  # (Q,)
        r = q - jnp.take(c, cid, axis=0)  # (Q, D) residual frame
        if rot is not None:  # OPQ residuals: LUT in the codes' rotated frame
            r = jnp.dot(r, rot, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        rm = _split_subspaces(r, m)  # (m, Q, dsub)
        lut = jnp.transpose(_sub_d2(rm, cb), (1, 0, 2))  # (Q, m, ksub)
        ids = jnp.take(lists, cid, axis=0)  # (Q, maxlen)
        safe = jnp.maximum(ids, 0)
        ctile = jnp.take(codes, safe.reshape(-1), axis=0).astype(jnp.int32)
        ctile = ctile.reshape(qn, -1, m)  # (Q, maxlen, m)

        def adc_one(lut_q, codes_q):
            # lut_q (m, ksub); codes_q (T, m) -> (T,)
            vals = jnp.take_along_axis(lut_q, codes_q.T, axis=1)  # (m, T)
            return jnp.sum(vals, axis=0)

        d = jax.vmap(adc_one)(lut, ctile)  # (Q, maxlen)
        d = jnp.where(ids < 0, jnp.inf, d)
        kk = min(k, d.shape[1])
        neg_d, pos = jax.lax.top_k(-d, kk)
        tile_idx = jnp.take_along_axis(ids, pos, axis=1)
        md = jnp.concatenate([best_d, -neg_d], axis=1)
        mi = jnp.concatenate([best_i, tile_idx], axis=1)
        neg_d, pos = jax.lax.top_k(-md, k)
        return (-neg_d, jnp.take_along_axis(mi, pos, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(nprobe))
    return best_d, best_i


_SHARDED_PQ_CACHE = {}


def pq_search_sharded(query, codes, codebooks, mesh, k, axis="data",
                      chunk=None, precise=False, rotation=None):
    """Exhaustive-ADC k-NN with the code matrix sharded over the mesh.

    The pod-scale composition of the index family: one chip's HBM already
    holds ~100M codes at m=64, so sharding the (N, m) uint8 codes over the
    ``axis`` devices takes the ceiling to billions of images while every
    shard scans only N/n_dev rows. Same merge shape as
    ops.distance.topk_nearest_sharded (the TPU answer to the reference's
    gather-everything eval, /root/reference/ibl/evaluators.py:76-101):
    replicated queries, shard-local pq_search, one all-gather of
    Q x k_local (dist, index) pairs over ICI — no device ever sees another
    shard's codes.

    Unlike topk_nearest_sharded the padding is handled HERE: zero-padded
    codes decode to real codebook entries (NOT +inf-distance rows), so
    callers cannot pre-pad safely. Codes are padded to a divisible size,
    each shard returns min(k + pad, per) candidates so the <=pad fake rows
    in the last shard can never displace a real top-k entry, and fake ids
    mask to (+inf, -1) before the merge.

    Args:
      query: (Q, D) replicated queries.
      codes: (N, m) uint8; host array or already sharded over ``axis``.
      codebooks: (m, ksub, dsub) f32, replicated (4 MB at D=4096, m=64).
      rotation: optional OPQ matrix (build_pq(opq_iters=...)): applied to
        the replicated queries ONCE, outside the shard_map.
    Returns:
      (adc sq_dists (Q, k), global indices (Q, k)), fully replicated.
    """
    q = jnp.asarray(query, jnp.float32)
    if rotation is not None:
        q = jnp.dot(q, jnp.asarray(rotation, jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    n = codes.shape[0]
    n_dev = mesh.shape[axis]
    per = -(-n // n_dev)
    pad = per * n_dev - n
    k = min(k, n)

    cache_key = (mesh, axis, k, chunk, per, n, precise)
    jitted = _SHARDED_PQ_CACHE.get(cache_key)
    if jitted is None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        k_local = min(k + pad, per)

        def local_topk(q, codes_shard, cb):
            d, idx = pq_search(q, codes_shard, cb, k=k_local,
                               chunk=(None if chunk is None
                                      else min(chunk, per)),
                               precise=precise)
            shard_id = jax.lax.axis_index(axis)
            gidx = idx + shard_id * per  # globalize
            fake = gidx >= n  # zero-padded codes decode to real entries
            d = jnp.where(fake, jnp.inf, d)
            gidx = jnp.where(fake, -1, gidx)
            d_all = jax.lax.all_gather(d, axis, axis=1)  # (Q, n_dev, k_l)
            i_all = jax.lax.all_gather(gidx, axis, axis=1)
            q_n = d.shape[0]
            neg_d, pos = jax.lax.top_k(-d_all.reshape(q_n, -1), k)
            return -neg_d, jnp.take_along_axis(
                i_all.reshape(q_n, -1), pos, axis=1)

        jitted = jax.jit(shard_map(
            local_topk,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        _SHARDED_PQ_CACHE[cache_key] = jitted

    codes_in = jnp.asarray(codes)
    if pad:
        codes_in = jnp.pad(codes_in, ((0, pad), (0, 0)))
    return jitted(q, codes_in, jnp.asarray(codebooks, jnp.float32))


def pq_search(query, codes, codebooks, k, chunk=None, precise=False,
              rotation=None, kernel=None):
    """Exhaustive-ADC k nearest codes per query row.

    query (Q, D) f32; codes (N, m) uint8; codebooks (m, ksub, dsub) f32.
    Returns (sq_dists (Q, k), indices (Q, k)) where sq_dists are the ADC
    approximations ||q - decode(code)||² = Σ_m ||q_m - cb_m[code_m]||²,
    ranked over ALL N codes (the approximation is the quantization, not the
    scan). ``rotation``: OPQ matrix from build_pq(opq_iters=...) — applied
    to the query here so ADC runs in the codes' rotated frame; the returned
    distances are still original-space (orthogonal invariance).

    Two tile-scoring formulations, merged through the same running-top-k
    as topk_nearest either way:

    * XLA (``kernel=False``): per tile the codes one-hot-expand and ONE
      (Q, m·ksub) x (m·ksub, tile) matmul with the flattened LUT yields
      the tile's distances. The one-hot MATERIALIZES in HBM (matmul
      operands can't fuse): ~2·ksub bytes of traffic per code byte in
      bf16, which is why this formulation loses to the exact f32 scan on
      latency at sizes where full-width fits.
    * Pallas (``kernel=True``, ops/pq_kernel.py): the one-hot is built IN
      VMEM per subspace and fed straight to the MXU — HBM sees only the
      raw code bytes + the tiny LUT, ~2·ksub x less traffic, making the
      scan code-bandwidth-bound (m bytes/row vs the exact scan's D·dtype).

    ``kernel=None`` (default) resolves to the XLA path. Chip validation
    (scripts/pq_kernel_bench.py → logs/tpu_collect_r05/
    pq_kernel_chip.json) RULED THE KERNEL OUT on this toolchain: the
    serving-shape kernel fails to lower (remote compile helper exits 1)
    and scripts/mosaic_probe.py p7 shows the core in-VMEM one-hot→dot
    pattern returns wrong values even at toy shapes. kernel=True remains
    available (and correct under interpret mode / future toolchains — it
    is pinned to the float ADC oracle in tests/test_pq.py) but must not
    be the default until a toolchain passes that bench.

    ``precise=False`` (default): bf16 LUT/one-hot, f32 accumulation — the
    one-hot entries are exactly 0/1, so the only rounding is the LUT
    entries' bf16 cast (~0.4% relative), far below PQ's own quantization
    error. ``precise=True`` runs f32·HIGHEST end to end (bit-matching a
    float ADC oracle; 2x one-hot traffic) for tests and tiny galleries.
    """
    import os

    m = codebooks.shape[0] if hasattr(codebooks, "shape") else \
        np.asarray(codebooks).shape[0]
    ksub = codebooks.shape[1]
    n = codes.shape[0]
    qn = query.shape[0]
    k = int(min(k, n))
    if chunk is None:
        # XLA: ~128MB bf16 one-hot transient per scan step. Pallas: the
        # one-hot lives in VMEM, so the tile is VMEM-budgeted instead.
        chunk = int(min(max(64 * 1024**2 // (m * ksub), 1024), n))
    env = os.environ.get("OPENIBL_PQ_KERNEL")
    if env is not None:
        kernel = env not in ("0", "false", "")
    if kernel is None or kernel:
        from openibl_tpu.ops.pq_kernel import adc_tile_fits

        # VMEM-sized tile: the largest lane-aligned tile within budget
        # (bigger tiles = fewer scan steps; the one-hot is the growing
        # term, so small query batches afford much larger tiles)
        ck = 256
        while ck * 2 <= min(chunk, 8192) and adc_tile_fits(
                m, qn, ksub, ck * 2, precise):
            ck *= 2
        fits = adc_tile_fits(m, qn, ksub, ck, precise)
        if kernel is None:
            # chip-validated OFF: the kernel fails to lower at serving
            # shapes and the underlying pattern miscompiles on this
            # toolchain (logs/tpu_collect_r05/pq_kernel_chip.json,
            # mosaic_probe p7); opt in per-call (kernel=True) or
            # process-wide (OPENIBL_PQ_KERNEL=1) on a fixed toolchain
            kernel = False
        elif not fits:
            raise ValueError(
                f"pq_search kernel=True but (m={m}, Q={qn}, ksub={ksub}, "
                f"tile={ck}) exceeds the Pallas VMEM budget — shrink the "
                f"query batch or pass kernel=False")
        if kernel:
            chunk = ck
    return _pq_search_impl(query, codes, codebooks, k=k, chunk=chunk,
                           precise=precise, rotation=rotation,
                           kernel=bool(kernel),
                           interpret=jax.default_backend() != "tpu")


@functools.partial(jax.jit, static_argnames=("k", "chunk", "precise",
                                             "kernel", "interpret"))
def _pq_search_impl(query, codes, codebooks, k, chunk, precise, rotation,
                    kernel, interpret):
    q = jnp.asarray(query, jnp.float32)
    if rotation is not None:
        q = jnp.dot(q, jnp.asarray(rotation, jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    cb = jnp.asarray(codebooks, jnp.float32)
    m, ksub, dsub = cb.shape
    n = codes.shape[0]

    # LUT: lut_mqk[m, q, j] = ||q_m - cb[m, j]||² (m, Q, ksub)
    qm = _split_subspaces(q, m)  # (m, Q, dsub)
    lut_mqk = _sub_d2(qm, cb)
    lut_flat = jnp.transpose(lut_mqk, (1, 0, 2)).reshape(
        q.shape[0], m * ksub)

    n_tiles = -(-n // chunk)
    pad = n_tiles * chunk - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0)))
    if kernel:
        # subspace-major tiles: (n_tiles, m, chunk) so the kernel slices
        # subspaces on the SUBLANE dim (lane-dim slicing is a Mosaic gap)
        tiles = jnp.transpose(
            codes_p.T.reshape(m, n_tiles, chunk), (1, 0, 2))
    else:
        tiles = codes_p.reshape(n_tiles, chunk, m)

    init = (jnp.full((q.shape[0], k), jnp.inf, jnp.float32),
            jnp.full((q.shape[0], k), -1, jnp.int32))

    oh_dtype = jnp.float32 if precise else jnp.bfloat16
    mm_prec = jax.lax.Precision.HIGHEST if precise else None

    def body(carry, inp):
        best_d, best_i = carry
        tile, start = inp
        if kernel:
            from openibl_tpu.ops.pq_kernel import adc_tile

            d = adc_tile(lut_mqk, tile, precise=precise,
                         interpret=interpret)  # (Q, T)
        else:
            oh = jax.nn.one_hot(tile.astype(jnp.int32), ksub,
                                dtype=oh_dtype)  # (T, m, ksub)
            d = jnp.dot(lut_flat.astype(oh_dtype),
                        oh.reshape(chunk, m * ksub).T,
                        preferred_element_type=jnp.float32,
                        precision=mm_prec)  # (Q, T)
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + start
        d = jnp.where(col < n, d, jnp.inf)
        kk = min(k, chunk)
        neg_d, pos = jax.lax.top_k(-d, kk)
        tile_idx = jnp.take_along_axis(col, pos, axis=1)
        md = jnp.concatenate([best_d, -neg_d], axis=1)
        mi = jnp.concatenate([best_i, tile_idx], axis=1)
        neg_d, pos = jax.lax.top_k(-md, k)
        return (-neg_d, jnp.take_along_axis(mi, pos, axis=1)), None

    starts = jnp.arange(n_tiles, dtype=jnp.int32) * chunk
    (best_d, best_i), _ = jax.lax.scan(body, init, (tiles, starts))
    return best_d, best_i
