"""Long-lived retrieval service: warm model + HBM-resident descriptor index.

The serving-shaped composition of the framework (the reference ships only
batch scripts; its hub model, /root/reference/hubconf.py:5-11, is the
per-image API this wraps for production use):

  * the EmbedNetPCA descriptor model stays compiled and warm;
  * the gallery index (descriptors + payload paths) lives in HBM across
    requests — queries never re-transfer it;
  * requests are padded to a small set of batch-size buckets so any request
    size reuses one of a few compiled programs (no per-size recompiles);
  * retrieval is the streaming/full-auto top-k used everywhere else
    (ops/distance.py), so million-image indexes work without a Q x G matrix.

Kept framework-level (no HTTP): examples/serve.py wraps it in a stdlib
HTTP server; embedders can call it directly.
"""

import threading

import numpy as np

_BATCH_BUCKETS = (1, 4, 16)


def _row_sqnorms(gallery, scales=None, chunk=8192):
    """Squared L2 norms of the (dequantized) index rows, one pass at load.

    Chunked so an int8 index is never widened whole on the host. Serving
    passes these to every search call — without them each request recomputes
    the norms, a full extra pass over an index that never changes
    (ops.distance.topk_nearest gallery_sqnorm)."""
    out = np.empty(gallery.shape[0], np.float32)
    for s in range(0, gallery.shape[0], chunk):
        t = np.asarray(gallery[s : s + chunk], np.float32)
        n2 = np.einsum("nd,nd->n", t, t)
        if scales is not None:
            n2 = n2 * np.square(np.asarray(scales[s : s + chunk], np.float32))
        out[s : s + chunk] = n2
    return out


def _ivf_beats_exact(batch, nprobe, maxlen, index_size):
    """Whether per-query IVF probing moves less data than one shared scan.

    Each query gathers its own nprobe cells (ops.ivf.ivf_search), so probe
    traffic is batch * nprobe * maxlen gallery rows; the exact streaming
    scan reads the index ONCE for the whole batch. Measured on chip at
    Q=16, nprobe=32, 100k gallery: routing to exact is 4x faster AND exact
    (logs/tpu_collect_r04/serving_latency.json before this fix)."""
    return batch * nprobe * maxlen < index_size


class RetrievalService:
    """Thread-safe query service over a fixed descriptor index.

    Args:
      index: path to an ``index_and_query.py build`` .npz (descriptors +
        paths), or a dict with "descriptors" (N, D), optional "paths", and
        — for an int8 index — per-row dequant "scales" (N,).
      weights: released .pth / our .npz checkpoint for the descriptor model
        (None = random init, for tests).
      pca_params: PCA-whitening .h5/.npz for trainer checkpoints that lack
        pca leaves (see hub.vgg16_netvlad; auto-discovered next to the
        checkpoint when omitted).
      height/width: model input resolution (the hub contract is 480x640).
      quantize_int8: quantize a float index to int8 at load (quarter-width
        in HBM; pre-quantized int8 indexes are detected automatically).
      ivf_nprobe: probe only this many IVF cells per query instead of
        scanning the whole index (ops.ivf; needs "ivf_centroids"/"ivf_lists"
        in the index — index_and_query.py build --ivf-nlist). 0 = exact
        search. Approximate: cuts per-query HBM traffic ~nlist/nprobe.
        Single-device only (ignored with a loud warning under a mesh —
        the sharded path stays exact). Batches large enough that per-query
        probing would read MORE than the whole index auto-route to the
        exact scan (strictly faster and exact — see _ivf_beats_exact).
      quant_backbone: run the conv backbone mixed bf16/int8 (ops/quant.py);
        calib_images optionally supplies representative calibration frames.
      use_pq: serve from the index's product-quantized codes (ops/pq.py;
        an OPQ rotation stored by build --opq-iters ("pq_rotation" /
        "ivfpq_rotation") is detected and applied to queries automatically;
        "pq_codes"/"pq_codebooks" from index_and_query.py build --pq-m) —
        ~D·4/m x smaller in HBM than f32 (256x at D=4096, m=64), searched
        by exhaustive ADC. Implied when the index carries ONLY PQ arrays
        (built with --pq-only). Approximate: distances are to the decoded
        codes; use for galleries too large for a full-width index. Under a
        ``mesh`` the codes shard over the data axis
        (ops.pq.pq_search_sharded) — the tier above one chip's ~100M-code
        ceiling; IVFADC (use_pq + ivf_nprobe) stays single-device.
      pq_rerank: >0 = ADC-shortlist-then-exact-re-rank (ops.pq
        pq_search_rerank): the PQ codes rank ALL rows reading m bytes
        each, the top ``pq_rerank`` candidates re-rank by exact distance
        against the full-width descriptors — exact-quality results while
        reading ~D·dtype/m x less index per query. Needs BOTH
        "pq_codes" and "descriptors" in the index (build --pq-m without
        --pq-only); composes with f16/int8 descriptor storage.
    """

    def __init__(self, index, weights=None, height=480, width=640,
                 batch_buckets=_BATCH_BUCKETS, mesh=None,
                 quantize_int8=False, ivf_nprobe=0, pca_params=None,
                 quant_backbone=False, calib_images=None, use_pq=False,
                 pq_rerank=0):
        import jax
        import jax.numpy as jnp

        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.ops.distance import (
            quantize_index_int8, topk_nearest, topk_nearest_sharded,
        )

        import os

        if isinstance(index, (str, bytes, os.PathLike)):
            data = np.load(index, allow_pickle=False)
            index = {k: data[k] for k in data.files}
        self.paths = [str(p) for p in index.get("paths", [])]
        self._pq_codebooks = None
        self.pq_rerank = int(pq_rerank)
        self.use_pq = bool(use_pq) or "descriptors" not in index
        if self.pq_rerank:
            # shortlist-then-exact mode: gallery prep follows the
            # full-width path below; only the search routing differs
            if "descriptors" not in index:
                raise ValueError(
                    "pq_rerank needs full-width descriptors alongside the "
                    "codes (build --pq-m WITHOUT --pq-only); a codes-only "
                    "index serves with use_pq alone"
                )
            if "pq_codes" not in index:
                raise ValueError(
                    "pq_rerank needs 'pq_codes' in the index — rebuild "
                    "with index_and_query.py build --pq-m"
                )
            if ivf_nprobe:
                raise ValueError(
                    "pq_rerank shortlists via the exhaustive ADC scan — "
                    "drop ivf_nprobe (or use use_pq+ivf_nprobe for IVFADC)"
                )
            self.use_pq = False
        if self.use_pq:
            if "pq_codes" not in index and "ivfpq_codes" not in index:
                raise ValueError(
                    "PQ serving needs 'pq_codes'/'pq_codebooks' (or IVFADC "
                    "'ivfpq_*') in the index — rebuild with "
                    "index_and_query.py build --pq-m"
                )
            if quantize_int8:
                raise ValueError(
                    "quantize_int8 does not apply to a PQ index (codes are "
                    "already 1 byte per subspace)"
                )
            if ivf_nprobe:
                # IVFADC: residual codes scored cell-by-cell (ops.pq
                # ivfpq_search). Plain pq_codes canNOT be probed — they
                # encode absolute vectors, not per-cell residuals.
                if "ivfpq_codes" not in index:
                    raise ValueError(
                        "IVF+PQ serving needs residual codes "
                        "('ivfpq_codes') — rebuild with "
                        "index_and_query.py build --pq-m --ivf-nlist"
                    )
                gallery = np.ascontiguousarray(index["ivfpq_codes"],
                                               np.uint8)
            elif "pq_codes" in index:
                gallery = np.ascontiguousarray(index["pq_codes"], np.uint8)
            else:
                raise ValueError(
                    "index carries only IVFADC residual codes (scored in "
                    "a probed cell's residual frame) — pass ivf_nprobe"
                )
            scales = None
        else:
            gallery = np.ascontiguousarray(index["descriptors"])
            scales = None
        if self.paths and len(self.paths) != gallery.shape[0]:
            # catch a malformed/truncated index at load — otherwise the
            # mismatch surfaces as per-request IndexError (HTTP 500s) only
            # for queries whose matches land past the shorter array
            raise ValueError(
                f"index has {gallery.shape[0]} descriptors but "
                f"{len(self.paths)} paths"
            )
        if not self.use_pq:
            if gallery.dtype == np.int8:
                if "scales" not in index:
                    raise ValueError(
                        "int8 index needs per-row 'scales' "
                        "(ops.distance.quantize_index_int8)"
                    )
                scales = np.asarray(index["scales"], np.float32)
            elif quantize_int8:
                gallery, scales = quantize_index_int8(gallery)
            elif gallery.dtype != np.float16:
                gallery = gallery.astype(np.float32, copy=False)
        # float16 indexes stay half-width in HBM, int8 quarter-width;
        # topk_nearest upcasts/dequantizes per-tile transiently
        # (descriptors are unit-norm, so reduced precision only reorders
        # near-tied matches); PQ codes stay uint8, scored by ADC
        self.index_size = gallery.shape[0]
        self.height, self.width = height, width
        self.buckets = tuple(sorted(batch_buckets))
        self._model, self._params = vgg16_netvlad(weights,
                                                  pca_params=pca_params)
        if quant_backbone:
            # mixed bf16/int8 backbone (ops/quant.py): ~1.2-1.4x faster conv
            # blocks on the MXU's int8 path; descriptor cosine vs f32 >0.999
            # (tests/test_quant.py). calib_images (N, H, W, 3) uint8/float
            # should be a few REPRESENTATIVE frames: activation scales are
            # per-tensor maxima, and deep VGG activations on structured
            # natural scenes (edges matching trained filters) can exceed
            # those on random noise — noise-calibrated scales may CLIP real
            # queries and silently degrade descriptors beyond the tested
            # fidelity gates (ADVICE r4).
            from openibl_tpu.ops.quant import quantize_model_params

            if calib_images is None:
                import warnings

                warnings.warn(
                    "quant_backbone=True without calib_images: calibrating "
                    "activation scales on random noise. Real-scene "
                    "activations can exceed noise-derived maxima and clip; "
                    "pass a few representative frames as calib_images for "
                    "production indexes",
                    stacklevel=2,
                )
                calib_images = np.random.RandomState(0).randint(
                    0, 256, (4, height, width, 3), dtype=np.uint8
                )
            self._model, self._params = quantize_model_params(
                self._model, self._params, jnp.asarray(calib_images)
            )
        self._lock = threading.Lock()  # serialize device work per process
        # plain PQ + mesh serves from codes sharded over the data axis
        # (ops.pq.pq_search_sharded — the pod-scale tier above one chip's
        # ~100M-code ceiling); IVFADC and the exact re-rank stay
        # single-device (their per-cell lists / full-width gather have no
        # sharded variant)
        if (self.pq_rerank or (self.use_pq and ivf_nprobe)) \
                and mesh is not None:
            import warnings

            warnings.warn(
                "IVFADC / pq_rerank serving is single-device; serving "
                "from the default device", stacklevel=2)
            mesh = None
        self.mesh = mesh

        self.ivf_nprobe = int(ivf_nprobe)
        # mesh downgrade FIRST: under a mesh ivf_nprobe is documented as
        # ignored-with-a-warning, so a mesh index without IVF tables must
        # warn-and-serve, not raise
        if self.ivf_nprobe and mesh is not None:
            import warnings

            warnings.warn("IVF serving is single-device; using the exact "
                          "sharded search instead", stacklevel=2)
            self.ivf_nprobe = 0
        if self.ivf_nprobe and "ivf_centroids" not in index:
            raise ValueError(
                "ivf_nprobe set but the index has no IVF tables — rebuild "
                "with index_and_query.py build --ivf-nlist"
            )

        if self.use_pq:
            from openibl_tpu.ops.pq import (
                ivfpq_search, pq_search, pq_search_sharded,
            )

            cb_key = "ivfpq_codebooks" if self.ivf_nprobe else "pq_codebooks"
            rot_key = "ivfpq_rotation" if self.ivf_nprobe else "pq_rotation"
            if mesh is not None:
                # shard the uint8 codes over the data axis; padding to a
                # divisible size is pq_search_sharded's job (zero codes
                # decode to REAL codebook entries, so the op masks fake
                # rows by global index — a caller-side zero-pad would not
                # rank last)
                from openibl_tpu.parallel.mesh import data_sharding

                if gallery.shape[0] % mesh.shape["data"] == 0:
                    gallery = jax.device_put(gallery,
                                             data_sharding(mesh, 2))
                self._gallery = gallery
            else:
                self._gallery = jnp.asarray(gallery)  # (N, m) uint8 codes
            self._scale = None
            # OPQ rotation (ops.pq train_opq): codes encode rotated
            # vectors/residuals, so the query side must rotate too
            self._pq_rotation = (jnp.asarray(index[rot_key], jnp.float32)
                                 if rot_key in index else None)
            self._pq_codebooks = jnp.asarray(index[cb_key], jnp.float32)
            if (self._pq_codebooks.shape[0] != gallery.shape[1]
                    or self._pq_codebooks.ndim != 3):
                raise ValueError(
                    f"{cb_key} shape {self._pq_codebooks.shape} does "
                    f"not match codes (N, m={gallery.shape[1]})"
                )
            fwd = jax.jit(self._model.apply)

            if self.ivf_nprobe:
                self._ivf_centroids = jnp.asarray(
                    index["ivf_centroids"], jnp.float32)
                self._ivf_lists = jnp.asarray(index["ivf_lists"], jnp.int32)

                def run(params, images, gallery, k):
                    return ivfpq_search(
                        fwd(params, images), gallery, self._pq_codebooks,
                        self._ivf_centroids, self._ivf_lists,
                        k=k, nprobe=self.ivf_nprobe,
                        rotation=self._pq_rotation)
            elif mesh is not None:
                def run(params, images, gallery, k):
                    # separate forward/search dispatches like the sharded
                    # full-width path: fusing the conv forward into the
                    # shard_map jit would GSPMD-partition it too
                    return pq_search_sharded(fwd(params, images), gallery,
                                             self._pq_codebooks, mesh, k=k,
                                             rotation=self._pq_rotation)
            else:
                def run(params, images, gallery, k):
                    return pq_search(fwd(params, images), gallery,
                                     self._pq_codebooks, k=k,
                                     rotation=self._pq_rotation)

            self._run = run
            return

        sqnorms = _row_sqnorms(gallery, scales)

        if mesh is not None:
            # shard the index over the mesh's data axis; zero-pad to a
            # divisible size (zero rows rank last for L2-normalized queries
            # only by luck, so mask them by index instead at merge time —
            # topk_nearest_sharded returns global indices, and padded rows
            # get sq-dist vs a zero vector = ||q||^2, which CAN beat real
            # matches; clamp k to the true size and drop padded ids)
            from openibl_tpu.parallel.mesh import data_sharding

            n_dev = mesh.shape["data"]
            pad = (-gallery.shape[0]) % n_dev
            if pad:
                gallery = np.concatenate(
                    [gallery,
                     np.zeros((pad, gallery.shape[1]), gallery.dtype)]
                )
                if scales is not None:
                    scales = np.concatenate(
                        [scales, np.zeros(pad, np.float32)]
                    )
                sqnorms = np.concatenate([sqnorms, np.zeros(pad, np.float32)])
            # device_put the HOST array with the sharding directly: each
            # shard transfers to its own device, so device 0 never stages
            # the full index (the point of sharding a large one)
            self._gallery = jax.device_put(gallery, data_sharding(mesh, 2))
            self._scale = (None if scales is None else
                           jax.device_put(scales, data_sharding(mesh, 1)))
            self._sqnorm = jax.device_put(sqnorms, data_sharding(mesh, 1))
            fwd = jax.jit(self._model.apply)

            def retrieve(desc, gallery, scale, k):
                # fetch enough candidates to survive dropping padded rows
                d, i = topk_nearest_sharded(desc, gallery, mesh,
                                            k=min(k + pad, gallery.shape[0]),
                                            gallery_scale=scale,
                                            gallery_sqnorm=self._sqnorm)
                valid = i < self.index_size
                d = jnp.where(valid, d, jnp.inf)
                order = jnp.argsort(d, axis=1)[:, :k]
                return (jnp.take_along_axis(d, order, axis=1),
                        jnp.take_along_axis(i, order, axis=1))

            retrieve = jax.jit(retrieve, static_argnames=("k",))

            # two dispatches on purpose: fusing the conv forward into the
            # shard_map jit makes GSPMD partition the forward too, which
            # deadlocks small batches on a virtual CPU mesh; the (B, 4096)
            # descriptor handoff between the jits is negligible
            def run(params, images, gallery, k):
                return retrieve(fwd(params, images), gallery, self._scale,
                                k=k)

            self._run = run
        else:
            self._gallery = jnp.asarray(gallery)  # HBM-resident, one device
            self._scale = None if scales is None else jnp.asarray(scales)
            self._sqnorm = jnp.asarray(sqnorms)
            # forward and top-k are separate jits on purpose: k is a static
            # arg, and a fused program would recompile the whole conv stack
            # for every new topk a client sends (tens of seconds, under the
            # request lock); split, only the small top-k program respecializes
            fwd = jax.jit(self._model.apply)

            def exact(desc, gallery, k):
                return topk_nearest(desc, gallery, k=k,
                                    gallery_scale=self._scale,
                                    gallery_sqnorm=self._sqnorm)

            if self.pq_rerank:
                from openibl_tpu.ops.pq import pq_search_rerank

                self._pq_codes = jnp.asarray(index["pq_codes"])
                self._pq_codebooks = jnp.asarray(
                    index["pq_codebooks"], jnp.float32)
                self._pq_rotation = (
                    jnp.asarray(index["pq_rotation"], jnp.float32)
                    if "pq_rotation" in index else None)

                def run(params, images, gallery, k):
                    return pq_search_rerank(
                        fwd(params, images), self._pq_codes,
                        self._pq_codebooks, gallery, k,
                        shortlist=self.pq_rerank,
                        gallery_scale=self._scale,
                        gallery_sqnorm=self._sqnorm,
                        rotation=self._pq_rotation)
            elif self.ivf_nprobe:
                from openibl_tpu.ops.ivf import ivf_search

                self._ivf_centroids = jnp.asarray(
                    index["ivf_centroids"], jnp.float32)
                self._ivf_lists = jnp.asarray(index["ivf_lists"], jnp.int32)
                maxlen = self._ivf_lists.shape[1]

                def run(params, images, gallery, k):
                    desc = fwd(params, images)
                    # per-bucket routing: IVF only while probing moves less
                    # data than one shared exact scan of the index
                    if not _ivf_beats_exact(images.shape[0], self.ivf_nprobe,
                                            maxlen, self.index_size):
                        return exact(desc, gallery, k)
                    return ivf_search(desc, gallery,
                                      self._ivf_centroids, self._ivf_lists,
                                      k=k, nprobe=self.ivf_nprobe,
                                      gallery_scale=self._scale,
                                      gallery_sqnorm=self._sqnorm)
            else:
                def run(params, images, gallery, k):
                    return exact(fwd(params, images), gallery, k)

            self._run = run

    def warmup(self, topk=10):
        """Compile every bucket up front so first requests aren't slow.
        Takes the request lock: a warmup issued while the HTTP server is
        already answering queries must not interleave device work the class
        otherwise serializes."""
        with self._lock:
            for b in self.buckets:
                z = np.zeros((b, self.height, self.width, 3), np.uint8)
                d, i = self._run(self._params, z, self._gallery,
                                 min(topk, self.index_size))
                np.asarray(i)

    def _preprocess(self, images):
        from PIL import Image

        from openibl_tpu.data.transforms import TestTransform

        # the SAME transform the index build uses (index_and_query.py) — a
        # resize-semantics drift between gallery and query descriptors would
        # silently skew retrieval
        tf = TestTransform(self.height, self.width, device_normalize=True)
        out = []
        for img in images:
            if isinstance(img, Image.Image):
                img = tf(img.convert("RGB"))
            img = np.asarray(img)
            if img.dtype != np.uint8:
                # a silent astype(uint8) would wrap float/mean-subtracted
                # pixels modulo 256 and embed garbage with no error — the
                # model does its own mean subtraction on device from RAW
                # uint8 pixels
                raise ValueError(
                    f"raw arrays must be uint8 pixels (got {img.dtype}); "
                    f"pass PIL images for automatic conversion — do NOT "
                    f"pre-normalize, the model normalizes on device"
                )
            if img.shape != (self.height, self.width, 3):
                raise ValueError(
                    f"image shape {img.shape} != "
                    f"({self.height}, {self.width}, 3); pass PIL images for "
                    f"automatic resizing"
                )
            out.append(img)
        return np.stack(out)

    def query(self, images, topk=10):
        """images: list of PIL images or (H, W, 3) uint8 arrays.

        Returns a list (one per image) of match lists
        ``[{"rank", "index", "sq_dist", "path"?}, ...]``.
        """
        if not len(images):
            return []
        if topk < 1:
            raise ValueError(f"topk must be >= 1, got {topk}")
        batch = self._preprocess(images)
        n = batch.shape[0]
        bucket = next((b for b in self.buckets if b >= n), None)
        if bucket is None:  # larger than the biggest bucket: chunk it
            # already preprocessed — chunk the stacked batch directly
            # instead of recursing through query()/_preprocess again
            results = []
            step = self.buckets[-1]
            for s in range(0, n, step):
                results.extend(self._query_batch(batch[s : s + step], topk))
            return results
        return self._query_batch(batch, topk, bucket)

    def _query_batch(self, batch, topk, bucket=None):
        """Run one preprocessed uint8 batch through a compiled bucket."""
        n = batch.shape[0]
        if bucket is None:
            bucket = next((b for b in self.buckets if b >= n), None)
            assert bucket is not None, (n, self.buckets)
        if bucket > n:  # pad to the bucket's compiled shape
            pad = np.zeros((bucket - n,) + batch.shape[1:], np.uint8)
            batch = np.concatenate([batch, pad])
        k = min(topk, self.index_size)
        with self._lock:
            d, idx = self._run(self._params, batch, self._gallery, k)
            d, idx = np.asarray(d)[:n], np.asarray(idx)[:n]
        out = []
        for row_d, row_i in zip(d, idx):
            matches = []
            rank = 0
            for i, dist in zip(row_i, row_d):
                if i < 0:  # unfilled IVF slot (fewer candidates than k)
                    continue
                rank += 1
                m = {"rank": rank, "index": int(i), "sq_dist": float(dist)}
                if self.paths:
                    m["path"] = self.paths[int(i)]
                matches.append(m)
            out.append(matches)
        return out
