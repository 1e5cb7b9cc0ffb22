"""RetrievalService + HTTP server round-trip (tiny shapes, random weights)."""

import io
import json
import os.path as osp
import sys
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from openibl_tpu.serving import RetrievalService

EXAMPLES = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "examples")


@pytest.fixture(scope="module")
def service():
    rng = np.random.RandomState(0)
    gallery = rng.randn(32, 4096).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    svc = RetrievalService(
        {"descriptors": gallery,
         "paths": np.array([f"img_{i}.jpg" for i in range(32)])},
        weights=None, height=32, width=48, batch_buckets=(1, 2),
    )
    svc.warmup(topk=5)
    return svc


class TestRetrievalService:
    def test_query_pil_and_array(self, service):
        rng = np.random.RandomState(1)
        pil = Image.fromarray(
            rng.randint(0, 256, (100, 80, 3), np.uint8)
        )  # wrong size on purpose: service resizes PIL inputs
        arr = rng.randint(0, 256, (32, 48, 3), np.uint8)
        results = service.query([pil, arr], topk=5)
        assert len(results) == 2
        for matches in results:
            assert len(matches) == 5
            assert [m["rank"] for m in matches] == [1, 2, 3, 4, 5]
            dists = [m["sq_dist"] for m in matches]
            assert dists == sorted(dists)
            assert all(m["path"].startswith("img_") for m in matches)

    def test_deterministic(self, service):
        arr = np.random.RandomState(2).randint(0, 256, (32, 48, 3), np.uint8)
        a = service.query([arr], topk=3)[0]
        b = service.query([arr], topk=3)[0]
        assert a == b

    def test_oversized_batch_chunks(self, service):
        rng = np.random.RandomState(3)
        imgs = [rng.randint(0, 256, (32, 48, 3), np.uint8) for _ in range(5)]
        results = service.query(imgs, topk=2)  # > max bucket (2): chunked
        assert len(results) == 5

    def test_raw_array_wrong_shape_rejected(self, service):
        with pytest.raises(ValueError, match="shape"):
            service.query([np.zeros((8, 8, 3), np.uint8)])

    def test_raw_float_array_rejected(self, service):
        """Float arrays (e.g. pre-normalized pixels) must fail loudly: a
        silent astype(uint8) would wrap them modulo 256 and embed garbage."""
        with pytest.raises(ValueError, match="uint8"):
            service.query([np.zeros((32, 48, 3), np.float32)])

    def test_index_from_file(self, tmp_path):
        rng = np.random.RandomState(4)
        path = tmp_path / "index.npz"  # pathlib.Path accepted like str
        np.savez(path, descriptors=rng.randn(4, 4096).astype(np.float32))
        svc = RetrievalService(path, height=32, width=48, batch_buckets=(1,))
        out = svc.query([np.zeros((32, 48, 3), np.uint8)], topk=10)[0]
        assert len(out) == 4  # topk clamps to index size
        assert "path" not in out[0]  # no payloads in this index

    def test_float16_index_matches_float32(self):
        """A half-precision index returns the same ranking on separated
        galleries (fp16 storage, per-tile f32 upcast in topk_nearest)."""
        rng = np.random.RandomState(9)
        gallery = rng.randn(24, 4096).astype(np.float32)
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)
        out = []
        for dt in (np.float32, np.float16):
            svc = RetrievalService(
                {"descriptors": gallery.astype(dt)}, height=32, width=48,
                batch_buckets=(1,),
            )
            assert svc._gallery.dtype == dt
            out.append([m["index"] for m in svc.query([img], topk=5)[0]])
        assert out[0] == out[1]

    def test_int8_index_matches_float32(self):
        """A quarter-width int8 index (codes + per-row scales) returns the
        same ranking — both pre-quantized and quantize-at-load."""
        from openibl_tpu.ops.distance import quantize_index_int8

        rng = np.random.RandomState(10)
        gallery = rng.randn(24, 4096).astype(np.float32)
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)
        codes, scales = quantize_index_int8(gallery)

        base = RetrievalService({"descriptors": gallery},
                                height=32, width=48, batch_buckets=(1,))
        pre = RetrievalService({"descriptors": codes, "scales": scales},
                               height=32, width=48, batch_buckets=(1,))
        atload = RetrievalService({"descriptors": gallery}, height=32,
                                  width=48, batch_buckets=(1,),
                                  quantize_int8=True)
        assert pre._gallery.dtype == np.int8
        assert atload._gallery.dtype == np.int8
        ids = [[m["index"] for m in s.query([img], topk=5)[0]]
               for s in (base, pre, atload)]
        assert ids[0] == ids[1] == ids[2]

    def test_int8_index_requires_scales(self):
        with pytest.raises(ValueError, match="scales"):
            RetrievalService(
                {"descriptors": np.zeros((4, 8), np.int8)},
                height=32, width=48, batch_buckets=(1,),
            )

    def test_degenerate_inputs(self, service):
        assert service.query([]) == []
        with pytest.raises(ValueError, match="topk"):
            service.query([np.zeros((32, 48, 3), np.uint8)], topk=0)

    def test_ivf_index_full_probe_matches_exact(self):
        """IVF serving with nprobe=nlist is exhaustive: the ranking must
        equal the exact service; unfilled slots must never leak -1 rows."""
        from openibl_tpu.ops.ivf import build_ivf

        rng = np.random.RandomState(13)
        gallery = rng.randn(32, 4096).astype(np.float32)
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        ivf = build_ivf(gallery, nlist=4, iters=5, seed=0)
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)

        exact = RetrievalService({"descriptors": gallery},
                                 height=32, width=48, batch_buckets=(1,))
        approx = RetrievalService(
            {"descriptors": gallery, "ivf_centroids": ivf["centroids"],
             "ivf_lists": ivf["lists"]},
            height=32, width=48, batch_buckets=(1,), ivf_nprobe=4,
        )
        a = [m["index"] for m in exact.query([img], topk=5)[0]]
        b = [m["index"] for m in approx.query([img], topk=5)[0]]
        assert a == b
        # nprobe=1 can surface fewer than topk candidates: ranks stay
        # contiguous and no -1/inf entries appear
        narrow = RetrievalService(
            {"descriptors": gallery, "ivf_centroids": ivf["centroids"],
             "ivf_lists": ivf["lists"]},
            height=32, width=48, batch_buckets=(1,), ivf_nprobe=1,
        )
        out = narrow.query([img], topk=32)[0]
        assert 0 < len(out) <= 32
        assert [m["rank"] for m in out] == list(range(1, len(out) + 1))
        assert all(m["index"] >= 0 and np.isfinite(m["sq_dist"])
                   for m in out)

    def test_ivf_nprobe_without_tables_raises(self):
        with pytest.raises(ValueError, match="ivf"):
            RetrievalService(
                {"descriptors": np.zeros((4, 8), np.float32)},
                height=32, width=48, batch_buckets=(1,), ivf_nprobe=2,
            )

    def test_ivf_batch_routing_predicate(self):
        """Per-query IVF probing reads batch*nprobe*maxlen rows; the exact
        scan reads the index once for the whole batch. The router must flip
        to exact exactly when probing stops being cheaper (measured 4x
        regression at bs16 on chip before this fix —
        logs/tpu_collect_r04/serving_latency.json)."""
        from openibl_tpu.serving import _ivf_beats_exact

        # round-4 chip scenario: 100k gallery, nlist=256 -> maxlen 782
        assert _ivf_beats_exact(1, 32, 782, 100_000)
        assert not _ivf_beats_exact(4, 32, 782, 100_000)
        assert not _ivf_beats_exact(16, 32, 782, 100_000)
        # small nprobe keeps IVF winning at larger batches
        assert _ivf_beats_exact(16, 4, 782, 100_000 * 10)

    def test_ivf_exact_routed_bucket_matches_exact_service(self):
        """A batch routed to the exact scan must return bit-identical
        results to a no-IVF service (same weights)."""
        import jax

        from openibl_tpu.ops.ivf import build_ivf
        from openibl_tpu.serving import _ivf_beats_exact

        rng = np.random.RandomState(14)
        gallery = rng.randn(48, 4096).astype(np.float32)
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        ivf = build_ivf(gallery, nlist=4, iters=5, seed=0)
        maxlen = np.asarray(ivf["lists"]).shape[1]
        imgs = [rng.randint(0, 256, (32, 48, 3), np.uint8)
                for _ in range(4)]

        approx = RetrievalService(
            {"descriptors": gallery, "ivf_centroids": ivf["centroids"],
             "ivf_lists": ivf["lists"]},
            height=32, width=48, batch_buckets=(1, 4), ivf_nprobe=2,
        )
        exact = RetrievalService({"descriptors": gallery},
                                 height=32, width=48, batch_buckets=(1, 4))
        # share weights (both random inits otherwise)
        exact._params = jax.tree.map(lambda _, b: b, exact._params,
                                     approx._params)
        # the 4-image bucket must be past the routing threshold here
        assert not _ivf_beats_exact(4, 2, maxlen, 48)
        a = approx.query(imgs, topk=5)
        b = exact.query(imgs, topk=5)
        assert [[m["index"] for m in row] for row in a] == \
               [[m["index"] for m in row] for row in b]

    def test_quant_backbone_service(self):
        """quant_backbone=True serves end-to-end: the backbone runs mixed
        bf16/int8 (ops/quant.py), queries return full result rows, and the
        service stays deterministic. Descriptor-level fidelity vs f32 is
        pinned separately in tests/test_quant.py (retrieval agreement on
        model-generated galleries — the meaningful case; this gallery is
        random so cross-service rank equality is not asserted)."""
        rng = np.random.RandomState(21)
        gallery = rng.randn(16, 4096).astype(np.float32)
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        svc = RetrievalService(
            {"descriptors": gallery}, height=32, width=48,
            batch_buckets=(1,), quant_backbone=True,
        )
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)
        res = svc.query([img], topk=5)
        assert len(res[0]) == 5
        assert all(0 <= m["index"] < 16 for m in res[0])
        again = svc.query([img], topk=5)
        assert [m["index"] for m in res[0]] == [m["index"] for m in again[0]]
        # the quantized tree really is int8 where it should be
        assert str(svc._params["base"]["conv4_2"]["wq"].dtype) == "int8"


class TestMeshServing:
    def test_pq_only_index_finds_self(self):
        """Pure-PQ index (no full-width descriptors): querying with the
        exact gallery images must return each image as its own top-1 —
        the ADC self-distance is the reconstruction error, tiny next to
        the ~2.0 sq-dist between unit-norm descriptors of distinct random
        images."""
        import jax

        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.ops.pq import build_pq

        model, params = vgg16_netvlad(None)  # same init as the service's
        rng = np.random.RandomState(11)
        imgs = rng.randint(0, 256, (8, 32, 48, 3), np.uint8)
        desc = np.asarray(jax.jit(model.apply)(params, imgs))  # (8, 4096)
        payload = build_pq(desc, m=64, ksub=8, iters=10)
        svc = RetrievalService(
            {**payload,
             "paths": np.array([f"img_{i}.jpg" for i in range(8)])},
            height=32, width=48, batch_buckets=(1,),
        )
        assert svc.use_pq  # implied: no "descriptors" in the index
        assert svc._gallery.dtype == np.uint8
        assert svc.index_size == 8
        for i in (0, 3, 7):
            out = svc.query([imgs[i]], topk=3)[0]
            assert out[0]["index"] == i
            assert out[0]["path"] == f"img_{i}.jpg"
            assert out[0]["sq_dist"] < out[1]["sq_dist"]

    def test_opq_rotation_applied_from_index(self):
        """An index built with opq_iters carries "pq_rotation"; the service
        must detect it, rotate queries, and still retrieve each gallery
        image as its own top-1 (codes encode ROTATED descriptors — an
        unrotated query would score garbage)."""
        import jax

        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.ops.pq import build_pq

        model, params = vgg16_netvlad(None)
        rng = np.random.RandomState(14)
        imgs = rng.randint(0, 256, (8, 32, 48, 3), np.uint8)
        desc = np.asarray(jax.jit(model.apply)(params, imgs))
        payload = build_pq(desc, m=64, ksub=8, iters=8, opq_iters=3)
        assert "pq_rotation" in payload
        svc = RetrievalService(
            {**payload,
             "paths": np.array([f"img_{i}.jpg" for i in range(8)])},
            height=32, width=48, batch_buckets=(1,),
        )
        assert svc.use_pq and svc._pq_rotation is not None
        for i in (0, 5):
            out = svc.query([imgs[i]], topk=3)[0]
            assert out[0]["index"] == i
            assert out[0]["sq_dist"] < out[1]["sq_dist"]

    def test_pq_alongside_descriptors_is_opt_in(self):
        from openibl_tpu.ops.pq import build_pq

        rng = np.random.RandomState(12)
        gallery = rng.randn(16, 4096).astype(np.float32)
        index = {"descriptors": gallery, **build_pq(gallery, m=8, ksub=8,
                                                    iters=3)}
        exact = RetrievalService(dict(index), height=32, width=48,
                                 batch_buckets=(1,))
        assert not exact.use_pq and exact._gallery.dtype == np.float32
        pq = RetrievalService(dict(index), height=32, width=48,
                              batch_buckets=(1,), use_pq=True)
        assert pq.use_pq and pq._gallery.dtype == np.uint8

    def test_pq_option_errors(self):
        from openibl_tpu.ops.pq import build_pq

        rng = np.random.RandomState(13)
        gallery = rng.randn(8, 4096).astype(np.float32)
        pq_index = build_pq(gallery, m=8, ksub=8, iters=2)
        with pytest.raises(ValueError, match="pq_codes"):
            RetrievalService({"descriptors": gallery}, height=32, width=48,
                             batch_buckets=(1,), use_pq=True)
        with pytest.raises(ValueError, match="quantize_int8"):
            RetrievalService(dict(pq_index), height=32, width=48,
                             batch_buckets=(1,), quantize_int8=True)
        with pytest.raises(ValueError, match="IVF"):
            RetrievalService(dict(pq_index), height=32, width=48,
                             batch_buckets=(1,), ivf_nprobe=4)

    def test_ivfpq_index_finds_self(self):
        """IVFADC serving (use_pq + ivf_nprobe over residual codes): each
        gallery image is its own top-1 when queried back."""
        import jax

        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.ops.pq import build_ivfpq

        model, params = vgg16_netvlad(None)
        rng = np.random.RandomState(15)
        imgs = rng.randint(0, 256, (12, 32, 48, 3), np.uint8)
        desc = np.asarray(jax.jit(model.apply)(params, imgs))
        payload = build_ivfpq(desc, nlist=4, m=64, ksub=8, iters=10)
        svc = RetrievalService(dict(payload), height=32, width=48,
                               batch_buckets=(1,), ivf_nprobe=4)
        assert svc.use_pq and svc.ivf_nprobe == 4
        assert svc._gallery.dtype == np.uint8
        for i in (0, 5, 11):
            out = svc.query([imgs[i]], topk=3)[0]
            assert out[0]["index"] == i

    def test_ivfadc_only_index_requires_nprobe(self):
        """Residual codes can't be scored without probing; the error must
        say to pass ivf_nprobe."""
        from openibl_tpu.ops.pq import build_ivfpq

        rng = np.random.RandomState(16)
        gallery = rng.randn(32, 4096).astype(np.float32)
        payload = build_ivfpq(gallery, nlist=4, m=8, ksub=8, iters=2)
        with pytest.raises(ValueError, match="ivf_nprobe"):
            RetrievalService(dict(payload), height=32, width=48,
                             batch_buckets=(1,))
        svc = RetrievalService(dict(payload), height=32, width=48,
                               batch_buckets=(1,), ivf_nprobe=2)
        out = svc.query([np.zeros((32, 48, 3), np.uint8)], topk=3)[0]
        assert len(out) == 3

    def test_pq_rerank_matches_exact_service(self):
        """pq_rerank with a covering shortlist returns the exact service's
        ranking (ADC shortlist + full-width re-rank)."""
        from openibl_tpu.ops.pq import build_pq

        rng = np.random.RandomState(17)
        gallery = rng.randn(48, 4096).astype(np.float32)
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        index = {"descriptors": gallery,
                 **build_pq(gallery, m=64, ksub=16, iters=5)}
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)
        exact = RetrievalService({"descriptors": gallery}, height=32,
                                 width=48, batch_buckets=(1,))
        rr = RetrievalService(dict(index), height=32, width=48,
                              batch_buckets=(1,), pq_rerank=48)
        assert not rr.use_pq and rr.pq_rerank == 48
        a = exact.query([img], topk=5)[0]
        b = rr.query([img], topk=5)[0]
        assert [m["index"] for m in a] == [m["index"] for m in b]
        np.testing.assert_allclose([m["sq_dist"] for m in a],
                                   [m["sq_dist"] for m in b],
                                   rtol=1e-4, atol=1e-5)

    def test_pq_rerank_option_errors(self):
        from openibl_tpu.ops.pq import build_pq

        rng = np.random.RandomState(18)
        gallery = rng.randn(8, 4096).astype(np.float32)
        pq = build_pq(gallery, m=8, ksub=8, iters=2)
        with pytest.raises(ValueError, match="full-width"):
            RetrievalService(dict(pq), height=32, width=48,
                             batch_buckets=(1,), pq_rerank=4)
        with pytest.raises(ValueError, match="pq_codes"):
            RetrievalService({"descriptors": gallery}, height=32, width=48,
                             batch_buckets=(1,), pq_rerank=4)
        with pytest.raises(ValueError, match="ivf_nprobe"):
            RetrievalService({"descriptors": gallery, **pq}, height=32,
                             width=48, batch_buckets=(1,), pq_rerank=4,
                             ivf_nprobe=2)

    def test_pq_mesh_serves_sharded(self):
        """Plain PQ + mesh: codes shard over the data axis
        (ops.pq.pq_search_sharded) and the results match the single-device
        PQ service — including a non-divisible gallery size (29 % 8), where
        the op (not the caller) must handle padding because zero codes
        decode to REAL codebook entries."""
        from openibl_tpu.ops.pq import build_pq
        from openibl_tpu.parallel.mesh import get_mesh

        rng = np.random.RandomState(14)
        gallery = rng.randn(29, 4096).astype(np.float32)
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        index = build_pq(gallery, m=8, ksub=8, iters=4)
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)
        results = []
        for mesh in (None, get_mesh(8)):
            svc = RetrievalService(dict(index), height=32, width=48,
                                   batch_buckets=(1,), mesh=mesh)
            assert svc.use_pq and (svc.mesh is mesh)
            results.append(svc.query([img], topk=5)[0])
        ids = [[m["index"] for m in r] for r in results]
        assert ids[0] == ids[1]
        np.testing.assert_allclose([m["sq_dist"] for m in results[0]],
                                   [m["sq_dist"] for m in results[1]],
                                   rtol=1e-4, atol=1e-5)

    def test_ivfadc_and_rerank_mesh_downgrade_with_warning(self):
        """IVFADC and pq_rerank have no sharded variant — a mesh must
        downgrade loudly, not silently mis-shard."""
        from openibl_tpu.ops.pq import build_ivfpq, build_pq
        from openibl_tpu.parallel.mesh import get_mesh

        rng = np.random.RandomState(19)
        gallery = rng.randn(16, 4096).astype(np.float32)
        ivfadc = build_ivfpq(gallery, nlist=4, m=8, ksub=8, iters=2)
        with pytest.warns(UserWarning, match="single-device"):
            svc = RetrievalService(dict(ivfadc), height=32, width=48,
                                   batch_buckets=(1,), mesh=get_mesh(8),
                                   ivf_nprobe=2)
        assert svc.mesh is None
        out = svc.query([np.zeros((32, 48, 3), np.uint8)], topk=3)[0]
        assert len(out) == 3
        rr = {"descriptors": gallery, **build_pq(gallery, m=8, ksub=8,
                                                 iters=2)}
        with pytest.warns(UserWarning, match="single-device"):
            svc = RetrievalService(dict(rr), height=32, width=48,
                                   batch_buckets=(1,), mesh=get_mesh(8),
                                   pq_rerank=8)
        assert svc.mesh is None

    def test_sharded_index_matches_single_device(self):
        """Same top-k from the mesh-sharded index (incl. a non-divisible
        gallery size that forces zero-padding) as from one device."""
        import jax

        from openibl_tpu.parallel.mesh import get_mesh

        rng = np.random.RandomState(7)
        gallery = rng.randn(30, 4096).astype(np.float32)  # 30 % 8 != 0
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)
        results = []
        for mesh in (None, get_mesh(8)):
            svc = RetrievalService(
                {"descriptors": gallery}, height=32, width=48,
                batch_buckets=(1,), mesh=mesh,
            )
            results.append(svc.query([img], topk=5)[0])
        ids = [[m["index"] for m in r] for r in results]
        assert ids[0] == ids[1]
        d0 = np.array([m["sq_dist"] for m in results[0]])
        d1 = np.array([m["sq_dist"] for m in results[1]])
        np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-4)

    def test_sharded_int8_index_matches_single_device(self):
        """int8 sharding: scales shard with their gallery rows and padded
        rows stay masked (non-divisible size exercises zero-padding)."""
        from openibl_tpu.parallel.mesh import get_mesh

        rng = np.random.RandomState(8)
        gallery = rng.randn(30, 4096).astype(np.float32)  # 30 % 8 != 0
        gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
        img = rng.randint(0, 256, (32, 48, 3), np.uint8)
        results = []
        for mesh in (None, get_mesh(8)):
            svc = RetrievalService(
                {"descriptors": gallery}, height=32, width=48,
                batch_buckets=(1,), mesh=mesh, quantize_int8=True,
            )
            assert svc._gallery.dtype == np.int8
            results.append(svc.query([img], topk=5)[0])
        ids = [[m["index"] for m in r] for r in results]
        assert ids[0] == ids[1]


class TestHTTPServer:
    def test_round_trip(self, service):
        sys.path.insert(0, EXAMPLES)
        from serve import make_handler
        from http.server import ThreadingHTTPServer

        server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                health = json.loads(r.read())
            assert health == {"ok": True, "index_size": 32}

            img = Image.fromarray(np.random.RandomState(5).randint(
                0, 256, (32, 48, 3), np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query?topk=3", data=buf.getvalue(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                out = json.loads(r.read())
            assert len(out["matches"]) == 3
            assert out["matches"][0]["rank"] == 1

            # bad request: not an image
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query", data=b"not an image",
                method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=30)
            assert exc.value.code == 400
        finally:
            server.shutdown()
            server.server_close()
