"""k-reciprocal re-ranking tests: C++ vs numpy consistency + semantics."""

import numpy as np
import pytest

from openibl_tpu.ops import rerank, _native


def _planted(rng, n_clusters=4, per=8, d=16):
    centers = rng.randn(n_clusters, d) * 5
    feats = np.concatenate(
        [c + rng.randn(per, d) * 0.3 for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(n_clusters), per)
    return feats, labels


def _dists(x, y):
    return ((x[:, None] - y[None]) ** 2).sum(-1) ** 0.5


class TestRerank:
    def test_native_matches_numpy(self, rng):
        feats, _ = _planted(rng)
        q, g = feats[:10], feats[10:]
        qg, qq, gg = _dists(q, g), _dists(q, q), _dists(g, g)

        assert _native.available(), "native kernel should build in this image"
        out_native = rerank.re_ranking(qg, qq, gg, k1=6, k2=1, lambda_value=0.1)

        # force the numpy path
        orig = _native._LIB
        _native._LIB = None
        try:
            out_numpy = rerank.re_ranking(qg, qq, gg, k1=6, k2=1, lambda_value=0.1)
        finally:
            _native._LIB = orig
        np.testing.assert_allclose(out_native, out_numpy, rtol=1e-4, atol=1e-5)

    def test_stale_so_missing_symbol_falls_back(self, monkeypatch, rng):
        """A prebuilt librerank.so lacking a newer symbol (e.g. tar-deployed
        checkout with preserved mtimes skipping the staleness rebuild) must
        fall back to the numpy path silently, not crash every rerank call
        with an uncaught AttributeError from available()."""
        import ctypes

        class _StaleLib:  # object() has no exported symbols at all
            def __getattr__(self, name):
                raise AttributeError(name)

        # monkeypatch restores the real loader state on teardown
        monkeypatch.setattr(_native, "_TRIED", False)
        monkeypatch.setattr(_native, "_LIB", None)
        monkeypatch.setattr(ctypes, "CDLL", lambda *a, **k: _StaleLib())
        assert _native.available() is False
        feats, _ = _planted(rng)
        q, g = feats[:6], feats[6:]
        out = rerank.re_ranking(_dists(q, g), _dists(q, q), _dists(g, g),
                                k1=5, k2=1, lambda_value=0.0)
        assert out.shape == (6, len(g))

    def test_jaccard_range_and_shape(self, rng):
        feats, _ = _planted(rng)
        q, g = feats[:6], feats[6:]
        out = rerank.re_ranking(_dists(q, g), _dists(q, q), _dists(g, g),
                                k1=5, k2=1, lambda_value=0.0)
        assert out.shape == (6, len(g))
        assert np.all(out >= -1e-6) and np.all(out <= 1.0 + 1e-6)

    def test_preserves_cluster_structure(self, rng):
        feats, labels = _planted(rng, n_clusters=3, per=10)
        q, ql = feats[::5], labels[::5]
        mask = np.ones(len(feats), bool)
        mask[::5] = False
        g, gl = feats[mask], labels[mask]
        out = rerank.re_ranking(_dists(q, g), _dists(q, q), _dists(g, g),
                                k1=8, k2=1, lambda_value=0.1)
        top1 = out.argmin(axis=1)
        assert (gl[top1] == ql).mean() == 1.0


class TestStreamingRerank:
    """rerank_ranks_streaming: same math as re_ranking, no N x N matrices
    (VERDICT r1 item 5 — 250k-scale rerank)."""

    def _qg(self, rng, nq=25, ng=180, d=16):
        q = rng.randn(nq, d).astype(np.float32)
        g = rng.randn(ng, d).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        return q, g

    @pytest.mark.parametrize("k1,k2,lam", [(25, 1, 0.0), (25, 1, 0.3),
                                           (20, 6, 0.3)])
    def test_matches_full_re_ranking(self, rng, k1, k2, lam):
        q, g = self._qg(rng)
        sq = lambda a, b: ((a[:, None] - b[None]) ** 2).sum(-1)
        full = rerank.re_ranking(sq(q, g), sq(q, q), sq(g, g),
                                 k1=k1, k2=k2, lambda_value=lam)
        idx, dist = rerank.rerank_ranks_streaming(
            q, g, k1=k1, k2=k2, lambda_value=lam, k_out=20
        )
        # selected entries carry the true final distances...
        np.testing.assert_allclose(
            np.take_along_axis(full, idx, axis=1), dist, rtol=1e-4, atol=1e-5
        )
        # ...and they ARE the global top-20 of the full final matrix
        np.testing.assert_allclose(
            np.sort(dist, axis=1), np.sort(full, axis=1)[:, :20],
            rtol=1e-4, atol=1e-5,
        )

    def test_jaccard_engines_agree(self, rng):
        """The device scatter-add engine and the host scipy loop compute the
        same Jaccard distances; auto-routing must not change results."""
        q, g = self._qg(rng)
        union = np.concatenate([q, g])
        rows, cols, vals, _, _ = rerank.build_v_sparse(union, k1=15)
        n = len(union)
        qrows = np.arange(8)
        host = rerank.jaccard_for_queries(rows, cols, vals, n, qrows,
                                          prefer="host")
        dev = rerank.jaccard_for_queries(rows, cols, vals, n, qrows,
                                         prefer="device")
        auto = rerank.jaccard_for_queries(rows, cols, vals, n, qrows)
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(auto, host, rtol=1e-5, atol=1e-6)
        with pytest.raises(ValueError):
            rerank.jaccard_for_queries(rows, cols, vals, n, qrows,
                                       prefer="gpu")

    def test_native_jaccard_matches_scipy_loop(self, rng):
        """The C++ min/sum intersection kernel (threaded flat loops) must
        equal the scipy per-(i,j) loop and the device scatter-add engine —
        three implementations, one math (re_ranking step 5)."""
        if not _native.available():
            pytest.skip("native kernel unavailable")
        q, g = self._qg(rng)
        union = np.concatenate([q, g])
        rows, cols, vals, _, _ = rerank.build_v_sparse(union, k1=15)
        eng = rerank.JaccardEngine(rows, cols, vals, len(union))
        qrows = np.arange(9, dtype=np.int64)
        nat = eng._query_native(qrows)
        dev = eng._query_device(qrows, query_chunk=4)
        np.testing.assert_allclose(nat, dev, rtol=1e-5, atol=1e-6)
        if rerank.sp is not None:
            sci = eng._query_scipy(qrows)
            np.testing.assert_allclose(nat, sci, rtol=1e-5, atol=1e-6)

    def test_native_sets_match_python(self, rng):
        q, g = self._qg(rng)
        union = np.concatenate([q, g])
        d2 = ((union[:, None] - union[None]) ** 2).sum(-1)
        ir = np.argsort(d2, axis=1)[:, :26].astype(np.int32)
        assert _native.available()
        rows_c, cols_c = _native.expansion_sets(ir, 25)
        expansion = rerank._expansion_index(ir, 25)
        rows_p = np.concatenate(
            [np.full(len(e), i, np.int32) for i, e in enumerate(expansion)]
        )
        cols_p = np.concatenate(expansion).astype(np.int32)
        np.testing.assert_array_equal(rows_c, rows_p)
        np.testing.assert_array_equal(cols_c, cols_p)

    @pytest.mark.slow
    def test_83k_gallery_within_memory_envelope(self, rng):
        """Pitts250k-gallery-scale streaming rerank on synthetic descriptors:
        must complete without materializing any (q+g)^2 matrix (33 GB at this
        scale — the process would OOM long before finishing)."""
        import resource

        d = 8
        ng, nq = 83_000, 24
        centers = rng.randn(nq, d).astype(np.float32) * 3
        g = rng.randn(ng, d).astype(np.float32)
        g[:nq] = centers + rng.randn(nq, d).astype(np.float32) * 0.05
        q = centers + rng.randn(nq, d).astype(np.float32) * 0.05
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)

        idx, dist = rerank.rerank_ranks_streaming(q, g, k1=25, k2=1, k_out=10)
        assert idx.shape == (nq, 10)
        # each query's planted neighbor is recovered at rank 1
        assert (idx[:, 0] == np.arange(nq)).mean() > 0.9
        maxrss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        assert maxrss_gb < 8.0, f"peak RSS {maxrss_gb:.1f} GB"


def test_precomputed_initial_rank_matches(rng):
    """re_ranking(initial_rank=device-style top-k of raw distances) must equal
    the self-computed partial ranking path."""
    feats, _ = _planted(rng)
    q, g = feats[:10], feats[10:]
    qg, qq, gg = _dists(q, g), _dists(q, q), _dists(g, g)
    base = rerank.re_ranking(qg, qq, gg, k1=6, k2=1, lambda_value=0.1)
    union = np.concatenate([feats[:10], feats[10:]])
    d2 = ((union[:, None] - union[None]) ** 2).sum(-1)
    ir = np.argsort(d2, axis=1)[:, :7].astype(np.int32)
    out = rerank.re_ranking(qg, qq, gg, k1=6, k2=1, lambda_value=0.1,
                            initial_rank=ir)
    np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-5)


class TestCompositeRankKey:
    """composite_rank_key: feature-distance tie-break that can never reorder
    genuinely distinct f32 final distances (round-2 advisor finding: a fixed
    or per-row-max scale overpowers one-ulp gaps far below the row max)."""

    def test_distinct_finals_dominate_at_mixed_magnitudes(self):
        # one-ulp-separated pairs near 1e-5 alongside the zero-overlap tail
        # at 1.0 — the row-max-based scale (~1.2e-10) would flip the pair
        a = np.float32(1e-5)
        b = np.nextafter(a, np.float32(1.0), dtype=np.float32)
        final = np.array([[b, a, 1.0, 1.0]], np.float32)
        # orig ranks the b-item closest: a naive perturbation would pull it
        # ahead of the genuinely closer a-item
        orig = np.array([[0.1, 5.0, 2.0, 3.0]], np.float32)
        key = rerank.composite_rank_key(final, orig)
        order = np.argsort(key[0])
        assert order[0] == 1 and order[1] == 0  # a before b, always

    def test_exact_ties_ordered_by_feature_distance(self):
        final = np.full((1, 4), 1.0, np.float32)
        orig = np.array([[3.0, 1.0, 2.0, 0.5]], np.float32)
        key = rerank.composite_rank_key(final, orig)
        np.testing.assert_array_equal(np.argsort(key[0]), [3, 1, 2, 0])

    def test_materialized_and_streaming_branches_share_key(self, rng):
        """evaluate_descriptors' small-problem branch must rank with the
        same composite key as rerank_ranks_streaming (identical results on
        either side of the memory threshold)."""
        q = rng.randn(12, 8).astype(np.float32)
        g = rng.randn(60, 8).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        sq = lambda a, b: ((a[:, None] - b[None]) ** 2).sum(-1)
        full = rerank.re_ranking(sq(q, g), sq(q, q), sq(g, g),
                                 k1=10, k2=1, lambda_value=0.0)
        mat_order = np.argsort(rerank.composite_rank_key(full, sq(q, g)),
                               axis=1)[:, :15]
        idx, _ = rerank.rerank_ranks_streaming(q, g, k1=10, k2=1,
                                               lambda_value=0.0, k_out=15)
        np.testing.assert_array_equal(mat_order, idx)


class TestDeviceTableGuard:
    """_device_structs budget: modest padded tables build fine even past the
    occupancy heuristic; only genuinely huge allocations without scipy fail
    loudly (round-2 advisor finding)."""

    def _engine(self, n, hub_count):
        # one hub column with hub_count entries + a diagonal
        rows = np.concatenate([np.arange(hub_count) % n, np.arange(n)])
        cols = np.concatenate([np.zeros(hub_count, np.int64), np.arange(n)])
        vals = np.ones(len(rows), np.float32)
        return rerank.JaccardEngine(rows.astype(np.int32),
                                    cols.astype(np.int32), vals, n)

    def _no_host_fallback(self, monkeypatch):
        monkeypatch.setattr(rerank, "sp", None)
        monkeypatch.setattr(rerank._native, "available", lambda: False)

    def test_modest_tables_build_without_host_fallback(self, monkeypatch):
        self._no_host_fallback(monkeypatch)
        eng = self._engine(n=2000, hub_count=5000)  # p=8192 > cap, ~0.13 GB
        assert eng._device_structs() is not None

    def test_huge_tables_raise_without_host_fallback(self, monkeypatch):
        self._no_host_fallback(monkeypatch)
        eng = self._engine(n=300_000, hub_count=5000)  # ~19.7 GB
        with pytest.raises(MemoryError):
            eng._device_structs()

    def test_oversized_routes_to_host_with_scipy(self):
        if rerank.sp is None:
            pytest.skip("scipy unavailable")
        eng = self._engine(n=2000, hub_count=5000)
        assert eng._device_structs() is None  # "host" marker
