"""PCA-whitening and distance/kNN/mining op tests."""

import pytest
import numpy as np
import jax.numpy as jnp

from openibl_tpu.ops import pca as pca_ops
from openibl_tpu.ops import distance


class TestPCA:
    def test_whitening_decorrelates(self, rng):
        # correlated data: after whitening, projected (pre-norm) covariance ~ I
        n, d, k = 500, 8, 4
        base = rng.randn(n, 2)
        x = (base @ rng.randn(2, d) + 0.05 * rng.randn(n, d)).astype(np.float32)
        params = pca_ops.pca_train(x, n_components=k)
        proj, bias = pca_ops.pca_projection(params, whiten=True)
        z = np.asarray(x @ np.asarray(proj)) + np.asarray(bias)
        cov = np.cov(z.T)
        np.testing.assert_allclose(cov, np.eye(k), atol=0.15)

    def test_primal_equals_dual(self, rng):
        """Both pca_train branches must agree with a numpy eigh oracle of
        the covariance, up to per-component sign: the dual (gram) path on
        D > N data and the primal path on N > D data each reproduce the
        oracle's eigenvalues AND eigenvectors (a wrong-but-well-shaped dual
        reconstruction would slip past shape/ordering checks)."""

        def numpy_primal(x, k):
            mu = x.mean(0)
            cov = (x - mu).T @ (x - mu) / (len(x) - 1)
            lams, u = np.linalg.eigh(cov)
            order = np.argsort(-lams)[:k]
            return u[:, order], lams[order]

        def assert_matches(params, x, k):
            u_ref, lams_ref = numpy_primal(x, k)
            u, lams = np.asarray(params["U"]), np.asarray(params["lams"])
            assert u.shape == (x.shape[1], k)
            np.testing.assert_allclose(lams, lams_ref, rtol=1e-3, atol=1e-5)
            for j in range(k):
                diff = min(np.linalg.norm(u[:, j] - u_ref[:, j]),
                           np.linalg.norm(u[:, j] + u_ref[:, j]))
                assert diff < 1e-2, f"component {j} diverges by {diff}"

        k = 5
        x_dual = rng.randn(20, 50).astype(np.float32)  # D > N: dual path
        assert_matches(pca_ops.pca_train(x_dual, k), x_dual, k)
        x_primal = rng.randn(80, 30).astype(np.float32)  # N > D: primal
        assert_matches(pca_ops.pca_train(x_primal, k), x_primal, k)

    def test_apply_is_normalized(self, rng):
        x = rng.randn(100, 16).astype(np.float32)
        params = pca_ops.pca_train(x, n_components=8)
        proj, bias = pca_ops.pca_projection(params)
        out = np.asarray(pca_ops.pca_apply(jnp.asarray(x), proj, bias))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)

    def test_save_load_roundtrip(self, rng, tmp_path):
        x = rng.randn(50, 12).astype(np.float32)
        params = pca_ops.pca_train(x, n_components=6)
        # "pca" (bare): np.savez used to append '.npz' on save while load
        # opened the bare name — the round trip must work for ANY path
        for name in ("pca.npz", "pca.h5", "pca"):
            path = str(tmp_path / name)
            pca_ops.save_pca(params, path)
            import os
            assert os.path.isfile(path), f"save wrote a different name than {path}"
            loaded = pca_ops.load_pca(path)
            for key in ("U", "lams", "mu"):
                np.testing.assert_allclose(params[key], loaded[key], rtol=1e-6)

    def test_wrapper_matches_reference_flow(self, rng, tmp_path):
        x = rng.randn(64, 32).astype(np.float32)
        p = pca_ops.PCA(n_components=8, whiten=True, params_path=str(tmp_path / "p.h5"))
        p.train(x)
        out1 = np.asarray(p.infer(jnp.asarray(x[:5])))
        p2 = pca_ops.PCA(n_components=8, whiten=True, params_path=str(tmp_path / "p.h5"))
        out2 = np.asarray(p2.infer(jnp.asarray(x[:5])))
        np.testing.assert_allclose(out1, out2, rtol=1e-5)


class TestDistance:
    def test_pairwise_sqdist(self, rng):
        x = rng.randn(7, 5).astype(np.float32)
        y = rng.randn(9, 5).astype(np.float32)
        d = np.asarray(distance.pairwise_sqdist(x, y))
        ref = ((x[:, None] - y[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("full_path", [True, False])
    def test_topk_nearest_matches_argsort(self, rng, full_path):
        q = rng.randn(13, 8).astype(np.float32)
        g = rng.randn(103, 8).astype(np.float32)
        d, idx = distance.topk_nearest(q, g, k=10, chunk=16,
                                       full_path=full_path)
        ref = ((q[:, None] - g[None]) ** 2).sum(-1)
        ref_idx = np.argsort(ref, axis=1)[:, :10]
        # compare distances (indices may differ on ties)
        np.testing.assert_allclose(
            np.asarray(d), np.take_along_axis(ref, ref_idx, 1), rtol=1e-3, atol=1e-3
        )
        assert np.mean(np.asarray(idx) == ref_idx) > 0.99

    def test_topk_k_larger_than_chunk(self, rng):
        # scan path: every tile contributes all its rows when chunk <= k
        q = rng.randn(4, 3).astype(np.float32)
        g = rng.randn(40, 3).astype(np.float32)
        d, idx = distance.topk_nearest(q, g, k=12, chunk=8, full_path=False)
        ref = np.sort(((q[:, None] - g[None]) ** 2).sum(-1), axis=1)[:, :12]
        np.testing.assert_allclose(np.asarray(d), ref, rtol=1e-3, atol=1e-3)

    def test_mine_hard_tuples(self, rng):
        s, g_n, d_dim = 6, 50, 4
        qf = rng.randn(s, d_dim).astype(np.float32)
        gf = rng.randn(g_n, d_dim).astype(np.float32)
        d2 = ((qf[:, None] - gf[None]) ** 2).sum(-1)
        # positives: 3 random ids per anchor (padded to 5)
        pos = np.full((s, 5), -1, np.int32)
        for i in range(s):
            pos[i, :3] = np.random.RandomState(i).choice(g_n, 3, replace=False)
        # candidates: 20 random ids per anchor (padded to 25)
        cand = np.full((s, 25), -1, np.int32)
        for i in range(s):
            cand[i, :20] = np.random.RandomState(100 + i).choice(g_n, 20, replace=False)
        pc, nc = distance.mine_hard_tuples(
            jnp.asarray(qf), jnp.asarray(gf), jnp.asarray(pos), jnp.asarray(cand), neg_num=4
        )
        pc, nc = np.asarray(pc), np.asarray(nc)
        for i in range(s):
            valid_pos = pos[i, :3]
            assert pc[i] == valid_pos[np.argmin(d2[i, valid_pos])]
            valid_c = cand[i, :20]
            expect = valid_c[np.argsort(d2[i, valid_c])[:4]]
            assert set(nc[i].tolist()) == set(expect.tolist())

    def test_rank_positives(self, rng):
        s, g_n, d_dim = 3, 30, 4
        qf = rng.randn(s, d_dim).astype(np.float32)
        gf = rng.randn(g_n, d_dim).astype(np.float32)
        d2 = ((qf[:, None] - gf[None]) ** 2).sum(-1)
        pos = np.full((s, 8), -1, np.int32)
        pos[:, :6] = np.stack(
            [np.random.RandomState(i).choice(g_n, 6, replace=False) for i in range(s)]
        )
        ranked, ranked_d = distance.rank_positives(
            jnp.asarray(qf), jnp.asarray(gf), jnp.asarray(pos), pos_pool=4
        )
        ranked = np.asarray(ranked)
        for i in range(s):
            expect = pos[i, :6][np.argsort(d2[i, pos[i, :6]])][:4]
            np.testing.assert_array_equal(ranked[i], expect)

    def test_mine_hard_tuples_ranked_matches_separate_ops(self, rng):
        """The fused SFRS-refresh op (one shared distmat) must return exactly
        what the two separate ops return."""
        s, g_n, d_dim = 4, 40, 8
        qf = rng.randn(s, d_dim).astype(np.float32)
        gf = rng.randn(g_n, d_dim).astype(np.float32)
        pos = np.full((s, 6), -1, np.int32)
        pos[:, :4] = np.stack(
            [np.random.RandomState(i).choice(g_n, 4, replace=False)
             for i in range(s)]
        )
        cand = np.full((s, 25), -1, np.int32)
        for i in range(s):
            cand[i, :15] = np.random.RandomState(50 + i).choice(
                g_n, 15, replace=False)
        args = (jnp.asarray(qf), jnp.asarray(gf), jnp.asarray(pos))
        pc, nc, ranked, ranked_d = distance.mine_hard_tuples_ranked(
            *args, jnp.asarray(cand), neg_num=3, pos_pool=4
        )
        pc2, nc2 = distance.mine_hard_tuples(
            *args[:2], args[2], jnp.asarray(cand), neg_num=3
        )
        ranked2, ranked_d2 = distance.rank_positives(*args, pos_pool=4)
        np.testing.assert_array_equal(np.asarray(pc), np.asarray(pc2))
        np.testing.assert_array_equal(np.asarray(nc), np.asarray(nc2))
        np.testing.assert_array_equal(np.asarray(ranked), np.asarray(ranked2))
        np.testing.assert_array_equal(np.asarray(ranked_d),
                                      np.asarray(ranked_d2))


class TestReducedPrecisionGallery:
    def test_fp16_gallery_both_paths(self):
        """float16 gallery storage: both topk paths return f32 distances and
        the f32 ranking (unit-norm rows, no near-ties)."""
        import jax.numpy as jnp
        from openibl_tpu.ops.distance import topk_nearest

        rng = np.random.RandomState(11)
        g = rng.randn(300, 64).astype(np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        q = rng.randn(4, 64).astype(np.float32)
        for full in (True, False):
            d32, i32 = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=7,
                                    chunk=128, full_path=full)
            d16, i16 = topk_nearest(jnp.asarray(q),
                                    jnp.asarray(g.astype(np.float16)),
                                    k=7, chunk=128, full_path=full)
            assert d16.dtype == jnp.float32
            np.testing.assert_array_equal(np.asarray(i32), np.asarray(i16))
            np.testing.assert_allclose(np.asarray(d32), np.asarray(d16),
                                       atol=2e-3)

    def test_int8_gallery_both_paths(self):
        """int8 gallery (quantize_index_int8 codes + per-row scales): both
        topk paths dequantize per tile and return the f32 ranking
        (unit-norm rows, no near-ties)."""
        import jax.numpy as jnp
        from openibl_tpu.ops.distance import quantize_index_int8, topk_nearest

        rng = np.random.RandomState(12)
        g = rng.randn(300, 64).astype(np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        q = rng.randn(4, 64).astype(np.float32)
        codes, scales = quantize_index_int8(g)
        assert codes.dtype == np.int8 and scales.shape == (300,)
        # quantization is a faithful approximation...
        np.testing.assert_allclose(codes * scales[:, None], g, atol=1e-2)
        for full in (True, False):
            d32, i32 = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=7,
                                    chunk=128, full_path=full)
            d8, i8 = topk_nearest(jnp.asarray(q), jnp.asarray(codes), k=7,
                                  chunk=128, full_path=full,
                                  gallery_scale=scales)
            assert d8.dtype == jnp.float32
            np.testing.assert_array_equal(np.asarray(i32), np.asarray(i8))
            # ~1e-3 relative distance error from the 8-bit rounding — the
            # ranking above is the real contract
            np.testing.assert_allclose(np.asarray(d32), np.asarray(d8),
                                       rtol=2e-3, atol=2e-2)

    def test_int8_zero_row_safe(self):
        """All-zero index rows must not produce NaN/inf scales."""
        from openibl_tpu.ops.distance import quantize_index_int8

        g = np.zeros((4, 16), np.float32)
        g[0, 0] = 1.0
        codes, scales = quantize_index_int8(g)
        assert np.isfinite(scales).all() and (scales > 0).all()
        np.testing.assert_array_equal(codes[1:], 0)

    def test_auto_full_path_counts_gallery_widening(self):
        """The full-path auto-select must include the f32 widening cost of a
        reduced-precision gallery under its OWN (HBM-scale) budget: an index
        whose f32 widening exceeds HBM must stream (per-tile dequant, the
        OOM guard), but one whose widening trivially fits must take the
        full path — round 4 measured that streaming a 100k x 4096 f16/int8
        index made bs16 serving 2-2.5x SLOWER than f32
        (logs/tpu_collect_r04/serving_latency.json; VERDICT r4 weak #1)."""
        from openibl_tpu.ops.distance import (
            _FULL_DISTMAT_BUDGET_BYTES, _auto_full_path,
        )

        n, d = 1_000_000, 4096  # ~4GB int8 index; f32 widening ~16GB
        assert 4 * 1 * n < _FULL_DISTMAT_BUDGET_BYTES  # distmat alone is tiny
        assert _auto_full_path(1, n, d, gallery_widened=False)
        assert not _auto_full_path(1, n, d, gallery_widened=True)
        # small quantized galleries still take the (faster) full path
        assert _auto_full_path(1, 10_000, 64, gallery_widened=True)
        # the serving regression shape: 100k x 4096 quantized index widens
        # to 1.6GB — well inside HBM — and MUST take the full path
        assert _auto_full_path(16, 100_000, 4096, gallery_widened=True)
        # ...while a big-Q batch still streams on distmat size alone
        assert not _auto_full_path(40_000, 100_000, 4096,
                                   gallery_widened=False)

    def test_widen_budget_override(self, monkeypatch):
        """The widening budget is configurable (module attr / env var) so
        smaller-HBM parts can force streaming earlier."""
        from openibl_tpu.ops import distance

        monkeypatch.setattr(distance, "_WIDEN_BUDGET_BYTES", 1024)
        assert not distance._auto_full_path(1, 10_000, 64,
                                            gallery_widened=True)
        monkeypatch.setattr(distance, "_WIDEN_BUDGET_BYTES", None)
        monkeypatch.setenv("OPENIBL_WIDEN_BUDGET_BYTES", "2048")
        assert distance._widen_budget_bytes() == 2048

    def test_auto_chunk_targets_tile_bytes(self):
        """chunk=None sizes the streaming tile to ~256MB f32 (few large
        scan steps, not many merge-dominated small ones) and clamps to the
        gallery size."""
        from openibl_tpu.ops.distance import _STREAM_TILE_BYTES, _auto_chunk

        c = _auto_chunk(1_000_000, 4096, q_rows=1)
        assert c == _STREAM_TILE_BYTES // (4 * (4096 + 3))  # ~16k rows
        assert _auto_chunk(300, 4096) == 300  # never pads past the gallery
        assert _auto_chunk(1_000_000, 1_000_000) == 4096  # floor

    def test_auto_chunk_bounds_per_step_distmat(self):
        """The per-step (Q, chunk) distmat counts toward the tile budget:
        the rerank's gallery-vs-gallery call (Q = n = 83k, D = 8) must NOT
        get one whole-gallery tile (its scan step would materialize an
        83k x 83k f32 distmat — 59 GB peak RSS, the r5 regression the
        memory-envelope test caught); small-Q serving keeps large tiles."""
        from openibl_tpu.ops.distance import _STREAM_TILE_BYTES, _auto_chunk

        n = 83_024
        c = _auto_chunk(n, 8, q_rows=n)
        assert c == 4096  # floor, NOT the whole gallery
        # per-step transient stays in the single-GB range the envelope
        # test's 8 GB ceiling assumes (3 distmat copies + the tile)
        assert 4 * c * (8 + 3 * n) < 8 * 1024**3
        # serving shape: the distmat term is noise, tiles stay ~256MB
        assert _auto_chunk(1_000_000, 4096, q_rows=16) > 15_000


class TestGallerySqnorm:
    """Precomputed gallery squared norms (serving passes them so each
    request skips a full norm pass over a fixed index) must not change any
    result — both paths, plain/int8/rowmax."""

    def test_matches_computed_norms_all_paths(self):
        import jax.numpy as jnp
        from openibl_tpu.ops.distance import quantize_index_int8, topk_nearest

        rng = np.random.RandomState(21)
        g = rng.randn(300, 64).astype(np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        q = rng.randn(4, 64).astype(np.float32)
        n2 = np.einsum("nd,nd->n", g, g)
        codes, scales = quantize_index_int8(g)
        gd = codes.astype(np.float32) * scales[:, None]
        n2q = np.einsum("nd,nd->n", gd, gd)
        for full in (True, False):
            d0, i0 = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=7,
                                  chunk=128, full_path=full)
            d1, i1 = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=7,
                                  chunk=128, full_path=full,
                                  gallery_sqnorm=jnp.asarray(n2))
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                                       atol=1e-5)
            d2, i2 = topk_nearest(jnp.asarray(q), jnp.asarray(codes), k=7,
                                  chunk=128, full_path=full,
                                  gallery_scale=scales,
                                  gallery_sqnorm=jnp.asarray(n2q))
            d3, i3 = topk_nearest(jnp.asarray(q), jnp.asarray(codes), k=7,
                                  chunk=128, full_path=full,
                                  gallery_scale=scales)
            np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))
            np.testing.assert_allclose(np.asarray(d2), np.asarray(d3),
                                       atol=1e-5)

    def test_rowmax_with_norms(self):
        """return_rowmax (the streaming rerank dependency) must see the same
        whole-gallery max when norms are precomputed."""
        import jax.numpy as jnp
        from openibl_tpu.ops.distance import topk_nearest

        rng = np.random.RandomState(22)
        g = rng.randn(130, 32).astype(np.float32)
        q = rng.randn(3, 32).astype(np.float32)
        n2 = np.einsum("nd,nd->n", g, g)
        d0, i0, m0 = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=5,
                                  chunk=64, full_path=False,
                                  return_rowmax=True)
        d1, i1, m1 = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=5,
                                  chunk=64, full_path=False,
                                  return_rowmax=True,
                                  gallery_sqnorm=jnp.asarray(n2))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-5)
