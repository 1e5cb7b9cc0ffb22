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
