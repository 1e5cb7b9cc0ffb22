"""IVF coarse-quantized search: build invariants + recall vs exact top-k."""

import numpy as np
import jax.numpy as jnp
import pytest

from openibl_tpu.ops.distance import quantize_index_int8, topk_nearest
from openibl_tpu.ops.ivf import build_ivf, ivf_search


def _clustered_gallery(rng, n_clusters=16, per=50, d=32):
    centers = rng.randn(n_clusters, d).astype(np.float32) * 8
    g = np.concatenate(
        [c + rng.randn(per, d).astype(np.float32) * 0.4 for c in centers]
    )
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    return g


class TestBuild:
    def test_partition_invariants(self, rng):
        g = _clustered_gallery(rng)
        ivf = build_ivf(g, nlist=16, iters=10, seed=0)
        lists = ivf["lists"]
        assert ivf["centroids"].shape == (16, g.shape[1])
        ids = lists[lists >= 0]
        # every gallery id in exactly one cell, padding only -1
        assert sorted(ids.tolist()) == list(range(len(g)))
        assert set(np.unique(lists)) - set(range(len(g))) <= {-1}

    def test_capacity_respected_and_spill(self, rng):
        # one dominant blob forces overflow past maxlen -> spill must place
        # every row without exceeding any cell's capacity
        g = rng.randn(200, 16).astype(np.float32) * 0.01
        g[:5] += 10  # a tiny far cluster so kmeans has >1 real mode
        ivf = build_ivf(g, nlist=8, maxlen=30, iters=5, seed=0)
        lists = ivf["lists"]
        assert lists.shape == (8, 30)
        ids = lists[lists >= 0]
        assert sorted(ids.tolist()) == list(range(len(g)))

    def test_capacity_too_small_raises(self, rng):
        g = rng.randn(50, 8).astype(np.float32)
        with pytest.raises(ValueError):
            build_ivf(g, nlist=4, maxlen=2)

    def test_default_sizing(self, rng):
        g = rng.randn(300, 8).astype(np.float32)
        ivf = build_ivf(g, iters=3)
        nlist, maxlen = ivf["lists"].shape
        assert nlist * maxlen >= 300


class TestSearch:
    def test_full_probe_matches_exact(self, rng):
        """nprobe = nlist scores every cell once -> identical ranking and
        distances to the exact streaming top-k."""
        g = _clustered_gallery(rng)
        q = g[::37] + rng.randn(len(g[::37]), g.shape[1]).astype(np.float32) * 0.01
        ivf = build_ivf(g, nlist=16, iters=10, seed=0)
        d_ex, i_ex = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=5)
        d_iv, i_iv = ivf_search(jnp.asarray(q), jnp.asarray(g),
                                ivf["centroids"], ivf["lists"],
                                k=5, nprobe=16)
        np.testing.assert_array_equal(np.asarray(i_ex), np.asarray(i_iv))
        np.testing.assert_allclose(np.asarray(d_ex), np.asarray(d_iv),
                                   rtol=1e-5, atol=1e-5)

    def test_low_probe_recall_on_clustered_data(self, rng):
        """Planted near-duplicates live in the query's nearest cell: even
        nprobe=2 must find them (the IVF serving contract on place-
        recognition-shaped data)."""
        g = _clustered_gallery(rng)
        qi = np.arange(0, len(g), 29)
        q = g[qi] + rng.randn(len(qi), g.shape[1]).astype(np.float32) * 0.005
        ivf = build_ivf(g, nlist=16, iters=10, seed=0)
        d, i = ivf_search(jnp.asarray(q), jnp.asarray(g), ivf["centroids"],
                          ivf["lists"], k=1, nprobe=2)
        recall1 = float(np.mean(np.asarray(i)[:, 0] == qi))
        assert recall1 >= 0.95

    def test_unfilled_slots_are_inf(self, rng):
        g = rng.randn(40, 8).astype(np.float32)
        ivf = build_ivf(g, nlist=8, iters=3, seed=0)
        # nprobe=1 probes one cell (maxlen candidates) but asks for k=40
        d, i = ivf_search(jnp.asarray(g[:2]), jnp.asarray(g),
                          ivf["centroids"], ivf["lists"], k=40, nprobe=1)
        d, i = np.asarray(d), np.asarray(i)
        assert (i[d == np.inf] == -1).all()
        assert np.isfinite(d[i >= 0]).all()
        # finite results come before padding in each row
        for row_d in d:
            fin = np.isfinite(row_d)
            assert fin[: fin.sum()].all()

    def test_int8_gallery(self, rng):
        """IVF over an int8 index: per-tile dequant inside the probe scan.
        Clustered data has genuine near-ties among 2nd+ neighbors that 8-bit
        rounding may reorder, so the contract is the top-1 planted match and
        distance fidelity, not an identical full ranking."""
        g = _clustered_gallery(rng)
        qi = np.arange(0, len(g), 41)
        q = g[qi] + rng.randn(len(qi), g.shape[1]).astype(np.float32) * 0.005
        codes, scales = quantize_index_int8(g)
        ivf = build_ivf(g, nlist=16, iters=10, seed=0)
        d32, i32 = ivf_search(jnp.asarray(q), jnp.asarray(g),
                              ivf["centroids"], ivf["lists"], k=3, nprobe=4)
        d8, i8 = ivf_search(jnp.asarray(q), jnp.asarray(codes),
                            ivf["centroids"], ivf["lists"], k=3, nprobe=4,
                            gallery_scale=scales)
        np.testing.assert_array_equal(np.asarray(i8)[:, 0], qi)
        np.testing.assert_allclose(np.asarray(d8), np.asarray(d32),
                                   rtol=5e-2, atol=5e-3)


class TestRecallOnModelDescriptors:
    def test_recall_curve_gate(self):
        """VERDICT r3 #5: recall-vs-nprobe on REAL model descriptors (the
        EmbedNet over the synthetic place dataset — clustered the way a real
        gallery is), not random vectors. Gates the trade-off
        RetrievalService(ivf_nprobe=N) ships with: tie-tolerant recall@10
        >= 0.95 at nprobe = nlist/8, and exact (1.0) at nprobe = nlist.
        scripts/ivf_recall.py publishes the full curve (docs/SCALING.md)."""
        import importlib.util
        import os.path as osp
        import sys

        spec = importlib.util.spec_from_file_location(
            "ivf_recall",
            osp.join(osp.dirname(__file__), "..", "scripts", "ivf_recall.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        desc = mod.model_descriptors(
            n_places=32, imgs_per_place=3, height=32, width=48
        )
        assert desc.shape[1] == 8 * 512
        curve = mod.recall_curve(desc, n_queries=24, nlist=16, k=10)
        assert curve[16] == 1.0, curve  # full probe == exact (tie-tolerant)
        assert curve[2] >= 0.95, curve  # nlist/8 operating point
        # the curve is monotone non-decreasing in nprobe
        vals = [curve[p] for p in sorted(curve)]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:])), curve


class TestGallerySqnormIVF:
    def test_sqnorm_matches_computed(self, rng):
        """Precomputed row norms (gathered per probed tile) must reproduce
        the computed-norm results exactly — f32 and int8 galleries."""
        g = _clustered_gallery(rng)
        q = g[::37] + rng.randn(len(g[::37]), g.shape[1]).astype(
            np.float32) * 0.01
        ivf = build_ivf(g, nlist=16, iters=10, seed=0)
        n2 = np.einsum("nd,nd->n", g, g)
        for nprobe in (2, 16):
            d0, i0 = ivf_search(jnp.asarray(q), jnp.asarray(g),
                                ivf["centroids"], ivf["lists"],
                                k=5, nprobe=nprobe)
            d1, i1 = ivf_search(jnp.asarray(q), jnp.asarray(g),
                                ivf["centroids"], ivf["lists"],
                                k=5, nprobe=nprobe,
                                gallery_sqnorm=jnp.asarray(n2))
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                                       atol=1e-5)
        codes, scales = quantize_index_int8(g)
        gd = codes.astype(np.float32) * scales[:, None]
        n2q = np.einsum("nd,nd->n", gd, gd)
        d2, i2 = ivf_search(jnp.asarray(q), jnp.asarray(codes),
                            ivf["centroids"], ivf["lists"], k=5, nprobe=4,
                            gallery_scale=scales)
        d3, i3 = ivf_search(jnp.asarray(q), jnp.asarray(codes),
                            ivf["centroids"], ivf["lists"], k=5, nprobe=4,
                            gallery_scale=scales,
                            gallery_sqnorm=jnp.asarray(n2q))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d3), atol=1e-5)
