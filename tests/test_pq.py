"""Product-quantization index tests (ops/pq.py).

Beyond-parity feature (no reference counterpart): correctness is defined
against a float ADC oracle (numpy lookup-table scoring) and against exact
scoring of the decoded gallery, plus recall-quality gates on clustered
synthetic data.
"""

import numpy as np
import pytest

from openibl_tpu.ops.pq import (
    build_ivfpq, build_pq, decode_pq, encode_pq, ivfpq_search, pq_search,
    pq_search_rerank, train_pq,
)


def _adc_oracle(q, codes, cb):
    """Float64 ADC: dist[i, n] = sum_m ||q_m - cb[m, codes[n, m]]||^2."""
    qn, d = q.shape
    m, ksub, dsub = cb.shape
    qs = q.reshape(qn, m, dsub).astype(np.float64)
    lut = ((qs[:, :, None, :] - cb[None].astype(np.float64)) ** 2).sum(-1)
    # lut (Q, m, ksub); gather by codes (N, m)
    out = np.zeros((qn, codes.shape[0]))
    for j in range(m):
        out += lut[:, j, codes[:, j].astype(np.int64)]
    return out


def _blobs(rs, n, d, n_clusters, spread=0.05):
    centers = rs.randn(n_clusters, d).astype(np.float32)
    labels = rs.randint(0, n_clusters, n)
    x = centers[labels] + spread * rs.randn(n, d).astype(np.float32)
    return x.astype(np.float32), labels


def test_codes_shape_dtype_range():
    rs = np.random.RandomState(0)
    x = rs.randn(300, 32).astype(np.float32)
    cb = train_pq(x, m=4, ksub=16, iters=5)
    assert cb.shape == (4, 16, 8) and cb.dtype == np.float32
    codes = encode_pq(cb, x)
    assert codes.shape == (300, 4) and codes.dtype == np.uint8
    assert codes.max() < 16


def test_dim_not_divisible_raises():
    x = np.random.RandomState(0).randn(64, 30).astype(np.float32)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(x, m=4, ksub=8, iters=2)


def test_ksub_over_uint8_raises():
    x = np.random.RandomState(0).randn(64, 32).astype(np.float32)
    with pytest.raises(ValueError, match="uint8"):
        train_pq(x, m=4, ksub=512, iters=2)


def test_reconstruction_error_decreases_with_m():
    rs = np.random.RandomState(1)
    x, _ = _blobs(rs, 600, 32, 20)
    errs = {}
    for m in (2, 8):
        cb = train_pq(x, m=m, ksub=32, iters=10, seed=0)
        rec = decode_pq(cb, encode_pq(cb, x))
        errs[m] = float(np.mean((x - rec) ** 2))
    assert errs[8] < errs[2]


def test_encode_picks_nearest_codeword():
    """Each code must be the argmin subspace centroid (ties aside)."""
    rs = np.random.RandomState(2)
    x = rs.randn(100, 16).astype(np.float32)
    cb = train_pq(x, m=4, ksub=8, iters=5)
    codes = encode_pq(cb, x)
    xs = x.reshape(100, 4, 4)
    for j in range(4):
        d = ((xs[:, j, None, :] - cb[j][None]) ** 2).sum(-1)
        expect = d.min(axis=1)
        got = d[np.arange(100), codes[:, j].astype(np.int64)]
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_pq_search_precise_matches_oracle():
    rs = np.random.RandomState(3)
    x = rs.randn(200, 16).astype(np.float32)
    q = rs.randn(5, 16).astype(np.float32)
    cb = train_pq(x, m=4, ksub=16, iters=8)
    codes = encode_pq(cb, x)
    d, idx = pq_search(q, codes, cb, k=10, precise=True)
    d, idx = np.asarray(d), np.asarray(idx)
    oracle = _adc_oracle(q, codes, cb)
    for r in range(5):
        order = np.argsort(oracle[r])[:10]
        np.testing.assert_allclose(np.sort(d[r]), np.sort(oracle[r][order]),
                                   rtol=1e-4, atol=1e-5)
        assert set(idx[r].tolist()) == set(order.tolist())


def test_pq_search_matches_exact_scoring_of_decoded_gallery():
    """ADC distances ARE exact distances to the decoded codes."""
    rs = np.random.RandomState(4)
    x = rs.randn(150, 24).astype(np.float32)
    q = rs.randn(3, 24).astype(np.float32)
    cb = train_pq(x, m=6, ksub=16, iters=8)
    codes = encode_pq(cb, x)
    rec = decode_pq(cb, codes)
    d_exact = ((q[:, None].astype(np.float64)
                - rec[None].astype(np.float64)) ** 2).sum(-1)
    d, idx = pq_search(q, codes, cb, k=5, precise=True)
    d, idx = np.asarray(d), np.asarray(idx)
    for r in range(3):
        np.testing.assert_allclose(
            d[r], d_exact[r][idx[r]], rtol=1e-4, atol=1e-5)


def test_pq_search_bf16_close_to_oracle():
    rs = np.random.RandomState(5)
    x = rs.randn(400, 32).astype(np.float32)
    q = rs.randn(4, 32).astype(np.float32)
    cb = train_pq(x, m=8, ksub=32, iters=8)
    codes = encode_pq(cb, x)
    d, idx = pq_search(q, codes, cb, k=10)  # default bf16 path
    d, idx = np.asarray(d), np.asarray(idx)
    oracle = _adc_oracle(q, codes, cb)
    overlaps = []
    for r in range(4):
        np.testing.assert_allclose(
            d[r], oracle[r][idx[r]], rtol=2e-2, atol=1e-2)
        top = set(np.argsort(oracle[r])[:10].tolist())
        overlaps.append(len(top & set(idx[r].tolist())) / 10)
    # bf16 LUT rounding may swap near-ties only
    assert np.mean(overlaps) >= 0.8


def test_pq_search_tiling_and_padding():
    """Multi-tile scan with a ragged final tile matches the one-tile run."""
    rs = np.random.RandomState(6)
    x = rs.randn(150, 16).astype(np.float32)
    q = rs.randn(2, 16).astype(np.float32)
    cb = train_pq(x, m=4, ksub=16, iters=5)
    codes = encode_pq(cb, x)
    d1, i1 = pq_search(q, codes, cb, k=7, chunk=64, precise=True)
    d2, i2 = pq_search(q, codes, cb, k=7, chunk=150, precise=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert (np.asarray(i1) >= 0).all() and (np.asarray(i1) < 150).all()


def test_recall_on_clustered_gallery():
    """Shortlist recall on planted neighbors (the PQ quality contract).

    PQ cannot rank a planted row above its blob-mates once they share
    codes (the quantizer collapses a tight blob to near-identical
    reconstructions — that's the compression working), so the metric is
    recall@R for a shortlist R, plus semantic top-1 (right blob), the
    quantities FAISS benchmarks IndexPQ on."""
    rs = np.random.RandomState(7)
    gallery, labels = _blobs(rs, 2000, 64, 50, spread=0.05)
    # queries are perturbed gallery rows -> unambiguous exact top-1
    q_ids = rs.choice(2000, 32, replace=False)
    queries = gallery[q_ids] + 0.01 * rs.randn(32, 64).astype(np.float32)
    cb = train_pq(gallery, m=8, ksub=64, iters=15, seed=0)
    codes = encode_pq(cb, gallery)
    _, idx = pq_search(queries, codes, cb, k=50)
    idx = np.asarray(idx)
    recall50 = np.mean([q_ids[r] in idx[r] for r in range(32)])
    recall20 = np.mean([q_ids[r] in idx[r, :20] for r in range(32)])
    blob1 = np.mean(
        [labels[idx[r, 0]] == labels[q_ids[r]] for r in range(32)])
    assert recall50 >= 0.95, recall50  # measured 1.0
    assert recall20 >= 0.8, recall20  # measured 0.91
    assert blob1 >= 0.95, blob1  # measured 1.0

    # finer quantization must lift short-shortlist recall (measured
    # m=8 -> 0.78, m=16 -> 0.91 at R=10)
    cb16 = train_pq(gallery, m=16, ksub=64, iters=15, seed=0)
    _, idx16 = pq_search(queries, encode_pq(cb16, gallery), cb16, k=10)
    idx16 = np.asarray(idx16)
    recall10_16 = np.mean([q_ids[r] in idx16[r] for r in range(32)])
    assert recall10_16 >= 0.85, recall10_16


def test_build_pq_payload_keys():
    rs = np.random.RandomState(8)
    x = rs.randn(128, 32).astype(np.float32)
    payload = build_pq(x, m=4, ksub=16, iters=3)
    assert payload["pq_codebooks"].shape == (4, 16, 8)
    assert payload["pq_codes"].shape == (128, 4)
    assert payload["pq_codes"].dtype == np.uint8


class TestPQRerank:
    def _world(self, seed=30, n=1200, d=64, blobs=40):
        rs = np.random.RandomState(seed)
        gallery, _ = _blobs(rs, n, d, blobs, spread=0.05)
        queries = (gallery[rs.choice(n, 16, replace=False)]
                   + 0.01 * rs.randn(16, d)).astype(np.float32)
        cb = train_pq(gallery, m=8, ksub=64, iters=10, seed=0)
        return gallery, queries, cb, encode_pq(cb, gallery)

    def test_matches_exact_scan(self):
        """With a shortlist that covers the true top-k (recall@shortlist
        ~1.0 on this data), the re-rank must return exactly the exact
        scan's ids and distances."""
        from openibl_tpu.ops.distance import topk_nearest

        gallery, queries, cb, codes = self._world()
        d_ex, i_ex = topk_nearest(queries, gallery, k=5)
        d_rr, i_rr = pq_search_rerank(queries, codes, cb, gallery,
                                      k=5, shortlist=100)
        np.testing.assert_array_equal(np.asarray(i_rr), np.asarray(i_ex))
        # f32 accumulation-order noise between the gathered (Q,S,D) einsum
        # and the full-scan formulation: measured max |diff| 1.5e-5
        np.testing.assert_allclose(np.asarray(d_rr), np.asarray(d_ex),
                                   rtol=1e-2, atol=5e-5)

    def test_int8_gallery_scales(self):
        """Re-rank against an int8 gallery dequantizes the gathered rows
        (same contract as topk_nearest's gallery_scale)."""
        from openibl_tpu.ops.distance import (
            quantize_index_int8, topk_nearest,
        )

        gallery, queries, cb, codes = self._world(seed=31)
        g8, scales = quantize_index_int8(gallery)
        d_ex, i_ex = topk_nearest(queries, g8, k=5, gallery_scale=scales)
        d_rr, i_rr = pq_search_rerank(queries, codes, cb, g8, k=5,
                                      shortlist=100, gallery_scale=scales)
        np.testing.assert_array_equal(np.asarray(i_rr), np.asarray(i_ex))
        np.testing.assert_allclose(np.asarray(d_rr), np.asarray(d_ex),
                                   rtol=1e-3, atol=1e-4)

    def test_shortlist_clamps(self):
        gallery, queries, cb, codes = self._world(seed=32, n=40)
        d, idx = pq_search_rerank(queries[:2], codes, cb, gallery,
                                  k=50, shortlist=10_000)
        assert np.asarray(d).shape == (2, 40)  # k and shortlist clamp to N
        assert sorted(np.asarray(idx)[0].tolist()) == list(range(40))


def _ivfpq_oracle(q, payload):
    """Float64 IVFADC with nprobe=nlist: ADC distance of every row in its
    own cell's residual frame — the exact quantity ivfpq_search scores."""
    cb = payload["ivfpq_codebooks"].astype(np.float64)
    codes = payload["ivfpq_codes"].astype(np.int64)
    cents = payload["ivf_centroids"].astype(np.float64)
    lists = payload["ivf_lists"]
    n = codes.shape[0]
    cell_of = np.empty(n, np.int64)
    valid = lists >= 0
    cell_of[lists[valid]] = np.nonzero(valid)[0]
    m, ksub, dsub = cb.shape
    out = np.zeros((q.shape[0], n))
    for qi in range(q.shape[0]):
        for row in range(n):
            r = q[qi].astype(np.float64) - cents[cell_of[row]]
            rs = r.reshape(m, dsub)
            out[qi, row] = sum(
                ((rs[j] - cb[j, codes[row, j]]) ** 2).sum() for j in range(m)
            )
    return out


class TestIVFPQ:
    def test_payload_shapes_and_partition(self):
        rs = np.random.RandomState(20)
        x = rs.randn(300, 32).astype(np.float32)
        p = build_ivfpq(x, nlist=8, m=4, ksub=16, iters=5)
        assert p["ivfpq_codes"].shape == (300, 4)
        assert p["ivfpq_codes"].dtype == np.uint8
        assert p["ivfpq_codebooks"].shape == (4, 16, 8)
        ids = p["ivf_lists"][p["ivf_lists"] >= 0]
        assert sorted(ids.tolist()) == list(range(300))  # exact partition

    def test_full_probe_matches_oracle(self):
        """nprobe=nlist is exhaustive: distances/ids must equal the float
        IVFADC oracle over all rows."""
        rs = np.random.RandomState(21)
        x = rs.randn(120, 16).astype(np.float32)
        q = rs.randn(3, 16).astype(np.float32)
        p = build_ivfpq(x, nlist=4, m=4, ksub=16, iters=5)
        d, idx = ivfpq_search(q, p["ivfpq_codes"], p["ivfpq_codebooks"],
                              p["ivf_centroids"], p["ivf_lists"],
                              k=10, nprobe=4)
        d, idx = np.asarray(d), np.asarray(idx)
        oracle = _ivfpq_oracle(q, p)
        for r in range(3):
            order = np.argsort(oracle[r])[:10]
            np.testing.assert_allclose(
                np.sort(d[r]), np.sort(oracle[r][order]),
                rtol=1e-4, atol=1e-5)
            assert set(idx[r].tolist()) == set(order.tolist())

    def test_residual_codes_beat_plain_pq(self):
        """The coarse quantizer absorbs the blob structure, so residual-PQ
        reconstruction error must undercut plain PQ at the same m."""
        rs = np.random.RandomState(22)
        centers = rs.randn(30, 32).astype(np.float32) * 3.0
        labels = rs.randint(0, 30, 1500)
        x = (centers[labels] + 0.2 * rs.randn(1500, 32)).astype(np.float32)

        cb = train_pq(x, m=4, ksub=32, iters=10)
        plain_err = float(np.mean(
            (x - decode_pq(cb, encode_pq(cb, x))) ** 2))

        p = build_ivfpq(x, nlist=32, m=4, ksub=32, iters=10)
        cell_of = np.empty(1500, np.int64)
        valid = p["ivf_lists"] >= 0
        cell_of[p["ivf_lists"][valid]] = np.nonzero(valid)[0]
        rec = (p["ivf_centroids"][cell_of]
               + decode_pq(p["ivfpq_codebooks"], p["ivfpq_codes"]))
        ivf_err = float(np.mean((x - rec) ** 2))
        assert ivf_err < plain_err, (ivf_err, plain_err)

    def test_recall_with_partial_probe(self):
        """Planted queries: nprobe=4 of 16 cells keeps shortlist recall."""
        rs = np.random.RandomState(23)
        centers = rs.randn(40, 64).astype(np.float32)
        labels = rs.randint(0, 40, 2000)
        gallery = (centers[labels]
                   + 0.05 * rs.randn(2000, 64)).astype(np.float32)
        q_ids = rs.choice(2000, 24, replace=False)
        queries = (gallery[q_ids]
                   + 0.01 * rs.randn(24, 64)).astype(np.float32)
        p = build_ivfpq(gallery, nlist=16, m=8, ksub=64, iters=10)
        _, idx = ivfpq_search(queries, p["ivfpq_codes"],
                              p["ivfpq_codebooks"], p["ivf_centroids"],
                              p["ivf_lists"], k=50, nprobe=4)
        idx = np.asarray(idx)
        recall50 = np.mean([q_ids[r] in idx[r] for r in range(24)])
        blob1 = np.mean(
            [labels[idx[r, 0]] == labels[q_ids[r]] for r in range(24)])
        assert recall50 >= 0.9, recall50
        assert blob1 >= 0.9, blob1

    def test_unfilled_slots_are_inf(self):
        rs = np.random.RandomState(24)
        x = rs.randn(40, 16).astype(np.float32)
        p = build_ivfpq(x, nlist=8, m=4, ksub=8, iters=3)
        d, idx = ivfpq_search(x[:2], p["ivfpq_codes"],
                              p["ivfpq_codebooks"], p["ivf_centroids"],
                              p["ivf_lists"], k=30, nprobe=1)
        d, idx = np.asarray(d), np.asarray(idx)
        # one cell holds at most maxlen=10 rows -> the rest must be padded
        assert (idx[0] == -1).any()
        assert np.isinf(d[0][idx[0] == -1]).all()
        filled = idx[0] >= 0
        assert np.isfinite(d[0][filled]).all()


class TestRecallOnModelDescriptors:
    def test_pq_and_ivfadc_recall_gate(self):
        """Recall on REAL model descriptors (EmbedNet over the synthetic
        place dataset — clustered like a real gallery), the quantity
        scripts/pq_recall.py publishes for docs/SCALING.md: tie-tolerant
        recall@10 (hits judged by the candidates' EXACT distances vs the
        exact k-th + eps, since ADC distances aren't comparable raw).
        Full-scale artifact (1248-image gallery): plain PQ = 1.000 at
        every m in 8..64; IVFADC in top-4k >= 0.999 from nprobe=2 of 64
        (logs/pq_recall.json)."""
        import importlib.util
        import os.path as osp

        mods = {}
        for name in ("ivf_recall", "pq_recall"):
            spec = importlib.util.spec_from_file_location(
                name,
                osp.join(osp.dirname(__file__), "..", "scripts",
                         f"{name}.py"),
            )
            mods[name] = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mods[name])
        pq_recall = mods["pq_recall"]

        desc = mods["ivf_recall"].model_descriptors(
            n_places=32, imgs_per_place=3, height=32, width=48)
        pq_rows, ivfpq_rows, m_ivf, _ = pq_recall.recall_tables(
            desc, n_queries=24, k=10, ms=[16], nlist=8,
            opq_iters=0)  # OPQ pays D x D SVDs; gated at small D (TestOPQ)
        assert pq_rows[16]["recall_at_k"] >= 0.95, pq_rows
        assert pq_rows[16]["recall_at_k_in_top_4k"] >= 0.98, pq_rows
        assert ivfpq_rows[8] >= 0.98, ivfpq_rows  # full probe
        # monotone non-decreasing in nprobe
        vals = [ivfpq_rows[p] for p in sorted(ivfpq_rows)]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))


class TestOPQ:
    """OPQ rotation (ops.pq train_opq — Ge et al. CVPR'13 OPQ_NP).

    Quality contract: on data whose correlation structure straddles the
    fixed subspace split (latent-factor mixes), the learned rotation must
    cut reconstruction error well below plain PQ's; correctness contract:
    rotated search paths stay pinned to the same oracles as the unrotated
    ones, and the exact re-rank is rotation-invariant."""

    def _correlated(self, rs, n=1500, d=64, latent=12, noise=0.05):
        lat = rs.randn(n, latent).astype(np.float32)
        mix = rs.randn(latent, d).astype(np.float32)
        return (lat @ mix + noise * rs.randn(n, d)).astype(np.float32)

    @staticmethod
    def _recon_err(payload, x):
        y = decode_pq(payload["pq_codebooks"], payload["pq_codes"])
        if "pq_rotation" in payload:
            y = y @ payload["pq_rotation"].T  # back to original space
        return float(np.mean(np.sum((x - y) ** 2, axis=1)))

    def test_rotation_is_orthogonal(self):
        from openibl_tpu.ops.pq import train_opq

        rs = np.random.RandomState(40)
        x = self._correlated(rs, n=600, d=32, latent=8)
        rot, cb = train_opq(x, m=4, ksub=16, iters=6, opq_iters=4)
        assert rot.shape == (32, 32) and rot.dtype == np.float32
        np.testing.assert_allclose(rot @ rot.T, np.eye(32), atol=1e-5)
        assert cb.shape == (4, 16, 8)

    def test_opq_beats_pq_on_correlated_data(self):
        """Latent-mix data: the fixed split wastes code entropy on
        correlated dims; OPQ must recover a large fraction (measured
        ratio ~0.3 at these shapes — gate at 0.7 for seed headroom)."""
        rs = np.random.RandomState(41)
        x = self._correlated(rs, n=1500, d=64, latent=12)
        e_pq = self._recon_err(build_pq(x, m=8, ksub=32, iters=10), x)
        e_opq = self._recon_err(
            build_pq(x, m=8, ksub=32, iters=10, opq_iters=5), x)
        assert e_opq < 0.7 * e_pq, (e_opq, e_pq)

    def test_rotated_search_matches_adc_oracle(self):
        """pq_search(rotation=R) must equal the float ADC oracle run on
        the rotated query — the rotation changes the frame, not the
        scoring."""
        rs = np.random.RandomState(42)
        x = self._correlated(rs, n=300, d=32, latent=8)
        q = x[:4]
        payload = build_pq(x, m=4, ksub=16, iters=6, opq_iters=3)
        rot = payload["pq_rotation"]
        d, idx = pq_search(q, payload["pq_codes"], payload["pq_codebooks"],
                           k=6, precise=True, rotation=rot)
        oracle = _adc_oracle(q @ rot, payload["pq_codes"],
                             payload["pq_codebooks"])
        got = np.take_along_axis(oracle, np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.asarray(d), got, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(idx), np.argsort(oracle, axis=1)[:, :6])

    def test_rerank_with_rotation_matches_exact(self):
        """Covering shortlist + OPQ codes: the exact re-rank must still
        return the exact scan's ids (the rotation only affects which
        candidates the ADC pass surfaces)."""
        from openibl_tpu.ops.distance import topk_nearest

        rs = np.random.RandomState(43)
        x = self._correlated(rs, n=400, d=32, latent=8)
        q = x[:4] + 0.01 * rs.randn(4, 32).astype(np.float32)
        payload = build_pq(x, m=4, ksub=16, iters=6, opq_iters=3)
        d_ex, i_ex = topk_nearest(q, x, k=5)
        d_rr, i_rr = pq_search_rerank(
            q, payload["pq_codes"], payload["pq_codebooks"], x, k=5,
            shortlist=400, rotation=payload["pq_rotation"])
        np.testing.assert_array_equal(np.asarray(i_rr), np.asarray(i_ex))
        np.testing.assert_allclose(np.asarray(d_rr), np.asarray(d_ex),
                                   rtol=1e-2, atol=5e-5)

    def test_ivfpq_opq_full_probe_matches_reconstruction_oracle(self):
        """IVFADC+OPQ at nprobe=nlist: returned ADC distances must equal
        exact distances to centroid + rotated-back decoded residual."""
        rs = np.random.RandomState(44)
        x = self._correlated(rs, n=240, d=32, latent=8)
        q = x[:3]
        p = build_ivfpq(x, nlist=6, m=4, ksub=16, iters=6, opq_iters=3)
        assert "ivfpq_rotation" in p
        d, idx = ivfpq_search(q, p["ivfpq_codes"], p["ivfpq_codebooks"],
                              p["ivf_centroids"], p["ivf_lists"], k=5,
                              nprobe=6, rotation=p["ivfpq_rotation"])
        lists = p["ivf_lists"]
        cell_of = np.empty(240, np.int64)
        valid = lists >= 0
        cell_of[lists[valid]] = np.nonzero(valid)[0]
        res = decode_pq(p["ivfpq_codebooks"], p["ivfpq_codes"])
        recon = (res @ p["ivfpq_rotation"].T
                 + p["ivf_centroids"][cell_of])
        oracle = np.sum(
            (q[:, None].astype(np.float64)
             - recon[None].astype(np.float64)) ** 2, axis=2)
        got = np.take_along_axis(oracle, np.asarray(idx, np.int64), axis=1)
        np.testing.assert_allclose(np.asarray(d), got, rtol=1e-3,
                                   atol=1e-3)

    def test_opq_iters_zero_payload_has_no_rotation(self):
        rs = np.random.RandomState(45)
        x = rs.randn(64, 16).astype(np.float32)
        assert "pq_rotation" not in build_pq(x, m=4, ksub=8, iters=2)
        assert "ivfpq_rotation" not in build_ivfpq(x, nlist=4, m=4, ksub=8,
                                                   iters=2)


def test_k_clamped_to_gallery_size():
    rs = np.random.RandomState(9)
    x = rs.randn(6, 16).astype(np.float32)
    cb = train_pq(x, m=4, ksub=4, iters=3)
    codes = encode_pq(cb, x)
    d, idx = pq_search(x[:2], codes, cb, k=50, precise=True)
    assert np.asarray(d).shape == (2, 6)
    assert sorted(np.asarray(idx)[0].tolist()) == list(range(6))


class TestPallasADCKernel:
    """ops/pq_kernel.py (interpret mode on CPU): the in-VMEM one-hot ADC
    tile scorer and the kernel=True pq_search path must match the float
    oracle / the XLA formulation exactly."""

    def test_adc_tile_matches_oracle(self):
        from openibl_tpu.ops.pq_kernel import adc_tile

        rs = np.random.RandomState(50)
        m, ksub, q, t = 4, 16, 5, 64
        lut = rs.randn(m, q, ksub).astype(np.float32)
        codes_t = rs.randint(0, ksub, (m, t)).astype(np.uint8)
        got = np.asarray(adc_tile(lut, codes_t, precise=True,
                                  interpret=True))
        want = np.zeros((q, t))
        for j in range(m):
            want += lut[j][:, codes_t[j].astype(np.int64)]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_kernel_search_matches_xla_search(self):
        rs = np.random.RandomState(51)
        x, _ = _blobs(rs, 500, 32, 12)
        q = x[:6] + 0.01 * rs.randn(6, 32).astype(np.float32)
        p = build_pq(x, m=4, ksub=16, iters=6)
        d0, i0 = pq_search(q, p["pq_codes"], p["pq_codebooks"], k=7,
                           precise=True, kernel=False)
        d1, i1 = pq_search(q, p["pq_codes"], p["pq_codebooks"], k=7,
                           precise=True, kernel=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=1e-5, atol=1e-5)

    def test_kernel_search_with_rotation(self):
        rs = np.random.RandomState(52)
        x = rs.randn(300, 32).astype(np.float32)
        q = x[:4]
        p = build_pq(x, m=4, ksub=16, iters=5, opq_iters=2)
        d0, i0 = pq_search(q, p["pq_codes"], p["pq_codebooks"], k=5,
                           precise=True, kernel=False,
                           rotation=p["pq_rotation"])
        d1, i1 = pq_search(q, p["pq_codes"], p["pq_codebooks"], k=5,
                           precise=True, kernel=True,
                           rotation=p["pq_rotation"])
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=1e-5, atol=1e-5)

    def test_kernel_rejects_over_budget(self):
        from openibl_tpu.ops.pq_kernel import adc_tile_fits

        assert adc_tile_fits(64, 16, 256, 1024)
        assert not adc_tile_fits(64, 4096, 256, 1024)  # huge query batch
        rs = np.random.RandomState(53)
        x = rs.randn(64, 512).astype(np.float32)
        p = build_pq(x, m=64, ksub=256, iters=2)  # LUT alone = 4·64·Q·256
        with pytest.raises(ValueError, match="VMEM budget"):
            pq_search(rs.randn(4096, 512).astype(np.float32),
                      p["pq_codes"], p["pq_codebooks"], k=5, kernel=True)

    def test_env_override_forces_xla(self, monkeypatch):
        """OPENIBL_PQ_KERNEL=0 must pin the XLA path even with kernel=True
        requested (the escape hatch if a toolchain can't lower the kernel)."""
        rs = np.random.RandomState(54)
        x = rs.randn(200, 16).astype(np.float32)
        p = build_pq(x, m=4, ksub=16, iters=3)
        monkeypatch.setenv("OPENIBL_PQ_KERNEL", "0")
        d0, i0 = pq_search(x[:3], p["pq_codes"], p["pq_codebooks"], k=5,
                           kernel=True)  # env wins: still XLA
        monkeypatch.delenv("OPENIBL_PQ_KERNEL")
        d1, i1 = pq_search(x[:3], p["pq_codes"], p["pq_codebooks"], k=5,
                           kernel=False)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                                   rtol=1e-6, atol=1e-6)
