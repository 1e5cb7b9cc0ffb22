"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Exercises the data-parallel design (SURVEY.md §5): replicated params,
batch-sharded inputs, XLA-inserted gradient reductions — without TPUs."""

import numpy as np
import jax
import jax.numpy as jnp

from openibl_tpu import models
from openibl_tpu.models.netvlad import NetVLAD
from openibl_tpu.engine.trainer import Trainer
from openibl_tpu.parallel.mesh import get_mesh, shard_batch, data_sharding
from openibl_tpu.parallel.extract import extract_features


class FakeLoader:
    """BatchLoader-contract loader over an in-memory array."""

    def __init__(self, images, batch_size):
        self.images = images
        self.batch_size = batch_size

    def __len__(self):
        return -(-len(self.images) // self.batch_size)

    def __iter__(self):
        bs = self.batch_size
        for s in range(0, len(self.images), bs):
            chunk = self.images[s : s + bs]
            idx = np.arange(s, s + len(chunk))
            count = len(chunk)
            if count < bs:
                pad = bs - count
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            yield chunk, idx, count


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_sharded_extraction_matches_single(rng):
    model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
    params = model.init(jax.random.PRNGKey(0))
    images = rng.randn(19, 32, 32, 3).astype(np.float32) * 20
    mesh = get_mesh()
    feats_mesh = extract_features(
        model.apply, params, FakeLoader(images, 8), mesh=mesh
    )
    feats_single = extract_features(
        model.apply, params, FakeLoader(images, 8), mesh=None
    )
    assert feats_mesh.shape == (19, 4 * 512)
    np.testing.assert_allclose(feats_mesh, feats_single, rtol=1e-4, atol=1e-5)


def test_dp_train_step_matches_single_device(rng):
    """Gradient of the mean loss over a sharded batch must equal the
    single-device gradient (the pjit analog of DDP all-reduce)."""
    model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
    params = model.init(jax.random.PRNGKey(0))
    imgs = rng.randn(8, 4, 16, 16, 3).astype(np.float32) * 20

    # single-device first: the mesh step donates its inputs, and device_put
    # may alias host buffers on the CPU backend
    tr_single = Trainer(model, loss_type="sare_ind", lr=1e-2)
    opt_single = tr_single.init(params)
    p_single, _, loss_single = tr_single._step(
        jax.tree.map(jnp.array, params), opt_single, jnp.asarray(imgs)
    )

    mesh = get_mesh()
    tr_mesh = Trainer(model, loss_type="sare_ind", lr=1e-2, mesh=mesh)
    opt_mesh = tr_mesh.init(params)
    p_mesh, _, loss_mesh = tr_mesh._step(
        jax.device_put(params, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
        opt_mesh,
        jax.device_put(jnp.asarray(imgs), data_sharding(mesh, 5)),
    )

    assert abs(float(loss_mesh) - float(loss_single)) < 1e-5
    a = np.asarray(p_mesh["vlad"]["centroids"])
    b = np.asarray(p_single["vlad"]["centroids"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_shard_batch_places_on_mesh(rng):
    mesh = get_mesh()
    batch = rng.randn(16, 4).astype(np.float32)
    out = shard_batch(mesh, batch)
    assert out.sharding.spec == jax.sharding.PartitionSpec("data", None)


def test_extract_features_sharded_single_process(rng):
    """extract_features_sharded must match the plain path (single process) and
    handle explicit index subsets."""
    from openibl_tpu.parallel.extract import extract_features_sharded

    class ArraySource:
        def __init__(self, arr):
            self.arr = arr

        def __len__(self):
            return len(self.arr)

        def load(self, i):
            return self.arr[i]

    model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
    params = model.init(jax.random.PRNGKey(0))
    images = rng.randn(11, 32, 32, 3).astype(np.float32) * 20
    src = ArraySource(images)
    all_feats = extract_features_sharded(model.apply, params, src, batch_size=4)
    assert all_feats.shape == (11, 2048)
    sub = np.array([3, 7, 1])
    sub_feats = extract_features_sharded(
        model.apply, params, src, indices=sub, batch_size=4
    )
    np.testing.assert_allclose(sub_feats, all_feats[np.sort(sub)], rtol=1e-4,
                               atol=1e-5)


def test_device_output_extraction(rng):
    """device_output=True must return an HBM-resident jax.Array identical to
    the numpy path (VERDICT r3 #2) — including the unsorted-subset reorder —
    and re-wrapping it with jnp.asarray must be a no-op (the mechanism that
    makes sampler.refresh consume it with zero H2D)."""
    from openibl_tpu.parallel.extract import extract_features_sharded

    class ArraySource:
        def __init__(self, arr):
            self.arr = arr

        def __len__(self):
            return len(self.arr)

        def load(self, i):
            return self.arr[i]

    model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
    params = model.init(jax.random.PRNGKey(0))
    images = rng.randn(11, 32, 32, 3).astype(np.float32) * 20
    src = ArraySource(images)

    host = extract_features_sharded(model.apply, params, src, batch_size=4)
    dev = extract_features_sharded(model.apply, params, src, batch_size=4,
                                   device_output=True)
    assert isinstance(dev, jax.Array)
    assert jnp.asarray(dev) is dev  # no copy on the mining-side rewrap
    np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-5, atol=1e-6)

    # permuted subset: the ascending-order contract must hold on device too
    sub = np.array([9, 2, 5, 0, 7])
    host_sub = extract_features_sharded(model.apply, params, src,
                                        indices=sub, batch_size=2)
    dev_sub = extract_features_sharded(model.apply, params, src, indices=sub,
                                       batch_size=2, device_output=True)
    np.testing.assert_allclose(np.asarray(dev_sub), host_sub,
                               rtol=1e-5, atol=1e-6)

    # under a mesh as well (the single-process sharded mining pass)
    mesh = get_mesh()
    dev_mesh = extract_features_sharded(model.apply, params, src,
                                        batch_size=4, mesh=mesh,
                                        device_output=True)
    assert isinstance(dev_mesh, jax.Array)
    np.testing.assert_allclose(np.asarray(dev_mesh), host, rtol=1e-4,
                               atol=1e-5)


def test_device_output_feeds_mining(rng):
    """sampler.refresh on device-resident descriptors must mine the exact
    tuples the numpy path mines (the end-to-end contract behind the
    HBM-resident mining redesign)."""
    from openibl_tpu.data.sampler import TupleSampler

    n_q, n_g, d = 12, 40, 16
    q = rng.randn(n_q, d).astype(np.float32)
    g = rng.randn(n_g, d).astype(np.float32)
    pos_list = [[(3 * i) % n_g, (3 * i + 1) % n_g] for i in range(n_q)]
    neg_list = [sorted(set(p) | {(7 * i) % n_g}) for i, p in
                enumerate(pos_list)]
    sub = np.arange(n_q)

    s_host = TupleSampler(n_q, n_g, pos_list, neg_list, neg_num=3,
                          neg_pool=20, seed=0)
    t_host = s_host.refresh(q, g, sub)
    s_dev = TupleSampler(n_q, n_g, pos_list, neg_list, neg_num=3,
                         neg_pool=20, seed=0)
    t_dev = s_dev.refresh(jnp.asarray(q), jnp.asarray(g), sub)
    assert t_host == t_dev
    np.testing.assert_array_equal(s_host.neg_cache, s_dev.neg_cache)


def test_pool_feature_extraction(rng):
    """feature='pool' returns the normalized global max-pool vector
    (the reference's --vlad off path)."""
    from openibl_tpu.parallel.extract import extract_features

    model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
    params = model.init(jax.random.PRNGKey(0))
    images = rng.randn(4, 32, 32, 3).astype(np.float32) * 20
    feats = extract_features(
        model.apply, params, FakeLoader(images, 4), feature="pool"
    )
    assert feats.shape == (4, 512)
    pool, _ = model.apply(params, jnp.asarray(images))
    pool = np.array(pool)  # writable copy
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    np.testing.assert_allclose(feats, pool, rtol=1e-4, atol=1e-5)


def test_topk_nearest_sharded_matches_single(rng):
    """Sharded-gallery kNN over the 8-device mesh == single-device result."""
    from openibl_tpu.ops.distance import topk_nearest, topk_nearest_sharded

    q = rng.randn(9, 16).astype(np.float32)
    g = rng.randn(64, 16).astype(np.float32)
    mesh = get_mesh()
    import jax as _jax

    g_sharded = _jax.device_put(
        jnp.asarray(g), data_sharding(mesh, 2)
    )
    d_s, i_s = topk_nearest_sharded(jnp.asarray(q), g_sharded, mesh, k=7,
                                    chunk=4)
    d_ref, i_ref = topk_nearest(jnp.asarray(q), jnp.asarray(g), k=7, chunk=16)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-4)
    assert np.mean(np.asarray(i_s) == np.asarray(i_ref)) > 0.98  # tie noise


def test_topk_sharded_k_exceeds_shard(rng):
    """k larger than a single shard still returns k globally-correct results."""
    from openibl_tpu.ops.distance import topk_nearest_sharded

    q = rng.randn(3, 8).astype(np.float32)
    g = rng.randn(32, 8).astype(np.float32)  # 4 rows per device
    mesh = get_mesh()
    d_s, i_s = topk_nearest_sharded(jnp.asarray(q), jnp.asarray(g), mesh, k=10,
                                    chunk=4)
    ref = np.sort(((q[:, None] - g[None]) ** 2).sum(-1), axis=1)[:, :10]
    np.testing.assert_allclose(np.asarray(d_s), ref, rtol=1e-4, atol=1e-4)


def test_evaluate_descriptors_sharded_gallery(rng):
    """Recall via the sharded-gallery kNN path == single-device recall,
    including the non-divisible padding case."""
    from openibl_tpu.engine.evaluator import evaluate_descriptors

    g = rng.randn(50, 16).astype(np.float32)  # 50 % 8 != 0 → padding
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:10] + 0.01 * rng.randn(10, 16).astype(np.float32)
    gt = [[i] for i in range(10)]
    mesh = get_mesh()
    r_sharded = evaluate_descriptors(q, g, gt, topk=(1, 5),
                                     print_results=False, mesh=mesh)
    r_single = evaluate_descriptors(q, g, gt, topk=(1, 5), print_results=False)
    np.testing.assert_allclose(r_sharded, r_single)
    np.testing.assert_allclose(r_sharded, [1.0, 1.0])


def test_topk_sharded_sqnorm_matches(rng):
    """Precomputed sharded row norms (serving threads them per shard) must
    not change the sharded kNN result — plain and int8 galleries."""
    from openibl_tpu.ops.distance import (
        quantize_index_int8, topk_nearest_sharded,
    )

    q = rng.randn(5, 16).astype(np.float32)
    g = rng.randn(64, 16).astype(np.float32)
    n2 = np.einsum("nd,nd->n", g, g)
    mesh = get_mesh()
    d0, i0 = topk_nearest_sharded(jnp.asarray(q), jnp.asarray(g), mesh, k=7,
                                  chunk=4)
    d1, i1 = topk_nearest_sharded(jnp.asarray(q), jnp.asarray(g), mesh, k=7,
                                  chunk=4, gallery_sqnorm=n2)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)
    codes, scales = quantize_index_int8(g)
    gd = codes.astype(np.float32) * scales[:, None]
    n2q = np.einsum("nd,nd->n", gd, gd)
    d2, i2 = topk_nearest_sharded(jnp.asarray(q), jnp.asarray(codes), mesh,
                                  k=7, chunk=4, gallery_scale=scales)
    d3, i3 = topk_nearest_sharded(jnp.asarray(q), jnp.asarray(codes), mesh,
                                  k=7, chunk=4, gallery_scale=scales,
                                  gallery_sqnorm=n2q)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i3))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d3),
                               rtol=1e-5, atol=1e-5)


class TestPQSearchSharded:
    """pq_search_sharded (ops.pq): ADC over mesh-sharded uint8 codes must
    equal the single-device scan — the pod-scale index composition."""

    def _index(self, rng, n=64, d=32, m=4, opq=0):
        from openibl_tpu.ops.pq import build_pq

        g = rng.randn(n, d).astype(np.float32)
        q = g[:5] + 0.01 * rng.randn(5, d).astype(np.float32)
        return q, build_pq(g, m=m, ksub=16, iters=6, opq_iters=opq)

    def test_matches_single_device(self, rng):
        from openibl_tpu.ops.pq import pq_search, pq_search_sharded

        q, p = self._index(rng)
        mesh = get_mesh()
        codes = jnp.asarray(p["pq_codes"])
        d1, i1 = pq_search(q, codes, p["pq_codebooks"], k=7, precise=True)
        d8, i8 = pq_search_sharded(q, codes, p["pq_codebooks"], mesh, k=7,
                                   precise=True)
        np.testing.assert_array_equal(np.asarray(i8), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d8), np.asarray(d1),
                                   rtol=1e-5, atol=1e-5)

    def test_non_divisible_gallery_pads_safely(self, rng):
        """61 % 8 != 0: zero-padded codes decode to REAL codebook entries,
        so the masking (not luck) must keep fake rows out of the result."""
        from openibl_tpu.ops.pq import pq_search, pq_search_sharded

        q, p = self._index(rng, n=61)
        mesh = get_mesh()
        d1, i1 = pq_search(q, p["pq_codes"], p["pq_codebooks"], k=7,
                           precise=True)
        d8, i8 = pq_search_sharded(q, p["pq_codes"], p["pq_codebooks"],
                                   mesh, k=7, precise=True)
        assert np.all(np.asarray(i8) < 61) and np.all(np.asarray(i8) >= 0)
        np.testing.assert_array_equal(np.asarray(i8), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d8), np.asarray(d1),
                                   rtol=1e-5, atol=1e-5)

    def test_opq_rotation(self, rng):
        from openibl_tpu.ops.pq import pq_search, pq_search_sharded

        q, p = self._index(rng, opq=3)
        mesh = get_mesh()
        rot = p["pq_rotation"]
        d1, i1 = pq_search(q, p["pq_codes"], p["pq_codebooks"], k=6,
                           precise=True, rotation=rot)
        d8, i8 = pq_search_sharded(q, p["pq_codes"], p["pq_codebooks"],
                                   mesh, k=6, precise=True, rotation=rot)
        np.testing.assert_array_equal(np.asarray(i8), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d8), np.asarray(d1),
                                   rtol=1e-5, atol=1e-5)

    def test_k_exceeds_shard(self, rng):
        """k > rows-per-device: the merge must still return k global-best."""
        from openibl_tpu.ops.pq import pq_search, pq_search_sharded

        q, p = self._index(rng, n=32)  # 4 rows/device < k=10
        mesh = get_mesh()
        d1, i1 = pq_search(q, p["pq_codes"], p["pq_codebooks"], k=10,
                           precise=True)
        d8, i8 = pq_search_sharded(q, p["pq_codes"], p["pq_codebooks"],
                                   mesh, k=10, precise=True)
        np.testing.assert_array_equal(np.asarray(i8), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(d8), np.asarray(d1),
                                   rtol=1e-5, atol=1e-5)
