"""Regression tests for the round-1 code-review findings."""

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from openibl_tpu import models
from openibl_tpu.models.netvlad import NetVLAD


class TestMiningAlignment:
    def test_subset_splits_sorted(self):
        """Subsets must be sorted: extract_features returns features in
        ascending dataset order and the sampler zips rows positionally."""
        from openibl_tpu.engine.pipeline import _subset_splits

        subsets = _subset_splits(50, cache_size=7, epoch=0, step_size=5, seed=3)
        assert sum(len(s) for s in subsets) == 50
        for s in subsets:
            assert np.all(np.diff(s) > 0), "subset not sorted"

    def test_extract_returns_ascending_order(self, rng):
        from openibl_tpu.parallel.extract import extract_features
        from tests.test_sharding import FakeLoader

        model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
        params = model.init(jax.random.PRNGKey(0))
        images = rng.randn(6, 16, 16, 3).astype(np.float32) * 20

        class ShuffledLoader(FakeLoader):
            def __iter__(self):
                order = [4, 1, 5, 0, 3, 2]
                for s in range(0, 6, 2):
                    idx = np.asarray(order[s : s + 2])
                    yield self.images[idx], idx, 2

        feats = extract_features(model.apply, params, ShuffledLoader(images, 2))
        ref = extract_features(model.apply, params, FakeLoader(images, 2))
        np.testing.assert_allclose(feats, ref, rtol=1e-5)


class TestHubNpzLoading:
    def test_hub_loads_pipeline_checkpoint(self, tmp_path):
        """Pipeline checkpoints nest under 'params'; hub must unwrap them,
        not silently return random init."""
        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.utils.checkpoint import save_checkpoint

        model = models.create("embednetpca", net_vlad=NetVLAD(num_clusters=4),
                              pca_dim=16)
        params = model.init(jax.random.PRNGKey(7))
        path = save_checkpoint(
            str(tmp_path / "ckpt.npz"),
            {"params": params, "opt_state": {"t": np.zeros(2)}},
        )
        _, loaded = vgg16_netvlad(path, num_clusters=4, pca_dim=16)
        np.testing.assert_array_equal(
            np.asarray(loaded["vlad"]["centroids"]),
            np.asarray(params["vlad"]["centroids"]),
        )

    def test_hub_loads_bare_tree(self, tmp_path):
        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.utils.checkpoint import save_checkpoint

        model = models.create("embednetpca", net_vlad=NetVLAD(num_clusters=4),
                              pca_dim=16)
        params = model.init(jax.random.PRNGKey(7))
        path = save_checkpoint(str(tmp_path / "bare.npz"), params)
        _, loaded = vgg16_netvlad(path, num_clusters=4, pca_dim=16)
        np.testing.assert_array_equal(
            np.asarray(loaded["vlad"]["centroids"]),
            np.asarray(params["vlad"]["centroids"]),
        )


class TestPrefetchErrors:
    def test_producer_exception_propagates(self, tmp_path):
        from openibl_tpu.data.loader import ImageSource, BatchLoader

        items = [(str(tmp_path / "missing.png"), 0, 0.0, 0.0)]
        loader = BatchLoader(ImageSource(items), batch_size=1)
        with pytest.raises(FileNotFoundError):
            list(loader)


class TestInsufficientNegatives:
    def test_sampler_raises(self, rng):
        from openibl_tpu.data.sampler import TupleSampler

        # gallery of 3, all inside the exclusion zone of anchor 0
        s = TupleSampler(
            n_query=1, n_gallery=3,
            pos_list=[[0]], neg_list=[[0, 1, 2]],
            neg_num=2, neg_pool=5, seed=0,
        )
        qf = rng.randn(1, 8).astype(np.float32)
        gf = rng.randn(3, 8).astype(np.float32)
        with pytest.raises(ValueError, match="negative candidates"):
            s.refresh(qf, gf, np.array([0]))


class TestPoolLossRaw:
    def test_pool_path_uses_raw_features(self, rng):
        """Reference trains on un-normalized pool output (trainers.py:70-80)."""
        from openibl_tpu.engine.trainer import Trainer
        from openibl_tpu.ops.losses import tuple_loss

        model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
        params = model.init(jax.random.PRNGKey(0))
        trainer = Trainer(model, loss_type="sare_ind", use_pool_feature=True)
        imgs = jnp.asarray(rng.randn(1, 4, 32, 32, 3).astype(np.float32) * 30)
        got = float(trainer._loss_fn(params, imgs))
        pool, _ = model.apply(params, imgs.reshape(4, 32, 32, 3))
        expect = float(tuple_loss(pool.reshape(1, 4, -1), "sare_ind"))
        assert abs(got - expect) < 1e-6


class TestPaddedLoaderHeaderProbe:
    def test_no_upfront_decode_with_predictable_transform(self, tmp_path, rng):
        from openibl_tpu.data.loader import ImageSource, PaddedBatchLoader
        from openibl_tpu.data.transforms import TestTransform

        items = []
        for i, (h, w) in enumerate([(40, 60), (60, 40), (40, 60)]):
            f = tmp_path / f"t{i}.png"
            Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(f)
            items.append((str(f), i, 0.0, 0.0))
        src = ImageSource(items, transform=TestTransform(32, 48, tokyo=True))
        loader = PaddedBatchLoader(src, batch_size=2)
        loader._ensure_buckets()
        assert loader._cache == {}, "header probe should avoid decoding"
        assert len(loader._buckets) == 2  # two aspect buckets
        total = sum(count for *_, count in loader)
        assert total == 3


class TestRound4ReviewRegressions:
    """Round-4 review findings: silent random PCA in hub loads, serving index
    validation, and the evaluator's opaque NMS crash."""

    def test_hub_rejects_pca_less_checkpoint(self, tmp_path):
        """A trainer checkpoint carries only base+vlad leaves; loading it into
        the embednetpca template must raise, not silently keep the RANDOM
        pca projection (which whitens every descriptor with noise)."""
        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.utils.checkpoint import save_checkpoint

        emodel = models.create("embednet", net_vlad=NetVLAD(num_clusters=4))
        params = emodel.init(jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "ckpt.npz"), {"params": params})
        with pytest.raises(ValueError, match="PCA"):
            vgg16_netvlad(path, num_clusters=4, pca_dim=16)

    def test_hub_discovers_sibling_pca_h5(self, tmp_path, rng):
        """The reference convention pca_params_<stem>.h5 next to the
        checkpoint (test.py:109) is picked up automatically and fills the
        pca leaves with the trained projection."""
        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.ops.pca import pca_train, pca_projection, save_pca
        from openibl_tpu.utils.checkpoint import save_checkpoint

        emodel = models.create("embednet", net_vlad=NetVLAD(num_clusters=4))
        params = emodel.init(jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "model_best.npz"),
                               {"params": params})
        x = rng.randn(40, 2048).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        pca = pca_train(x, n_components=16)
        save_pca(pca, str(tmp_path / "pca_params_model_best.h5"))

        _, loaded = vgg16_netvlad(path, num_clusters=4, pca_dim=16)
        proj, bias = pca_projection(pca, n_components=16, whiten=True)
        np.testing.assert_allclose(np.asarray(loaded["pca"]["w"]),
                                   np.asarray(proj), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded["pca"]["b"]),
                                   np.asarray(bias), rtol=1e-6)

    def test_serving_rejects_paths_length_mismatch(self, rng):
        """A truncated 'paths' array must fail at load, not as per-request
        IndexErrors at query time."""
        from openibl_tpu.serving import RetrievalService

        idx = {
            "descriptors": rng.randn(8, 16).astype(np.float32),
            "paths": np.asarray([f"img{i}" for i in range(6)]),
        }
        with pytest.raises(ValueError, match="paths"):
            RetrievalService(idx)

    def test_nms_requires_gallery_pids(self, rng):
        """nms=True without gallery_pids raises a clear error BEFORE the
        device kNN, not an opaque TypeError inside spatial_nms after it."""
        from openibl_tpu.engine.evaluator import (
            evaluate_descriptors, recalls_from_ranks,
        )

        with pytest.raises(ValueError, match="gallery_pids"):
            recalls_from_ranks(np.zeros((2, 3), int), [[0], [1]], nms=True)
        q = rng.randn(2, 8).astype(np.float32)
        g = rng.randn(5, 8).astype(np.float32)
        with pytest.raises(ValueError, match="gallery_pids"):
            evaluate_descriptors(q, g, [[0], [1]], nms=True,
                                 print_results=False)

    def test_hub_rejects_architecture_mismatch(self, tmp_path):
        """A checkpoint whose base/vlad leaves don't fill the template (wrong
        num_clusters here) must raise, not silently serve random init."""
        from openibl_tpu.hub import vgg16_netvlad
        from openibl_tpu.utils.checkpoint import save_checkpoint

        emodel = models.create("embednet", net_vlad=NetVLAD(num_clusters=8))
        params = emodel.init(jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "ckpt8.npz"), {"params": params})
        with pytest.raises(ValueError, match="architecture|leaves"):
            vgg16_netvlad(path, num_clusters=4, pca_dim=16)

    def test_radius_neighbors_utm_scale_exact(self, rng):
        """At raw UTM magnitudes (~5.8e5, 4.4e6) the x²+y²−2xy form loses
        ~1e-2 of d² to cancellation; membership at the exact 10 m boundary
        must match the direct (q−g)² computation (the reference's sklearn
        NearestNeighbors is exact)."""
        from openibl_tpu.data.dataset import radius_neighbors

        base = np.array([583730.0, 4477400.0])
        g = base + rng.randn(500, 2) * 30
        # plant points EXACTLY on and just inside/outside the radius
        q = base + np.array([[3.0, 4.0]])
        g = np.concatenate([g, q + [[6.0, 8.0]],        # exactly 10.0 m
                            q + [[6.0, 7.999999]],      # just inside
                            q + [[6.0, 8.000001]]])     # just outside
        got = radius_neighbors(q, g, 10.0)[0]
        d2 = ((g - q) ** 2).sum(1)
        expect = np.nonzero(d2 <= 100.0 + 1e-6)[0].tolist()
        assert got == expect

    def test_rerank_tiny_union_native_parity(self, rng):
        """Unions smaller than k1+1 must work (and agree) whether or not the
        native kernel is built — they route to the clamped numpy path."""
        from openibl_tpu.ops import rerank as rr

        q = rng.randn(4, 8).astype(np.float32)
        g = rng.randn(9, 8).astype(np.float32)  # union 13 < k1+1 = 21
        u = np.concatenate([q, g])
        d2 = ((u[:, None] - u[None]) ** 2).sum(-1).astype(np.float32)
        out = rr.re_ranking(d2[:4, 4:], d2[:4, :4], d2[4:, 4:], k1=20, k2=6)
        assert out.shape == (4, 9) and np.isfinite(out).all()
        rows, cols, vals, rank, rm2 = rr.build_v_sparse(u, k1=20)
        assert len(rows) and np.isfinite(vals).all()

    def test_set_learning_rate_is_functional(self):
        """A snapshot taken before the LR change must keep the old rate —
        the hyperparams dict must not be shared with the returned state."""
        from openibl_tpu.engine.trainer import make_optimizer, set_learning_rate

        tx = make_optimizer(1e-3)
        state = tx.init({"w": np.zeros(3, np.float32)})

        def get_lr(s):
            if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
                return float(s.hyperparams["learning_rate"])
            children = (s.values() if isinstance(s, dict)
                        else s if isinstance(s, tuple) else [])
            for c in children:
                lr = get_lr(c)
                if lr is not None:
                    return lr
            return None

        new = set_learning_rate(state, 5e-4)
        assert abs(get_lr(new) - 5e-4) < 1e-9
        assert abs(get_lr(state) - 1e-3) < 1e-9, "snapshot mutated in place"

    def test_set_learning_rate_updates_every_injected_lr(self):
        """A chain carrying SEVERAL injected LRs (e.g. per-group
        inject_hyperparams) must have them ALL updated — a short-circuiting
        traversal silently leaves siblings on the stale rate."""
        import optax

        from openibl_tpu.engine.trainer import set_learning_rate

        tx = optax.chain(
            optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3),
            optax.inject_hyperparams(optax.scale_by_learning_rate)(
                learning_rate=1e-2),
        )
        state = tx.init({"w": np.zeros(3, np.float32)})

        def collect(s, out):
            if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
                out.append(float(s.hyperparams["learning_rate"]))
            children = (s.values() if isinstance(s, dict)
                        else s if isinstance(s, tuple) else [])
            for c in children:
                collect(c, out)
            return out

        np.testing.assert_allclose(collect(state, []), [1e-3, 1e-2],
                                   rtol=1e-6)
        new = set_learning_rate(state, 5e-4)
        np.testing.assert_allclose(
            collect(new, []), [5e-4, 5e-4], rtol=1e-6,
            err_msg="every injected learning_rate must be rewritten",
        )

    def test_color_jitter_all_zero_is_identity(self, rng):
        """Zero-range ops are skipped at trace time; all four disabled is an
        exact float32 identity (torchvision's skip semantics)."""
        from openibl_tpu.ops.augment import color_jitter_batch

        x = rng.rand(2, 8, 6, 3).astype(np.float32) * 255
        out = np.asarray(color_jitter_batch(
            x, jax.random.PRNGKey(0),
            brightness=0, contrast=0, saturation=0, hue=0,
        ))
        np.testing.assert_array_equal(out, x)

    def test_netvlad_fused_vmem_fallback(self, rng):
        """Over-budget shapes route to the XLA head instead of an opaque
        Mosaic compile error (interpret=False off-TPU would otherwise fail
        to lower — reaching the XLA result proves the guard fired)."""
        from openibl_tpu.models.netvlad import netvlad_apply, vlad_postprocess
        from openibl_tpu.ops.netvlad_kernel import (
            _fused_vmem_bytes, _VMEM_BUDGET_BYTES, netvlad_fused,
        )

        h = w = 56  # P=3136, C=512, K=64 -> over the 12 MB budget
        assert _fused_vmem_bytes(h * w, 512, 64) > _VMEM_BUDGET_BYTES
        fmap = rng.randn(1, h, w, 512).astype(np.float32)
        aw = rng.randn(512, 64).astype(np.float32) * 0.1
        cen = rng.randn(64, 512).astype(np.float32)
        out = netvlad_fused(fmap, aw, cen, postprocess=True, interpret=False)
        expect = vlad_postprocess(netvlad_apply(
            {"assign_w": aw, "centroids": cen}, fmap,
        )).reshape(1, 64, 512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-6, atol=1e-6)
