"""Engine tests: evaluator recall math, trainers, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openibl_tpu import models
from openibl_tpu.models.netvlad import NetVLAD
from openibl_tpu.engine.evaluator import (
    Evaluator,
    evaluate_descriptors,
    recalls_from_ranks,
    spatial_nms,
)
from openibl_tpu.engine.trainer import Trainer, steplr
from openibl_tpu.engine.sfrs import SFRSTrainer
from openibl_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


class TestRecall:
    def test_recalls_from_ranks(self):
        # q0: gt at rank 0 → counts for k=1,5; q1: gt at rank 3 → counts k=5 only
        ranks = np.array([[0, 1, 2, 3, 4], [0, 1, 2, 3, 4]])
        gt = [[0], [3]]
        r = recalls_from_ranks(ranks, gt, topk=(1, 5))
        np.testing.assert_allclose(r, [0.5, 1.0])

    def test_spatial_nms(self):
        pred = [5, 3, 7, 1, 9]
        db_ids = {5: "a", 3: "a", 7: "b", 1: "b", 9: "c"}
        assert spatial_nms(pred, db_ids, 5) == [5, 7, 9]

    def test_nms_recall(self):
        # without NMS gt is beyond top-1; with NMS duplicates collapse
        ranks = np.array([[0, 1, 2, 3]])
        gallery_pids = [7, 7, 8, 9]
        gt = [[2]]
        r_plain = recalls_from_ranks(ranks, gt, gallery_pids, topk=(2,), nms=False)
        r_nms = recalls_from_ranks(ranks, gt, gallery_pids, topk=(2,), nms=True)
        assert r_plain[0] == 0.0 and r_nms[0] == 1.0

    def test_evaluate_descriptors_planted(self, rng):
        g = rng.randn(50, 16).astype(np.float32)
        q = g[:10] + 0.01 * rng.randn(10, 16).astype(np.float32)
        gt = [[i] for i in range(10)]
        r = evaluate_descriptors(q, g, gt, topk=(1, 5), print_results=False)
        np.testing.assert_allclose(r, [1.0, 1.0])

    def test_evaluate_with_rerank(self, rng):
        g = np.concatenate(
            [rng.randn(1, 8) * 0.1 + c for c in (0, 5, 10) for _ in range(6)]
        ).astype(np.float32)
        q = g[::6] + 0.05
        gt = [list(range(i * 6, i * 6 + 6)) for i in range(3)]
        r = evaluate_descriptors(q, g, gt, topk=(1,), rerank=True,
                                 rr_topk=5, print_results=False)
        assert r[0] == 1.0


def _tiny_embednet():
    model = models.create("embednet", net_vlad=NetVLAD(num_clusters=4, dim=512))
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestTrainer:
    def test_loss_decreases_toy_model(self, rng):
        """Descent mechanics on a model with well-separated descriptors (a
        random-init VGG maps everything to near-identical descriptors, which
        sits on the normalization curvature singularity — not a meaningful
        descent test)."""

        class ToyModel:
            def apply(self, params, x):
                flat = x.reshape(x.shape[0], -1)
                desc = jnp.dot(flat, params["w"])
                from openibl_tpu.utils import l2_normalize

                return None, l2_normalize(desc, axis=-1)

        params = {"w": jnp.asarray(rng.randn(48, 16).astype(np.float32) * 0.3)}
        trainer = Trainer(ToyModel(), loss_type="sare_ind", lr=0.1,
                          momentum=0.0, weight_decay=0.0)
        opt_state = trainer.init(params)
        imgs = rng.randn(2, 4, 4, 4, 3).astype(np.float32)
        imgs[:, 1] = imgs[:, 0] + 0.1 * rng.randn(2, 4, 4, 3)
        imgs = jnp.asarray(imgs)
        losses = []
        for _ in range(10):
            params, opt_state, loss = trainer._step(params, opt_state, imgs)
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 1e-3

    def test_frozen_layers_unchanged(self, rng):
        model, params = _tiny_embednet()
        trainer = Trainer(model, loss_type="sare_ind", lr=1e-2)
        opt_state = trainer.init(params)
        imgs = jnp.asarray(rng.randn(1, 4, 32, 32, 3).astype(np.float32) * 30)
        frozen_before = np.asarray(params["base"]["conv1_1"]["w"]).copy()
        train_before = np.asarray(params["base"]["conv5_3"]["w"]).copy()
        params, opt_state, _ = trainer._step(params, opt_state, imgs)
        np.testing.assert_array_equal(
            np.asarray(params["base"]["conv1_1"]["w"]), frozen_before
        )
        assert not np.array_equal(
            np.asarray(params["base"]["conv5_3"]["w"]), train_before
        )

    def test_steplr_schedule(self):
        assert steplr(1e-3, 0, 5) == 1e-3
        assert steplr(1e-3, 5, 5) == 5e-4
        assert steplr(1e-3, 10, 5) == 2.5e-4

    def test_set_epoch_lr_applies(self):
        model, params = _tiny_embednet()
        trainer = Trainer(model, lr=1e-3)
        opt_state = trainer.init(params)
        opt_state = trainer.set_epoch_lr(opt_state, epoch=5, step_size=5)

        def find_lr(state):
            if hasattr(state, "hyperparams"):
                return float(state.hyperparams["learning_rate"])
            children = []
            if isinstance(state, dict):
                children = list(state.values())
            elif isinstance(state, tuple):
                children = list(state)
            for attr in ("inner_state", "inner_states"):
                inner = getattr(state, attr, None)
                if inner is not None:
                    children.append(inner)
            for s in children:
                out = find_lr(s)
                if out is not None:
                    return out
            return None

        assert abs(find_lr(opt_state) - 5e-4) < 1e-9


class TestSFRS:
    def test_step_runs_and_teacher_fixed(self, rng):
        model = models.create(
            "embedregionnet", net_vlad=NetVLAD(num_clusters=4, dim=512),
            tuple_size=1,
        )
        params = model.init(jax.random.PRNGKey(0))
        teacher = jax.tree.map(lambda x: x + 0.0, params)
        trainer = SFRSTrainer(model, neg_num=2, lr=1e-2,
                              temps=(0.07, 0.07, 0.06, 0.05))
        opt_state = trainer.init_generation(params)
        # tuple: anchor + pos + 2 negs + 2 diff positives = 6 images
        imgs = jnp.asarray(rng.randn(1, 6, 32, 32, 3).astype(np.float32) * 20)
        easy, diff = trainer.split_tuple_images(imgs)
        assert easy.shape[1] == 4 and diff.shape[1] == 3
        teacher_before = np.asarray(teacher["vlad"]["centroids"]).copy()
        for gen in (0, 1):
            step = trainer.step_fn(gen)
            p2, opt_state, lh, ls = step(params, teacher, opt_state, easy, diff)
            assert np.isfinite(float(lh)) and np.isfinite(float(ls))
            params = p2
        np.testing.assert_array_equal(
            np.asarray(teacher["vlad"]["centroids"]), teacher_before
        )

    def test_gen0_soft_loss_unweighted(self, rng):
        model = models.create(
            "embedregionnet", net_vlad=NetVLAD(num_clusters=4, dim=512),
            tuple_size=1,
        )
        trainer = SFRSTrainer(model, neg_num=2)
        # gen0 uses lambda_soft = 0 (reference netvlad_img_sfrs.py:212)
        assert trainer.step_fn(0) is trainer._steps[(0, 0.0)]
        assert trainer.step_fn(1) is trainer._steps[(1, 0.5)]


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model, params = _tiny_embednet()
        meta = {"epoch": 3, "best_recall5": 0.91}
        path = save_checkpoint(str(tmp_path / "ckpt.npz"),
                               {"params": params, "opt_state": {"t": np.ones(3)}},
                               meta, is_best=True)
        blank = model.init(jax.random.PRNGKey(1))
        restored, meta2 = load_checkpoint(path, {"params": blank})
        assert meta2 == meta
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["vlad"]["centroids"]),
            np.asarray(params["vlad"]["centroids"]),
        )
        assert (tmp_path / "model_best.npz").exists()

    def test_partial_and_mismatch_tolerant(self, tmp_path):
        model, params = _tiny_embednet()
        path = save_checkpoint(str(tmp_path / "c.npz"), {"params": params})
        # partial load: params only, plus an extra key absent from the archive
        target = {"params": model.init(jax.random.PRNGKey(2)),
                  "extra": np.zeros(2)}
        restored, _ = load_checkpoint(path, target)
        np.testing.assert_array_equal(np.asarray(restored["extra"]), np.zeros(2))
        # shape mismatch keeps the target leaf
        bad = {"params": jax.tree.map(lambda x: np.zeros((1,)), params)}
        restored2, _ = load_checkpoint(path, bad)
        assert np.asarray(restored2["params"]["vlad"]["centroids"]).shape == (1,)


class TestRemat:
    def test_remat_step_matches(self, rng):
        """jax.checkpoint must not change the computed update."""
        model, params = _tiny_embednet()
        imgs = jnp.asarray(rng.randn(1, 4, 32, 32, 3).astype(np.float32) * 30)
        outs = []
        for remat in (False, True):
            p = jax.tree.map(jnp.array, params)
            tr = Trainer(model, loss_type="sare_ind", lr=1e-2, remat=remat)
            opt = tr.init(p)
            p2, _, loss = tr._step(p, opt, imgs)
            outs.append((float(loss), np.asarray(p2["vlad"]["centroids"])))
        assert abs(outs[0][0] - outs[1][0]) < 1e-6
        np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-7)


class TestWatchdog:
    def test_warns_on_slow_phase(self, capsys):
        import time

        from openibl_tpu.utils.watchdog import Watchdog

        wd = Watchdog(warn_after=0.05)
        with wd.watch("slow"):
            time.sleep(0.18)
        out = capsys.readouterr().out
        assert "watchdog" in out and "slow" in out

    def test_silent_on_fast_phase(self, capsys):
        from openibl_tpu.utils.watchdog import Watchdog

        wd = Watchdog(warn_after=1.0)
        with wd.watch("fast"):
            pass
        assert "watchdog" not in capsys.readouterr().out


class TestProfiling:
    def test_phase_timer_summary(self):
        import time

        from openibl_tpu.utils.profiling import PhaseTimer

        t = PhaseTimer()
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        s = t.summary()
        assert "a" in s and "x2" in s

    def test_device_memory_stats_no_crash(self):
        from openibl_tpu.utils.profiling import device_memory_stats

        stats = device_memory_stats()
        assert len(stats) >= 1


class TestSubsetSplits:
    def test_small_cache_clamped_to_full_query_set(self):
        """cache_size < tuple_size must clamp to the full query set
        (reference netvlad_img.py:170-171) — otherwise every subset mines
        fewer tuples than one batch and the drop-last loaders silently run
        ZERO optimizer steps all training long."""
        from openibl_tpu.engine.pipeline import _subset_splits

        splits = _subset_splits(20, 2, 0, 5, 0, tuple_size=4)
        assert len(splits) == 1 and len(splits[0]) == 20
        # oversized cache also clamps (reference same line)
        splits = _subset_splits(20, 50, 0, 5, 0, tuple_size=4)
        assert len(splits) == 1 and len(splits[0]) == 20
        # a healthy cache is untouched
        splits = _subset_splits(20, 10, 0, 5, 0, tuple_size=4)
        assert [len(s) for s in splits] == [10, 10]
