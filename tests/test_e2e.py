"""Hermetic end-to-end pipeline tests on the synthetic dataset (CPU, tiny
shapes): full baseline training loop and one SFRS generation step, exercising
mining → training → eval → PCA → checkpointing as one flow."""

import os.path as osp

import jax
import numpy as np
import pytest

from openibl_tpu.config import TrainConfig, SFRSConfig, DataConfig
from openibl_tpu.engine import pipeline


def _cfg(tmp_path, cls=TrainConfig, **kw):
    defaults = dict(
        data=DataConfig(
            dataset="synthetic", scale=None,
            data_dir=str(tmp_path / "data"),
            height=32, width=48, test_batch_size=8,
        ),
        num_clusters=8,
        loss_type="sare_ind",
        tuple_size=1,
        neg_num=2,
        neg_pool=5,
        cache_size=4,
        epochs=1,
        eval_step=1,
        pca_dim=16,
        logs_dir=str(tmp_path / "logs"),
        init_dir=str(tmp_path / "logs"),
        print_freq=100,
        seed=0,
    )
    defaults.update(kw)
    return cls(**defaults)


class TestBaselineE2E:
    def test_full_training_loop(self, tmp_path, monkeypatch):
        cfg = _cfg(tmp_path, epochs=2)

        # spy per-subset average losses: the learning gate below needs the
        # training trajectory, not just the final recalls
        losses = []
        orig_step = pipeline.Trainer.train_epoch

        def spy(self, params, opt_state, loader, **kw):
            params, opt_state, avg = orig_step(self, params, opt_state,
                                               loader, **kw)
            losses.append(float(avg))
            return params, opt_state, avg

        monkeypatch.setattr(pipeline.Trainer, "train_epoch", spy)

        # deterministic untrained params (same seed/centroid bootstrap) for
        # the did-training-move-anything check
        dataset = pipeline.load_dataset(cfg)
        _, init_params = pipeline.build_model(cfg, dataset)

        params, recalls, history = pipeline.run_baseline_training(
            cfg, verbose=False
        )
        assert len(recalls) == 3
        assert recalls[2] >= recalls[1] >= recalls[0]
        assert history, "no eval ran"

        # -- learning gate (a random model passes monotone-recall alone) --
        # 1. the optimizer actually moved the trainable parameters
        deltas = [
            float(np.max(np.abs(np.asarray(a, np.float32)
                                - np.asarray(b, np.float32))))
            for a, b in zip(
                jax.tree_util.tree_leaves(params),
                jax.tree_util.tree_leaves(init_params),
            )
        ]
        assert max(deltas) > 1e-6, "training never changed any parameter"
        # 2. the loss trajectory improves: last epoch beats the first (a
        #    zeroed-grad / never-applied-LR / garbage-mining regression
        #    leaves the loss flat or random)
        assert len(losses) >= 4, losses
        half = len(losses) // 2
        assert np.mean(losses[half:]) < np.mean(losses[:half]), losses
        # 3. retrieval quality is high in absolute terms AND not worse than
        #    an untrained model of the same architecture
        assert recalls[0] >= 0.75, recalls
        from openibl_tpu.config import EvalConfig

        untrained = pipeline.run_eval(
            EvalConfig(data=cfg.data, checkpoint="", reduction=False,
                       num_clusters=8),
            verbose=False,
        )
        assert recalls[0] >= untrained[0] - 1e-9, (recalls, untrained)

        # checkpoints written, best tracked
        assert osp.isfile(osp.join(cfg.logs_dir, "model_best.npz"))
        assert osp.isfile(osp.join(cfg.logs_dir, "checkpoint0.npz"))
        assert osp.isfile(osp.join(cfg.logs_dir, "pca_params_model_best.h5"))

    def test_resume(self, tmp_path):
        cfg = _cfg(tmp_path)
        pipeline.run_baseline_training(cfg, verbose=False)
        cfg2 = _cfg(tmp_path, epochs=2, resume=str(
            osp.join(cfg.logs_dir, "checkpoint0.npz")
        ))
        params, recalls, history = pipeline.run_baseline_training(
            cfg2, verbose=False
        )
        # resumed from epoch 1: only epoch 1 runs
        assert [e for e, _ in history] == [1]


class TestSFRSE2E:
    def test_two_generations(self, tmp_path):
        cfg = _cfg(
            tmp_path, cls=SFRSConfig,
            data=DataConfig(
                dataset="synthetic", scale=None,
                data_dir=str(tmp_path / "data"),
                height=64, width=64, test_batch_size=8,
            ),
            generations=2, epochs=1, pos_num=2, pos_pool=3,
            temperature=(0.07, 0.05),
        )
        params, recalls = pipeline.run_sfrs_training(cfg, verbose=False)
        assert len(recalls) == 3
        # learning gate: generational distillation must land a model that
        # actually retrieves on the separable synthetic places
        assert recalls[0] >= 0.75, recalls
        assert osp.isfile(osp.join(cfg.logs_dir, "checkpoint1_0.npz"))

    def test_generation_with_device_jitter(self, tmp_path):
        """SFRS pipeline with on-chip augmentation (gen0 path is enough to
        exercise the raw-uint8 union-tuple step + key folding)."""
        cfg = _cfg(
            tmp_path, cls=SFRSConfig,
            data=DataConfig(
                dataset="synthetic", scale=None,
                data_dir=str(tmp_path / "data"),
                height=64, width=64, test_batch_size=8,
            ),
            generations=1, epochs=1, pos_num=2, pos_pool=3,
            temperature=(0.07,), device_jitter=True,
        )
        params, recalls = pipeline.run_sfrs_training(cfg, verbose=False)
        assert len(recalls) == 3


class TestEvalEntry:
    def test_run_eval_on_checkpoint(self, tmp_path):
        from openibl_tpu.config import EvalConfig

        cfg = _cfg(tmp_path)
        pipeline.run_baseline_training(cfg, verbose=False)
        ecfg = EvalConfig(
            data=cfg.data,
            checkpoint=osp.join(cfg.logs_dir, "model_best.npz"),
            reduction=False,
            num_clusters=8,
        )
        recalls = pipeline.run_eval(ecfg, verbose=False)
        assert len(recalls) == 3


class TestEvalDtypeConsistency:
    def test_run_eval_bf16_model(self, tmp_path):
        """compute_dtype plumbs through run_eval's rebuilt model (a
        bf16-trained checkpoint must evaluate in bf16, not silently f32)."""
        from openibl_tpu.config import EvalConfig

        cfg = _cfg(tmp_path)
        pipeline.load_dataset(cfg)  # force synthetic arrange
        ecfg = EvalConfig(
            data=cfg.data, checkpoint="", reduction=False, num_clusters=8,
            compute_dtype="bfloat16",
        )
        recalls = pipeline.run_eval(ecfg, verbose=False)
        assert len(recalls) == 3
        assert np.all(recalls >= 0) and np.all(recalls <= 1)


class TestReferenceFlagKnobs:
    def test_iters_caps_subset_iterations(self, tmp_path, monkeypatch):
        """cfg.iters > 0 truncates each subset's tuple stream (the reference's
        --iters loader-length override, netvlad_img.py:139,281)."""
        seen = []
        real_loader = pipeline.TupleLoader

        def spy(source, tuples, tuple_size=1, **kw):
            seen.append(len(tuples))
            return real_loader(source, tuples, tuple_size, **kw)

        monkeypatch.setattr(pipeline, "TupleLoader", spy)
        # subsets mine at most cache_size (4) tuples; iters=6 must CYCLE the
        # short list to exactly 6 (IterLoader restart semantics), not truncate
        cfg = _cfg(tmp_path, iters=6, whiten=False)
        params, recalls, history = pipeline.run_baseline_training(
            cfg, verbose=False
        )
        assert seen and all(n == 6 for n in seen), seen
        assert len(recalls) == 3  # nowhiten PCA still evaluates

    def test_device_jitter_training(self, tmp_path):
        """Full baseline loop with on-chip augmentation: the tuple loader
        feeds raw resized uint8 and the step jitters on device."""
        cfg = _cfg(tmp_path, device_jitter=True)
        params, recalls, history = pipeline.run_baseline_training(
            cfg, verbose=False
        )
        assert len(recalls) == 3
        assert history, "no eval ran"

    def test_eval_pool_feature(self, tmp_path):
        """--no-vlad evaluation retrieves on the 512-d max-pool feature
        (reference test.py vlad=False plumbing)."""
        from openibl_tpu.config import EvalConfig

        cfg = _cfg(tmp_path)
        pipeline.run_baseline_training(cfg, verbose=False)
        ecfg = EvalConfig(
            data=cfg.data,
            checkpoint=osp.join(cfg.logs_dir, "model_best.npz"),
            reduction=False,
            use_vlad=False,
            num_clusters=8,
        )
        recalls = pipeline.run_eval(ecfg, verbose=False)
        assert len(recalls) == 3


class TestEvalPCAOnDemand:
    def test_run_eval_computes_pca_when_missing(self, tmp_path):
        """--reduction with no PCA params file must train PCA from the source
        dataset's train split (reference test.py:108-121 behavior)."""
        from openibl_tpu.config import EvalConfig

        cfg = _cfg(tmp_path)
        pipeline.run_baseline_training(cfg, verbose=False)
        ecfg = EvalConfig(
            data=cfg.data,
            checkpoint=osp.join(cfg.logs_dir, "model_best.npz"),
            reduction=True,
            pca_dim=16,
            num_clusters=8,
        )
        recalls = pipeline.run_eval(ecfg, verbose=False)
        assert len(recalls) == 3
        # default params path follows the reference convention:
        # pca_params_<checkpoint stem>.h5 next to the checkpoint (test.py:109)
        assert osp.isfile(osp.join(cfg.logs_dir, "pca_params_model_best.h5"))
        # second run reuses the file
        recalls2 = pipeline.run_eval(ecfg, verbose=False)
        np.testing.assert_allclose(recalls, recalls2)


class TestSFRSResume:
    def test_resume_mid_generation(self, tmp_path):
        cfg = _cfg(
            tmp_path, cls=SFRSConfig,
            data=DataConfig(
                dataset="synthetic", scale=None,
                data_dir=str(tmp_path / "data"),
                height=64, width=64, test_batch_size=8,
            ),
            generations=2, epochs=1, pos_num=2, pos_pool=3,
            temperature=(0.07, 0.05),
        )
        pipeline.run_sfrs_training(cfg, verbose=False)
        ckpt = osp.join(cfg.logs_dir, "checkpoint0_0.npz")
        assert osp.isfile(ckpt)
        # resume from end of gen 0 with generations=2: runs gen 1 only
        cfg2 = _cfg(
            tmp_path, cls=SFRSConfig,
            data=cfg.data, generations=2, epochs=1, pos_num=2, pos_pool=3,
            temperature=(0.07, 0.05), resume=ckpt,
        )
        params, recalls = pipeline.run_sfrs_training(cfg2, verbose=False)
        assert len(recalls) == 3

    def test_resume_equals_uninterrupted(self, tmp_path):
        """Property (VERDICT r1 item 10): resuming from a generation-boundary
        checkpoint reproduces the uninterrupted run's final params exactly —
        the checkpoint must capture ALL training state (params, teacher,
        optimizer, mining cache) and the sampler streams must re-derive
        deterministically from (seed, epoch)."""
        data = DataConfig(
            dataset="synthetic", scale=None,
            data_dir=str(tmp_path / "data"),
            height=64, width=64, test_batch_size=8,
        )
        mk = lambda name, **kw: _cfg(
            tmp_path, cls=SFRSConfig, data=data, generations=2, epochs=1,
            pos_num=2, pos_pool=3, temperature=(0.07, 0.05),
            logs_dir=str(tmp_path / name), **kw,
        )
        pipeline.run_sfrs_training(mk("full"), verbose=False)
        ckpt = osp.join(str(tmp_path / "full"), "checkpoint0_0.npz")
        pipeline.run_sfrs_training(mk("resumed", resume=ckpt), verbose=False)
        # compare the end-of-gen-1 training state (the returned params go
        # through best-model selection, which legitimately differs when all
        # recalls tie at 100% on synthetic data)
        full = np.load(osp.join(str(tmp_path / "full"), "checkpoint1_0.npz"))
        res = np.load(osp.join(str(tmp_path / "resumed"), "checkpoint1_0.npz"))
        keys = [k for k in full.files if k.startswith("leaf:params/")]
        assert keys and sorted(keys) == sorted(
            k for k in res.files if k.startswith("leaf:params/")
        )
        for k in keys:
            np.testing.assert_allclose(full[k], res[k], rtol=0, atol=1e-6,
                                       err_msg=k)

    def test_too_few_temperatures_fails_fast(self, tmp_path):
        cfg = _cfg(tmp_path, cls=SFRSConfig, generations=3, epochs=1,
                   pos_num=2, pos_pool=3, temperature=(0.07, 0.05))
        with pytest.raises(ValueError, match="temperature"):
            pipeline.run_sfrs_training(cfg, verbose=False)


class TestEvalRerankNMS:
    def test_run_eval_rerank_and_nms(self, tmp_path):
        """--rerank + NMS flags through the eval entry (random model; only
        the plumbing and index math are under test)."""
        from openibl_tpu.config import EvalConfig

        cfg = _cfg(tmp_path)
        pipeline.load_dataset(cfg)  # force synthetic arrange
        ecfg = EvalConfig(
            data=cfg.data, checkpoint="", reduction=False, num_clusters=8,
            rerank=True, rr_topk=5, nms=True,
        )
        recalls = pipeline.run_eval(ecfg, verbose=False)
        assert len(recalls) == 3
        assert np.all(recalls >= 0) and np.all(recalls <= 1)


class TestMeshTrainingE2E:
    def test_full_loop_on_8_device_mesh(self, tmp_path):
        """Whole baseline pipeline (mining + training + eval + PCA) under
        data-parallel sharding on the virtual 8-device mesh."""
        from openibl_tpu.parallel.mesh import get_mesh

        cfg = _cfg(tmp_path, tuple_size=8, neg_num=2, cache_size=16,
                   epochs=1)
        mesh = get_mesh()
        params, recalls, history = pipeline.run_baseline_training(
            cfg, mesh=mesh, verbose=False
        )
        assert len(recalls) == 3 and history


class TestDualStackPipelineOracle:
    """Full-pipeline dual-stack recall-parity oracle (VERDICT r4 item 1).

    The last untested slice of the fidelity chain: the 30-step / 2-generation
    trajectory oracles (test_reference_oracle.py) pin the inner loop, but the
    OUTER loop of the reference baseline entry — subset splitting with
    cache-size doubling (/root/reference/examples/netvlad_img.py:176-180),
    per-subset re-mining (:182-189), per-epoch val eval with strict
    best-by-recall@5 checkpoint selection (:192-207), StepLR decay (:209),
    and the final best-model PCA + test-split eval (:212-233) — was only
    self-tested. Here the ENTIRE torch reference stack (model, SGD+StepLR,
    reference sampler, evaluate_all, reference PCA) replays the identical
    tiny run on the synthetic world against our run_baseline_training, from
    a SHARED init (the matconvnet-format backbone checkpoint + the centroid
    hdf5 cache, exactly the two artifacts the reference boots from,
    netvlad_img.py:86-96), and the per-epoch val recalls, the best-checkpoint
    selection, the per-subset loss means, AND the final PCA'd test recalls
    must all agree.

    RNG sources that are implementation details, not semantics (torch
    randperm for subset order, Python random.sample for the negative pool,
    tuple stream shuffling), are made degenerate or shared: neg_pool covers
    the whole gallery (the reference's random pool then deterministically
    includes every candidate — same trick as TestSamplerOracle), both stacks
    consume the subsets of pipeline._subset_splits (whose sizes are asserted
    to follow the reference's doubling schedule), augmentation is off
    (cfg.augment=False), and the torch side trains on the same tuple stream
    our pipeline mined — while at every refresh the REFERENCE sampler also
    mines from the torch stack's own descriptors and the two mined tuple
    sets must agree up to genuine distance ties.
    """

    EPOCHS, STEP_SIZE, CACHE = 3, 2, 4
    NEG, K = 2, 8
    LR, MOM, WD, GAMMA = 1e-3, 0.9, 1e-3, 0.5

    def _torch_batch(self, src, idxs):
        import torch

        from openibl_tpu.data.transforms import PIXEL_MEAN

        arr = np.stack([np.asarray(src.load(i), np.float32)
                        for i in idxs]) - PIXEL_MEAN
        return torch.from_numpy(arr.transpose(0, 3, 1, 2).copy())

    def _torch_feats(self, model, src, batch=8):
        import torch

        # reference extract_features switches to eval (evaluators.py:38) —
        # EmbedRegionNet.forward BRANCHES on self.training (region scores vs
        # plain descriptors), so this is behavioral, not just BN/dropout
        was_training = model.training
        model.eval()
        out = []
        with torch.no_grad():
            for s in range(0, len(src), batch):
                x = self._torch_batch(src, range(s, min(s + batch, len(src))))
                out.append(model(x)[1].numpy())
        if was_training:
            model.train()
        return np.concatenate(out)

    @staticmethod
    def _sqd(a, b):
        return ((a ** 2).sum(1)[:, None] + (b ** 2).sum(1)[None]
                - 2.0 * a @ b.T)

    def _assert_tuples_tie_equal(self, ref_tuples, our_tuples, qf, gf, n_q,
                                 where):
        """Mined tuples must agree anchor-by-anchor; any differing pick must
        be a genuine distance tie (< 5e-3 sq-dist gap in the reference
        stack's own descriptor space) — the same drift-vs-tie distinction as
        the 30-step trajectory oracle."""
        ref_d = {t[0]: t for t in ref_tuples}
        our_d = {t[0]: t for t in our_tuples}
        assert set(ref_d) == set(our_d), where
        for a in ref_d:
            tr, to = ref_d[a], our_d[a]
            ids = sorted(set(tr[1:]) | set(to[1:]))
            span = dict(zip(ids, self._sqd(
                qf[a][None], gf[np.asarray(ids) - n_q])[0]))
            # positive: equal outright or a tie
            if tr[1] != to[1]:
                assert abs(span[tr[1]] - span[to[1]]) < 5e-3, (where, a, tr, to)
            for nr, no in zip(sorted(tr[2:], key=span.get),
                              sorted(to[2:], key=span.get)):
                if nr != no:
                    assert abs(span[nr] - span[no]) < 5e-3, (where, a, tr, to)

    @pytest.mark.slow
    def test_outer_loop_matches_reference(self, tmp_path, monkeypatch):
        import copy

        import h5py
        import torch

        from test_reference_oracle import TorchVGGBase, load_ref

        from openibl_tpu.data.loader import ImageSource
        from openibl_tpu.data.sampler import TupleSampler
        from openibl_tpu.data.transforms import TestTransform
        from openibl_tpu.utils.checkpoint import load_checkpoint

        ref_nv_mod = load_ref("ibl.models.netvlad")
        ref_tr_mod = load_ref("ibl.trainers")
        ref_ev_mod = load_ref("ibl.evaluators")
        ref_pca_mod = load_ref("ibl.pca")
        ref_sam_mod = load_ref("ibl.utils.data.sampler")
        monkeypatch.setattr(ref_ev_mod.dist, "get_rank", lambda: 0)
        # torch>=2 removed symeig; same shim as TestPCA
        monkeypatch.setattr(
            torch, "symeig",
            lambda a, eigenvectors=True, upper=True: torch.linalg.eigh(
                a, UPLO="U" if upper else "L"),
            raising=False,
        )
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self, raising=False)

        cfg = _cfg(
            tmp_path, epochs=self.EPOCHS, step_size=self.STEP_SIZE,
            cache_size=self.CACHE, neg_num=self.NEG, neg_pool=1000,
            num_clusters=self.K, augment=False, loss_type="sare_ind",
            lr=self.LR, gamma=self.GAMMA,
        )

        # shared init artifact 1: the backbone checkpoint our build_model
        # converts (pipeline.py matconvnet path = netvlad_img.py:86)
        import os

        os.makedirs(cfg.init_dir, exist_ok=True)
        torch_base = TorchVGGBase(seed=29)
        torch.save(torch_base.state_dict(),
                   osp.join(cfg.init_dir, "vd16_offtheshelf_conv5_3_max.pth"))

        # --- OUR stack: the real pipeline, with spies -------------------
        mined = []  # (sub_ids, tuples) per refresh, in order
        orig_refresh = TupleSampler.refresh

        def spy_refresh(self_s, q_feats, g_feats, sub_ids):
            tuples = orig_refresh(self_s, q_feats, g_feats, sub_ids)
            mined.append((np.asarray(sub_ids).copy(), [list(t) for t in tuples]))
            return tuples

        monkeypatch.setattr(TupleSampler, "refresh", spy_refresh)

        our_sub_losses = []
        orig_epoch = pipeline.Trainer.train_epoch

        def spy_epoch(self_t, params, opt_state, loader, **kw):
            params, opt_state, avg = orig_epoch(self_t, params, opt_state,
                                                loader, **kw)
            our_sub_losses.append(float(avg))
            return params, opt_state, avg

        monkeypatch.setattr(pipeline.Trainer, "train_epoch", spy_epoch)

        _, our_final, our_history = pipeline.run_baseline_training(
            cfg, verbose=False)
        dataset = pipeline.load_dataset(cfg)
        n_q, n_g = len(dataset.q_train), len(dataset.db_train)

        # the doubling schedule must have been exercised: 2+2 subsets at the
        # base cache size, then ONE doubled subset after the step boundary
        subset_sizes = [len(s) for s, _ in mined]
        splits = [
            [len(s) for s in pipeline._subset_splits(
                n_q, cfg.cache_size, e, cfg.step_size, cfg.seed,
                cfg.tuple_size)]
            for e in range(self.EPOCHS)
        ]
        assert splits == [[4, 4], [4, 4], [8]]
        assert subset_sizes == [x for ep in splits for x in ep]

        # --- TORCH reference stack on the same world --------------------
        tsrc = {
            name: ImageSource(items, dataset.images_dir,
                              TestTransform(cfg.data.height, cfg.data.width,
                                            device_normalize=True))
            for name, items in [
                ("train", dataset.q_train + dataset.db_train),
                ("q_val", dataset.q_val), ("db_val", dataset.db_val),
                ("q_test", dataset.q_test), ("db_test", dataset.db_test),
            ]
        }

        base = TorchVGGBase(seed=29)
        base.load_state_dict(torch_base.state_dict())
        nv = ref_nv_mod.NetVLAD(num_clusters=self.K, dim=512)
        with h5py.File(osp.join(cfg.init_dir,
                                f"vgg16_synthetic_{self.K}_desc_cen.hdf5"),
                       "r") as h5:
            nv.clsts = h5["centroids"][...]  # shared init artifact 2
            nv.traindescs = h5["descriptors"][...]
        nv._init_params()
        ref = ref_nv_mod.EmbedNet(base, nv).train()
        for i, m in enumerate(ref.base_model.base):
            if i < 24:  # reference conv5 freeze (ibl/models/vgg.py:20-26)
                for p in m.parameters():
                    p.requires_grad = False
        opt = torch.optim.SGD([p for p in ref.parameters() if p.requires_grad],
                              lr=self.LR, momentum=self.MOM,
                              weight_decay=self.WD)
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=self.STEP_SIZE,
                                                gamma=self.GAMMA)
        rtrainer = ref_tr_mod.Trainer(model=None, margin=cfg.margin)
        sampler = ref_sam_mod.DistributedRandomTupleSampler(
            list(range(n_q)), list(range(n_g)),
            dataset.train_pos, dataset.train_neg,
            neg_num=self.NEG, neg_pool=cfg.neg_pool,
            num_replicas=1, rank=0,
        )

        mined_it = iter(mined)
        best5_t, best_epoch_t, best_state = 0.0, -1, None
        t_sub_losses = []
        G = 2 + self.NEG
        for epoch in range(self.EPOCHS):
            for subset in pipeline._subset_splits(
                    n_q, cfg.cache_size, epoch, cfg.step_size, cfg.seed,
                    cfg.tuple_size):
                sub_ids, our_tuples = next(mined_it)
                np.testing.assert_array_equal(sub_ids, subset)
                # dual-stack mining: the REFERENCE sampler mines from the
                # torch stack's own current descriptors
                tf = self._torch_feats(ref, tsrc["train"])
                qf, gf = tf[:n_q], tf[n_q:]
                sampler.sort_gallery(
                    torch.from_numpy(self._sqd(qf, gf)),
                    [int(x) for x in subset])
                ref_tuples = [list(t) for t in sampler]
                self._assert_tuples_tie_equal(
                    ref_tuples, our_tuples, qf, gf, n_q,
                    where=f"epoch {epoch} subset {list(subset)[:3]}...")
                # ...and trains on the SAME stream our pipeline trained on
                losses = []
                for tup in our_tuples:
                    x = self._torch_batch(tsrc["train"], tup)
                    opt.zero_grad()
                    _, vlad = ref(x)
                    loss = rtrainer._get_loss(vlad, "sare_ind", 1, G)
                    loss.backward()
                    opt.step()
                    losses.append(float(loss.detach()))
                t_sub_losses.append(float(np.mean(losses)))
            # per-epoch val eval + strict best-by-recall@5 selection
            qv = self._torch_feats(ref, tsrc["q_val"])
            gv = self._torch_feats(ref, tsrc["db_val"])
            recalls_t = ref_ev_mod.evaluate_all(
                self._sqd(qv, gv), dataset.val_pos, dataset.db_val,
                recall_topk=[1, 5, 10])
            e_our, recalls_our = our_history[epoch]
            assert e_our == epoch
            np.testing.assert_allclose(recalls_t, recalls_our, atol=1e-12,
                                       err_msg=f"val recalls @ epoch {epoch}")
            if recalls_t[1] > best5_t:
                best5_t, best_epoch_t = recalls_t[1], epoch
                best_state = copy.deepcopy(ref.state_dict())
            sched.step()

        np.testing.assert_allclose(t_sub_losses, our_sub_losses,
                                   rtol=2e-3, atol=1e-4,
                                   err_msg="per-subset mean loss trajectories")

        # best-checkpoint selection identical
        _, meta = load_checkpoint(
            osp.join(cfg.logs_dir, "model_best.npz"), {})
        assert int(meta["epoch"]) == best_epoch_t
        np.testing.assert_allclose(float(meta["best_recall5"]), best5_t,
                                   atol=1e-12)

        # final: best model -> reference PCA on train feats -> test recalls
        ref.load_state_dict(best_state)
        train_f = self._torch_feats(ref, tsrc["train"])
        pca = ref_pca_mod.PCA(
            pca_n_components=cfg.pca_dim, pca_whitening=cfg.whiten,
            pca_parameters_path=str(tmp_path / "ref_pca.h5"))
        pca.train(torch.from_numpy(train_f.copy()))
        pca.load(gpu=None)
        with torch.no_grad():
            qt = pca.infer(torch.from_numpy(
                self._torch_feats(ref, tsrc["q_test"]))).numpy()
            gt_f = pca.infer(torch.from_numpy(
                self._torch_feats(ref, tsrc["db_test"]))).numpy()
        final_t = ref_ev_mod.evaluate_all(
            self._sqd(qt, gt_f), dataset.test_pos, dataset.db_test,
            recall_topk=[1, 5, 10])
        np.testing.assert_allclose(final_t, our_final, atol=1e-12,
                                   err_msg="final PCA'd test recalls")


class TestDualStackSFRSPipelineOracle:
    """SFRS outer-loop dual-stack oracle — the generation-level analog of
    TestDualStackPipelineOracle (VERDICT r4 item 1's SFRS variant).

    The 2-generation trajectory oracle (test_reference_oracle.py) pins the
    inner SFRS updates; this replays the reference SFRS ENTRY's outer loop
    (/root/reference/examples/netvlad_img_sfrs.py:176-255) with the torch
    stack against run_sfrs_training on the synthetic world: per-generation
    teacher snapshot + student re-init from the pristine init + fresh
    SGD/StepLR (:178-186), gen-0 training only its LAST epoch (:187-188),
    per-subset mining — reference DiffTupleSampler on the torch stack's own
    euclidean distances, gen>0 difficult positives via a SHARED Jaccard
    matrix (k-reciprocal set membership is rank-discontinuous; per-stack
    Jaccard compares chaos, not drift — same convention and rationale as
    TestSFRSTrajectoryOracle) — hard+soft loss means per subset, per-epoch
    val recalls, the cross-generation strict best-by-recall@5 selection, and
    the final best-model PCA'd test recalls.
    """

    GENS, EPOCHS, STEP_SIZE, CACHE = 2, 2, 2, 4
    NEG, POS, POS_POOL, K = 2, 2, 3, 8
    LR, MOM, WD, GAMMA = 1e-3, 0.9, 1e-3, 0.5
    TEMPS, SOFT = (0.07, 0.07), 0.5

    _torch_batch = TestDualStackPipelineOracle._torch_batch
    _torch_feats = TestDualStackPipelineOracle._torch_feats
    _tb = _torch_batch
    _tf = _torch_feats
    _sqd = staticmethod(TestDualStackPipelineOracle._sqd)

    @staticmethod
    def _tie_aware(picks_ref, picks_ours, score, tol, what):
        for r, o in zip(sorted(picks_ref, key=score),
                        sorted(picks_ours, key=score)):
            if r != o:
                assert abs(score(r) - score(o)) < tol, (
                    f"{what}: {picks_ref} vs {picks_ours}")

    @pytest.mark.slow
    def test_sfrs_outer_loop_matches_reference(self, tmp_path, monkeypatch):
        import copy
        import os

        import h5py
        import torch

        from test_reference_oracle import TorchVGGBase, load_ref

        from openibl_tpu.data.loader import ImageSource
        from openibl_tpu.data.sampler import DiffTupleSampler
        from openibl_tpu.data.transforms import TestTransform
        from openibl_tpu.engine.evaluator import Evaluator
        from openibl_tpu.engine.sfrs import SFRSTrainer
        from openibl_tpu.utils.checkpoint import load_checkpoint

        ref_nv_mod = load_ref("ibl.models.netvlad")
        ref_tr_mod = load_ref("ibl.trainers")
        ref_ev_mod = load_ref("ibl.evaluators")
        ref_pca_mod = load_ref("ibl.pca")
        ref_sam_mod = load_ref("ibl.utils.data.sampler")
        monkeypatch.setattr(ref_ev_mod.dist, "get_rank", lambda: 0)
        monkeypatch.setattr(
            torch, "symeig",
            lambda a, eigenvectors=True, upper=True: torch.linalg.eigh(
                a, UPLO="U" if upper else "L"),
            raising=False,
        )
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self, raising=False)

        cfg = _cfg(
            tmp_path, cls=SFRSConfig, generations=self.GENS,
            epochs=self.EPOCHS, step_size=self.STEP_SIZE,
            cache_size=self.CACHE, neg_num=self.NEG, neg_pool=1000,
            pos_num=self.POS, pos_pool=self.POS_POOL,
            num_clusters=self.K, augment=False, loss_type="sare_ind",
            lr=self.LR, gamma=self.GAMMA, temperature=self.TEMPS,
            soft_weight=self.SOFT,
        )
        # 32x32 input -> 2x2 conv5 map: exact quartering on both stacks
        cfg.data.height = cfg.data.width = 32

        os.makedirs(cfg.init_dir, exist_ok=True)
        torch_base = TorchVGGBase(seed=37)
        torch.save(torch_base.state_dict(),
                   osp.join(cfg.init_dir, "vd16_offtheshelf_conv5_3_max.pth"))

        # --- OUR stack with spies -----------------------------------------
        mined = []  # (sub_ids, tuples, jaccard_rows or None)
        orig_refresh = DiffTupleSampler.refresh

        def spy_refresh(self_s, q_feats, g_feats, sub_ids, jaccard_rows=None):
            tuples = orig_refresh(self_s, q_feats, g_feats, sub_ids,
                                  jaccard_rows=jaccard_rows)
            mined.append((np.asarray(sub_ids).copy(),
                          [list(t) for t in tuples],
                          None if jaccard_rows is None
                          else np.array(jaccard_rows, copy=True)))
            return tuples

        monkeypatch.setattr(DiffTupleSampler, "refresh", spy_refresh)

        our_losses = []  # (hard, soft) mean per subset
        orig_epoch = SFRSTrainer.train_epoch

        def spy_epoch(self_t, params, teacher, opt_state, loader, gen, **kw):
            params, opt_state, (lh, ls) = orig_epoch(
                self_t, params, teacher, opt_state, loader, gen, **kw)
            our_losses.append((float(lh), float(ls)))
            return params, opt_state, (lh, ls)

        monkeypatch.setattr(SFRSTrainer, "train_epoch", spy_epoch)

        our_evals = []
        orig_eval = Evaluator.evaluate_sources

        def spy_eval(self_e, *a, **kw):
            recalls = orig_eval(self_e, *a, **kw)
            our_evals.append(np.array(recalls, copy=True))
            return recalls

        monkeypatch.setattr(Evaluator, "evaluate_sources", spy_eval)

        _, our_final = pipeline.run_sfrs_training(cfg, verbose=False)
        dataset = pipeline.load_dataset(cfg)
        n_q, n_g = len(dataset.q_train), len(dataset.db_train)
        # gen0 trains 1 epoch (last-epoch-only) with 2 subsets; gen1 trains
        # 2 epochs x 2 subsets; evals: 1 (gen0) + 2 (gen1) + 1 final PCA'd
        assert len(mined) == 6 and len(our_losses) == 6
        assert len(our_evals) == 4
        assert all(m[2] is None for m in mined[:2])  # gen0: euclid mining
        assert all(m[2] is not None for m in mined[2:])  # gen1: Jaccard

        # --- TORCH reference stack ----------------------------------------
        tsrc = {
            name: ImageSource(items, dataset.images_dir,
                              TestTransform(cfg.data.height, cfg.data.width,
                                            device_normalize=True))
            for name, items in [
                ("train", dataset.q_train + dataset.db_train),
                ("q_val", dataset.q_val), ("db_val", dataset.db_val),
                ("q_test", dataset.q_test), ("db_test", dataset.db_test),
            ]
        }

        def fresh_student():
            base = TorchVGGBase(seed=37)
            base.load_state_dict(torch_base.state_dict())
            nv = ref_nv_mod.NetVLAD(num_clusters=self.K, dim=512)
            with h5py.File(
                    osp.join(cfg.init_dir,
                             f"vgg16_synthetic_{self.K}_desc_cen.hdf5"),
                    "r") as h5:
                nv.clsts = h5["centroids"][...]
                nv.traindescs = h5["descriptors"][...]
            nv._init_params()
            m = ref_nv_mod.EmbedRegionNet(base, nv, tuple_size=1).train()
            for i, mod in enumerate(m.base_model.base):
                if i < 24:
                    for p in mod.parameters():
                        p.requires_grad = False
            return m

        student = fresh_student()
        pristine_state = copy.deepcopy(student.state_dict())
        teacher = fresh_student()
        rtrainer = ref_tr_mod.SFRSTrainer(
            student, teacher, margin=cfg.margin, neg_num=self.NEG,
            temp=list(self.TEMPS))
        sampler = ref_sam_mod.DistributedRandomDiffTupleSampler(
            list(range(n_q)), list(range(n_g)),
            dataset.train_pos, dataset.train_neg,
            pos_num=self.POS, pos_pool=self.POS_POOL,
            neg_num=self.NEG, neg_pool=cfg.neg_pool,
            num_replicas=1, rank=0,
        )

        mined_it = iter(mined)
        loss_it = iter(our_losses)
        eval_it = iter(our_evals)
        best5_t, best_gen_epoch_t, best_state = 0.0, None, None
        G = 2 + self.NEG
        for gen in range(self.GENS):
            # generation boundary (netvlad_img_sfrs.py:178-186)
            teacher.load_state_dict(student.state_dict())
            student.load_state_dict(pristine_state)
            opt = torch.optim.SGD(
                [p for p in student.parameters() if p.requires_grad],
                lr=self.LR, momentum=self.MOM, weight_decay=self.WD)
            sched = torch.optim.lr_scheduler.StepLR(
                opt, step_size=self.STEP_SIZE, gamma=self.GAMMA)
            # gen0 jumps to its last epoch with the scheduler untouched
            # (netvlad_img_sfrs.py:184-188) — it trains at BASE lr
            start_epoch = self.EPOCHS - 1 if gen == 0 else 0
            lam = self.SOFT if gen > 0 else 0.0
            for epoch in range(start_epoch, self.EPOCHS):
                for subset in pipeline._subset_splits(
                        n_q, cfg.cache_size, epoch, cfg.step_size, cfg.seed,
                        cfg.tuple_size):
                    sub_ids, our_tuples, our_jac = next(mined_it)
                    np.testing.assert_array_equal(sub_ids, subset)
                    tf = self._tf(student, tsrc["train"])
                    qf, gf = tf[:n_q], tf[n_q:]
                    d2 = self._sqd(qf, gf)
                    if gen > 0:
                        # SHARED Jaccard (ours), scattered to full rows; the
                        # sampler reads subset rows only
                        jac_full = np.array(d2, copy=True)
                        jac_full[np.asarray(sub_ids)] = our_jac
                        jac_t = torch.from_numpy(jac_full)
                    else:
                        jac_t = torch.from_numpy(d2)  # gen0 fallback (:91-93)
                    sampler.sort_gallery(torch.from_numpy(d2), jac_t,
                                         [int(x) for x in subset])
                    ref_tuples = [list(t) for t in sampler]
                    ref_d = {t[0]: t for t in ref_tuples}
                    our_d = {t[0]: t for t in our_tuples}
                    assert set(ref_d) == set(our_d)
                    for a in ref_d:
                        tr, to = ref_d[a], our_d[a]
                        d_row = self._sqd(qf[a][None], gf)[0]
                        euclid = lambda g_id: d_row[g_id - n_q]
                        self._tie_aware(tr[1:2], to[1:2], euclid, 5e-3,
                                        f"gen{gen} e{epoch} a{a} positive")
                        self._tie_aware(tr[2:G], to[2:G], euclid, 5e-3,
                                        f"gen{gen} e{epoch} a{a} negatives")
                        row = (our_jac[list(sub_ids).index(a)]
                               if gen > 0 else d_row)
                        # the reference may select FEWER than pos_num diff
                        # positives (gap logic); ours pads with the top-1
                        score = lambda g_id: float(row[g_id - n_q])
                        self._tie_aware(tr[G:], to[G:len(tr)], score,
                                        5e-3 if gen == 0 else 5e-2,
                                        f"gen{gen} e{epoch} a{a} diff-pos")
                    # train on OUR stream (the trajectories must stay coupled)
                    hard, soft = [], []
                    for tup in our_tuples:
                        tup = np.asarray(tup)
                        easy = self._tb(tsrc["train"], tup[:G])[None]
                        diff = self._tb(tsrc["train"],
                                        np.concatenate([tup[:1], tup[G:]])
                                        )[None]
                        opt.zero_grad()
                        lh, ls = rtrainer._forward(easy, diff, "sare_ind",
                                                   gen)
                        (lh + ls * lam).backward()
                        opt.step()
                        hard.append(float(lh.detach()))
                        soft.append(float(ls.detach()))
                    lh_o, ls_o = next(loss_it)
                    np.testing.assert_allclose(
                        np.mean(hard), lh_o, rtol=2e-3, atol=1e-4,
                        err_msg=f"gen{gen} e{epoch} hard loss")
                    np.testing.assert_allclose(
                        np.mean(soft), ls_o, rtol=2e-3, atol=1e-4,
                        err_msg=f"gen{gen} e{epoch} soft loss")
                qv = self._tf(student, tsrc["q_val"])
                gv = self._tf(student, tsrc["db_val"])
                recalls_t = ref_ev_mod.evaluate_all(
                    self._sqd(qv, gv), dataset.val_pos, dataset.db_val,
                    recall_topk=[1, 5, 10])
                np.testing.assert_allclose(
                    recalls_t, next(eval_it), atol=1e-12,
                    err_msg=f"val recalls gen {gen} epoch {epoch}")
                if recalls_t[1] > best5_t:
                    best5_t = recalls_t[1]
                    best_gen_epoch_t = (gen, epoch)
                    best_state = copy.deepcopy(student.state_dict())
                sched.step()

        # cross-generation best-checkpoint selection identical
        _, meta = load_checkpoint(
            osp.join(cfg.logs_dir, "model_best.npz"), {})
        assert (int(meta["generation"]), int(meta["epoch"])) \
            == best_gen_epoch_t

        # final: best model -> reference PCA -> test recalls
        student.load_state_dict(best_state)
        train_f = self._tf(student, tsrc["train"])
        pca = ref_pca_mod.PCA(
            pca_n_components=cfg.pca_dim, pca_whitening=cfg.whiten,
            pca_parameters_path=str(tmp_path / "ref_pca_sfrs.h5"))
        pca.train(torch.from_numpy(train_f.copy()))
        pca.load(gpu=None)
        with torch.no_grad():
            qt = pca.infer(torch.from_numpy(
                self._tf(student, tsrc["q_test"]))).numpy()
            gt_f = pca.infer(torch.from_numpy(
                self._tf(student, tsrc["db_test"]))).numpy()
        final_t = ref_ev_mod.evaluate_all(
            self._sqd(qt, gt_f), dataset.test_pos, dataset.db_test,
            recall_topk=[1, 5, 10])
        np.testing.assert_allclose(final_t, our_final, atol=1e-12,
                                   err_msg="final PCA'd test recalls")
