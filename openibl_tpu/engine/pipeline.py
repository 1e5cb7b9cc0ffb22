"""End-to-end workflows: baseline training, SFRS training, evaluation.

These are the library-level equivalents of the reference entry points
(/root/reference/examples/netvlad_img.py:116-233, netvlad_img_sfrs.py:121-255,
test.py:77-133) — examples/*.py are thin argparse wrappers over this module,
and the hermetic e2e tests drive it on the synthetic dataset.

Key TPU-native deviations (documented; semantics preserved):
  * The mining pass extracts only the subset's anchors + the gallery for the
    baseline (the reference re-extracts every train image each subset —
    non-subset query features were unused, netvlad_img.py:73-83). SFRS still
    extracts everything because the Jaccard rerank needs all-query distmats.
  * cache_size growth is 2^(epoch // step_size) of the ORIGINAL size (the
    reference compounds the multiplication per epoch, netvlad_img.py:176; for
    the published 5-epoch/step-5 recipes the two are identical).
"""

import dataclasses
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

from openibl_tpu import data as datasets
from openibl_tpu import models
from openibl_tpu.data.loader import ImageSource, BatchLoader, TupleLoader
from openibl_tpu.data.sampler import (
    TupleSampler, DiffTupleSampler, shard_tuples,
)
from openibl_tpu.data.transforms import TrainTransform, TestTransform
from openibl_tpu.engine.evaluator import Evaluator
from openibl_tpu.engine.trainer import Trainer
from openibl_tpu.engine.sfrs import SFRSTrainer
from openibl_tpu.ops import pca as pca_ops
from openibl_tpu.ops.distance import pairwise_sqdist
from openibl_tpu.ops.kmeans import kmeans
from openibl_tpu.parallel.extract import (
    extract_features, extract_features_sharded,
)
from openibl_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from openibl_tpu.utils.profiling import PhaseTimer
from openibl_tpu.utils.watchdog import Watchdog

# warns loudly on hung device phases (tunnel/compile/collective stalls)
_WATCHDOG = Watchdog(warn_after=600.0)


def _local_tuple_stream(tuples, tuple_size):
    """This process's slice of the mined tuple stream + its local batch size.

    Single process: the stream unchanged. Multi-host: every process holds the
    identical global stream (mining is deterministic on all-gathered
    features), takes its per-batch rows (data.sampler.shard_tuples) and
    feeds tuple_size // n_proc tuples per step — the trainers assemble the
    global (tuple_size, ...) batch via jax.make_array_from_process_local_data.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return tuples, tuple_size
    local = shard_tuples(tuples, tuple_size, n_proc, jax.process_index())
    return local, tuple_size // n_proc


def _apply_iters_cap(tuples, iters, tuple_size):
    """Reference --iters semantics: exactly ``iters`` train iterations per
    subset. IterLoader cycles its loader on exhaustion (ibl/utils/data/
    __init__.py:8-27), so a short tuple list repeats, not truncates."""
    if iters <= 0 or not tuples:
        return tuples
    need = iters * tuple_size
    reps = -(-need // len(tuples))  # ceil
    return (list(tuples) * reps)[:need]


# ---------------------------------------------------------------------------
# setup helpers
# ---------------------------------------------------------------------------

def load_dataset(cfg):
    root = osp.join(cfg.data.data_dir, cfg.data.dataset)
    kwargs = {}
    if cfg.data.dataset == "pitts":
        kwargs["scale"] = cfg.data.scale
    return datasets.create(cfg.data.dataset, root, **kwargs)


def bootstrap_centroids(cfg, dataset, base_model, base_params,
                        n_images=500, per_image=100, seed=43):
    """NetVLAD centroid bootstrap (reference examples/cluster.py:59-115):
    sample conv5 descriptors from random train images, k-means them.

    Reads/writes the reference-compatible hdf5 cache
    ({arch}_{dataset}_{k}_desc_cen.hdf5 with 'centroids' + 'descriptors')."""
    import h5py

    cache = osp.join(
        cfg.init_dir,
        f"{cfg.arch}_{cfg.data.dataset}_{cfg.num_clusters}_desc_cen.hdf5",
    )
    if osp.isfile(cache):
        with h5py.File(cache, "r") as h5:
            return h5["centroids"][...], h5["descriptors"][...]

    items = sorted(set(dataset.q_train) | set(dataset.db_train))
    rng = np.random.RandomState(seed)
    pick = rng.choice(len(items), min(n_images, len(items)), replace=False)
    src = ImageSource(
        [items[i] for i in pick], root=dataset.images_dir,
        transform=TestTransform(cfg.data.height, cfg.data.width),
    )
    fwd = jax.jit(
        lambda p, x: base_model.apply(p, x)[1]  # conv5 feature map
    )
    descs = []
    for images, _, count in BatchLoader(src, batch_size=cfg.data.test_batch_size,
                                        prefetch=cfg.data.workers):
        # f32 regardless of the backbone compute dtype: the centroid/alpha
        # bootstrap is on the fidelity-critical init path
        fmap = np.asarray(fwd(base_params, jnp.asarray(images)),
                          dtype=np.float32)[:count]
        n, h, w, c = fmap.shape
        flat = fmap.reshape(n, h * w, c)
        flat = flat / np.maximum(
            np.linalg.norm(flat, axis=-1, keepdims=True), 1e-12
        )
        for img_desc in flat:
            sample = rng.choice(h * w, min(per_image, h * w), replace=False)
            descs.append(img_desc[sample])
    descs = np.concatenate(descs).astype(np.float32)
    centroids, _ = kmeans(descs, cfg.num_clusters, iters=100, seed=seed)
    if jax.process_index() == 0:  # every process computes the identical
        import os                 # bootstrap; only rank 0 persists the cache

        os.makedirs(cfg.init_dir, exist_ok=True)
        with h5py.File(cache, "w") as h5:
            h5.create_dataset("descriptors", data=descs)
            h5.create_dataset("centroids", data=centroids)
    return centroids, descs


def build_model(cfg, dataset, region=False, tuple_size=None, rng_seed=0):
    """Backbone + NetVLAD with centroid init. Returns (model, params).

    The backbone starts from converted pretrained weights when
    ``{init_dir}/vd16_offtheshelf_conv5_3_max.pth`` exists (the MatConvNet
    conversion the reference trains from, vgg.py:57-58); random init
    otherwise."""
    base = models.create(
        cfg.arch, train_layers=cfg.train_layers,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )
    nv = models.NetVLAD(num_clusters=cfg.num_clusters)
    if region:
        model = models.create(
            "embedregionnet", base=base, net_vlad=nv,
            tuple_size=tuple_size or cfg.tuple_size,
        )
    else:
        model = models.create("embednet", base=base, net_vlad=nv)
    params = model.init(jax.random.PRNGKey(rng_seed))

    matconvnet = osp.join(cfg.init_dir, "vd16_offtheshelf_conv5_3_max.pth")
    if osp.isfile(matconvnet):
        import torch

        from openibl_tpu.models import convert

        state = torch.load(matconvnet, map_location="cpu", weights_only=False)
        params["base"] = convert.vgg16_params_from_torch(state)

    clsts, traindescs = bootstrap_centroids(cfg, dataset, base, params["base"])
    params["vlad"] = nv.init_from_clusters(clsts, traindescs)
    return model, params


def eval_view(model):
    """Same model/params with the fused Pallas NetVLAD head for no-grad
    extraction/eval (1.7x the XLA head on TPU; interpret-mode Pallas is slow
    on CPU, so only switch on real TPUs)."""
    if jax.default_backend() != "tpu" or model.net_vlad.fused:
        return model
    return dataclasses.replace(
        model, net_vlad=dataclasses.replace(model.net_vlad, fused=True)
    )


def _use_device_jitter(cfg):
    return (getattr(cfg, "device_jitter", False)
            and getattr(cfg, "augment", True))


def make_sources(cfg, dataset):
    # uint8 images, mean subtraction on device: 4x less H2D traffic.
    # The jitter stream is seeded (and re-seeded per subset in the training
    # loops) so runs are reproducible and resumes bit-faithful. With
    # device_jitter the host pipeline skips PIL jitter entirely — the train
    # step augments on the chip (ops/augment.py). augment=False turns
    # ColorJitter off on BOTH sides (deterministic train pixels).
    train_tf = TrainTransform(cfg.data.height, cfg.data.width,
                              jitter=(getattr(cfg, "augment", True)
                                      and not getattr(cfg, "device_jitter",
                                                      False)),
                              device_normalize=True, seed=cfg.seed)
    test_tf = TestTransform(cfg.data.height, cfg.data.width,
                            device_normalize=True)
    train_items = dataset.q_train + dataset.db_train
    return {
        "tuple": ImageSource(train_items, dataset.images_dir, train_tf),
        "q_train": ImageSource(dataset.q_train, dataset.images_dir, test_tf),
        "db_train": ImageSource(dataset.db_train, dataset.images_dir, test_tf),
        "q_val": ImageSource(dataset.q_val, dataset.images_dir, test_tf),
        "db_val": ImageSource(dataset.db_val, dataset.images_dir, test_tf),
        "q_test": ImageSource(dataset.q_test, dataset.images_dir, test_tf),
        "db_test": ImageSource(dataset.db_test, dataset.images_dir, test_tf),
    }


def _subset_splits(n_query, cache_size, epoch, step_size, seed,
                   tuple_size=1):
    """Shuffled query subsets of (possibly grown) cache size per epoch
    (netvlad_img.py:176-180). A cache_size below tuple_size is clamped to
    the full query set (reference netvlad_img.py:170-171) — otherwise every
    subset mines fewer tuples than one batch, the drop-last loaders skip
    them all, and training silently takes zero optimizer steps."""
    if cache_size < tuple_size or cache_size > n_query:
        cache_size = n_query
    size = min(max(cache_size * (2 ** (epoch // step_size)), 1), n_query)
    rng = np.random.RandomState(seed + epoch)
    perm = rng.permutation(n_query)
    # each subset is SORTED: extract_features returns features in ascending
    # dataset-index order, and the sampler zips feature row r with subset[r]
    # — unsorted subsets would silently mine with misaligned descriptors
    return [np.sort(perm[s : s + size]) for s in range(0, n_query, size)]


# ---------------------------------------------------------------------------
# baseline training (triplet / SARE)
# ---------------------------------------------------------------------------

def run_baseline_training(cfg, mesh=None, verbose=True, timer=None):
    timer = timer if timer is not None else PhaseTimer()
    is_main = jax.process_index() == 0
    verbose = verbose and is_main  # rank-0 logging, like the reference
    dataset = load_dataset(cfg)
    sources = make_sources(cfg, dataset)
    model, params = build_model(cfg, dataset)
    emodel = eval_view(model)
    feature = "vlad" if getattr(cfg, "use_vlad", True) else "pool"
    evaluator = Evaluator(emodel.apply, mesh=mesh, feature=feature)

    trainer = Trainer(
        model, loss_type=cfg.loss_type, margin=cfg.margin, lr=cfg.lr,
        momentum=cfg.momentum, weight_decay=cfg.weight_decay, mesh=mesh,
        use_pool_feature=not getattr(cfg, "use_vlad", True),
        remat=getattr(cfg, "remat", False),
        device_jitter=_use_device_jitter(cfg),
    )
    trainer.check_batch_shape(cfg.tuple_size)
    opt_state = trainer.init(params)

    sampler = TupleSampler(
        len(dataset.q_train), len(dataset.db_train),
        dataset.train_pos, dataset.train_neg,
        neg_num=cfg.neg_num, neg_pool=cfg.neg_pool, seed=cfg.seed,
    )

    start_epoch, best_recall5 = 0, 0.0
    if cfg.resume:
        loaded, meta = load_checkpoint(
            cfg.resume,
            {"params": params, "opt_state": opt_state,
             "neg_cache": sampler.neg_cache},
        )
        params, opt_state = loaded["params"], loaded["opt_state"]
        sampler.neg_cache = np.asarray(loaded["neg_cache"])
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_recall5 = float(meta.get("best_recall5", 0.0))

    bs = cfg.data.test_batch_size
    pf = cfg.data.workers
    history = []
    for epoch in range(start_epoch, cfg.epochs):
        sampler.set_epoch(cfg.seed + epoch)
        opt_state = trainer.set_epoch_lr(opt_state, epoch, cfg.step_size, cfg.gamma)
        for subid, subset in enumerate(
            _subset_splits(len(dataset.q_train), cfg.cache_size, epoch,
                           cfg.step_size, cfg.seed, cfg.tuple_size)
        ):
            # mining: fresh gallery + subset-anchor descriptors. The sharded
            # helper splits the work per host (DCN all-gather reassembly) and
            # is a plain mesh pass single-process. device_output keeps the
            # (G, D) gallery HBM-resident between extraction and mining —
            # no host round trip (the multi-host path reassembles via numpy
            # all-gather and ignores the flag).
            with _WATCHDOG.watch(f"mining extraction epoch {epoch}-{subid}"), \
                    timer.phase("mining_extract"):
                g_feats = extract_features_sharded(
                    emodel.apply, params, sources["db_train"],
                    batch_size=bs, mesh=mesh, feature=feature, prefetch=pf,
                    device_output=True,
                )
                q_feats = extract_features_sharded(
                    emodel.apply, params, sources["q_train"], indices=subset,
                    batch_size=bs, mesh=mesh, feature=feature, prefetch=pf,
                    device_output=True,
                )
            with timer.phase("mining_refresh"):
                tuples = sampler.refresh(q_feats, g_feats, subset)
            # refresh materialized its outputs to numpy: release the
            # HBM-resident (G, D) gallery before the train phase needs the
            # memory (at Pitts250k/32k-d scale the buffer is ~11 GB)
            del g_feats, q_feats
            tuples = _apply_iters_cap(tuples, getattr(cfg, "iters", 0),
                                      cfg.tuple_size)
            local_tuples, local_ts = _local_tuple_stream(tuples, cfg.tuple_size)
            sources["tuple"].transform.reseed(cfg.seed, epoch, subid)
            loader = TupleLoader(sources["tuple"], local_tuples, local_ts,
                                 prefetch=pf)
            jitter_key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch), subid
            )
            with timer.phase("train"):
                params, opt_state, avg_loss = trainer.train_epoch(
                    params, opt_state, loader, print_freq=cfg.print_freq,
                    log_prefix=f"Epoch [{epoch}-{subid}]", rng_key=jitter_key,
                )
            if verbose:
                print(f"Epoch [{epoch}-{subid}] avg loss {avg_loss:.4f}")

        if verbose:
            print(timer.summary())
        if (epoch + 1) % cfg.eval_step == 0 or epoch == cfg.epochs - 1:
            with timer.phase("eval"):
                recalls = evaluator.evaluate_sources(
                    params, sources["q_val"], sources["db_val"],
                    dataset.val_pos, batch_size=bs, prefetch=pf,
                    print_results=verbose,
                )
            history.append((epoch, recalls))
            is_best = recalls[1] > best_recall5
            best_recall5 = max(recalls[1], best_recall5)
            if is_main:  # rank-0 checkpointing (shared-FS safe)
                save_checkpoint(
                    osp.join(cfg.logs_dir, f"checkpoint{epoch}.npz"),
                    {"params": params, "opt_state": opt_state,
                     "neg_cache": sampler.neg_cache},
                    {"epoch": epoch, "best_recall5": float(best_recall5)},
                    is_best=is_best,
                )
            if verbose:
                print(
                    f" * epoch {epoch} recall@1/5/10: "
                    f"{recalls[0]:.1%}/{recalls[1]:.1%}/{recalls[2]:.1%} "
                    f"best@5 {best_recall5:.1%}{' *' if is_best else ''}"
                )

    # final: PCA on the best model, test-split eval (netvlad_img.py:212-233)
    if jax.process_count() > 1:
        # non-main processes must not read model_best.npz before rank 0
        # finishes writing it
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("openibl:ckpt_final")
    best_path = osp.join(cfg.logs_dir, "model_best.npz")
    if osp.isfile(best_path):
        loaded, _ = load_checkpoint(best_path, {"params": params})
        params = loaded["params"]
    recalls = finalize_with_pca(cfg, dataset, sources, model, params,
                                mesh=mesh, verbose=verbose)
    return params, recalls, history


def _train_pca(feats, pca_dim, whiten, params_path, seed):
    """Shared PCA fit (finalize_with_pca + run_eval's on-demand path): >10k
    subsample, component clamp to the data, and rank-0-only persistence —
    every process trains the identical PCA in memory (deterministic eigh on
    identical all-gathered features); only rank 0 writes the h5."""
    if len(feats) > 10000:
        sel = np.random.RandomState(seed).choice(len(feats), 10000,
                                                 replace=False)
        feats = feats[sel]
    pca = pca_ops.PCA(
        min(pca_dim, feats.shape[0], feats.shape[1]), whiten=whiten,
        params_path=params_path if jax.process_index() == 0 else None,
    )
    pca.train(feats)
    pca.params_path = params_path
    return pca


def finalize_with_pca(cfg, dataset, sources, model, params, mesh=None,
                      verbose=True, nms=False):
    """Train PCA-whitening on <=10k train descriptors, evaluate the test split
    with reduction (netvlad_img.py:212-233). Honors the pool/vlad feature
    selection like the reference's vlad=args.vlad plumbing."""
    feature = "vlad" if getattr(cfg, "use_vlad", True) else "pool"
    emodel = eval_view(model)
    is_main = jax.process_index() == 0
    verbose = verbose and is_main
    bs = cfg.data.test_batch_size
    pf = cfg.data.workers
    feats = np.concatenate([
        extract_features_sharded(emodel.apply, params, sources["q_train"],
                                 batch_size=bs, mesh=mesh, feature=feature,
                                 prefetch=pf),
        extract_features_sharded(emodel.apply, params, sources["db_train"],
                                 batch_size=bs, mesh=mesh, feature=feature,
                                 prefetch=pf),
    ])
    pca = _train_pca(feats, cfg.pca_dim, getattr(cfg, "whiten", True),
                     osp.join(cfg.logs_dir, "pca_params_model_best.h5"),
                     cfg.seed)
    if verbose:
        print("Testing with PCA reduction:")
    evaluator = Evaluator(emodel.apply, mesh=mesh, feature=feature)
    return evaluator.evaluate_sources(
        params, sources["q_test"], sources["db_test"], dataset.test_pos,
        gallery_pids=[it[1] for it in dataset.db_test],
        pca=pca,
        nms=nms,
        batch_size=bs,
        prefetch=pf,
        print_results=verbose,
    )


# ---------------------------------------------------------------------------
# SFRS training
# ---------------------------------------------------------------------------

def run_sfrs_training(cfg, mesh=None, verbose=True, timer=None):
    if not getattr(cfg, "use_vlad", True):
        # the reference SFRS entry hardcodes vlad=True for mining and eval
        # (netvlad_img_sfrs.py update_sampler/evaluate calls); honoring a
        # pool-feature flag only in finalize_with_pca would silently train
        # on one feature and test on another
        raise ValueError("SFRS training is defined on the VLAD feature "
                         "(the reference hardcodes vlad=True); "
                         "use_vlad=False is only supported by the baseline")
    timer = timer if timer is not None else PhaseTimer()
    is_main = jax.process_index() == 0
    verbose = verbose and is_main  # rank-0 logging, like the reference
    dataset = load_dataset(cfg)
    sources = make_sources(cfg, dataset)
    model, params = build_model(cfg, dataset, region=True)
    emodel = eval_view(model)
    from openibl_tpu.parallel.mesh import copy_tree

    pristine = jax.tree.map(np.asarray, params)  # re-init source per gen
    teacher = copy_tree(params)  # real copy (params get donated)
    evaluator = Evaluator(emodel.apply, mesh=mesh)

    if len(cfg.temperature) < cfg.generations:
        raise ValueError(
            f"SFRS needs one teacher temperature per generation: got "
            f"{len(cfg.temperature)} temps for {cfg.generations} generations"
        )
    trainer = SFRSTrainer(
        model, loss_type=cfg.loss_type, margin=cfg.margin,
        temps=cfg.temperature, soft_weight=cfg.soft_weight,
        neg_num=cfg.neg_num, lr=cfg.lr, momentum=cfg.momentum,
        weight_decay=cfg.weight_decay, mesh=mesh,
        remat=getattr(cfg, "remat", False),
        device_jitter=_use_device_jitter(cfg),
    )

    trainer.check_batch_shape(cfg.tuple_size)
    sampler = DiffTupleSampler(
        len(dataset.q_train), len(dataset.db_train),
        dataset.train_pos, dataset.train_neg,
        pos_num=cfg.pos_num, pos_pool=cfg.pos_pool,
        neg_num=cfg.neg_num, neg_pool=cfg.neg_pool, seed=cfg.seed,
    )

    bs = cfg.data.test_batch_size
    pf = cfg.data.workers
    best_recall5 = 0.0
    start_gen, resume_epoch = 0, None
    if cfg.resume:
        # restore student, optimizer, teacher and mining cache mid-generation
        # (the reference restores only the student and re-snapshots the
        # teacher from it, netvlad_img_sfrs.py:152-160 — saving the teacher
        # keeps mid-generation resumes faithful)
        opt_probe = trainer.init_generation(params)
        loaded, meta = load_checkpoint(
            cfg.resume,
            {"params": params, "opt_state": opt_probe, "teacher": params,
             "neg_cache": sampler.neg_cache},
        )
        params = loaded["params"]
        resume_teacher = loaded["teacher"]
        resume_opt = loaded["opt_state"]
        sampler.neg_cache = np.asarray(loaded["neg_cache"])
        start_gen = int(meta.get("generation", 0))
        resume_epoch = int(meta.get("epoch", -1)) + 1
        best_recall5 = float(meta.get("best_recall5", 0.0))

    for gen in range(start_gen, cfg.generations):
        if cfg.resume and gen == start_gen and resume_epoch is not None:
            teacher = copy_tree(resume_teacher)
            trainer.init_generation(params)  # rebuild tx for this param tree
            opt_state = resume_opt
            start_epoch = resume_epoch
        else:
            # teacher ← student; student re-initializes; fresh optimizer
            # (netvlad_img_sfrs.py:177-188). copy_tree: the train step
            # donates the student while the teacher must stay alive.
            teacher = copy_tree(params)
            params = jax.tree.map(jnp.asarray, pristine)
            opt_state = trainer.init_generation(params)
            start_epoch = cfg.epochs - 1 if gen == 0 else 0

        for epoch in range(start_epoch, cfg.epochs):
            sampler.set_epoch(cfg.seed + epoch)
            # the reference builds a FRESH StepLR per generation
            # (netvlad_img_sfrs.py:184-186) and gen 0 jumps straight to its
            # last epoch, so that single epoch always trains at BASE lr —
            # the scheduler has taken zero steps. gen>0 runs from epoch 0,
            # where the fresh scheduler's count equals the epoch index.
            opt_state = trainer.set_epoch_lr(opt_state,
                                             0 if gen == 0 else epoch,
                                             cfg.step_size, cfg.gamma)
            for subid, subset in enumerate(
                _subset_splits(len(dataset.q_train), cfg.cache_size, epoch,
                               cfg.step_size, cfg.seed, cfg.tuple_size)
            ):
                jaccard_rows = None
                # gen 0 mines on euclidean distances only: the gallery can
                # stay HBM-resident end-to-end. gen > 0 builds the sparse
                # Jaccard structures on host (numpy), so it keeps the numpy
                # output.
                with timer.phase("mining_extract"):
                    g_feats = extract_features_sharded(
                        emodel.apply, params, sources["db_train"],
                        batch_size=bs, mesh=mesh, prefetch=pf,
                        device_output=(gen == 0),
                    )
                if gen > 0:
                    # Jaccard mining over the full q∪g union
                    # (netvlad_img_sfrs.py:84-93), but device-resident: V rows
                    # from the streaming top-k + sparse feature distances, and
                    # the min/sum intersection as fixed-shape scatter-adds —
                    # computed ONLY for the subset anchors (the reference
                    # reranks every query each refresh)
                    with timer.phase("mining_extract"):
                        q_all = extract_features_sharded(
                            emodel.apply, params, sources["q_train"],
                            batch_size=bs, mesh=mesh, prefetch=pf,
                        )
                    from openibl_tpu.ops.rerank import (
                        build_v_sparse, jaccard_for_queries,
                    )

                    with timer.phase("mining_jaccard"):
                        nq = len(q_all)
                        union = np.concatenate([q_all, g_feats])
                        rows, cols, vals, _, rm2 = build_v_sparse(union, k1=20)
                        sub = np.asarray(subset)
                        jac = jaccard_for_queries(rows, cols, vals,
                                                  len(union), sub)
                        if cfg.rerank_lambda:
                            d2_sub = np.asarray(
                                pairwise_sqdist(union[sub], union), np.float32
                            )
                            jac = jac * (1 - cfg.rerank_lambda) + (
                                np.square(np.maximum(d2_sub, 0.0))
                                / rm2[sub][:, None]
                            ) * cfg.rerank_lambda
                            del d2_sub
                        # COPY (not a view of jac) so the O(S·N) jaccard and
                        # the other O(N)+ structures can be freed here — as
                        # plain locals they would stay bound through the
                        # whole train+eval phase (GBs of dead host arrays at
                        # Pitts250k scale on the 1-core host)
                        jaccard_rows = np.ascontiguousarray(jac[:, nq:])
                        q_feats = q_all[subset]
                        del union, rows, cols, vals, jac, q_all
                else:
                    with timer.phase("mining_extract"):
                        q_feats = extract_features_sharded(
                            emodel.apply, params, sources["q_train"],
                            indices=subset, batch_size=bs, mesh=mesh,
                            prefetch=pf, device_output=True,
                        )
                with timer.phase("mining_refresh"):
                    tuples = sampler.refresh(q_feats, g_feats, subset,
                                             jaccard_rows=jaccard_rows)
                # release the mining descriptors (HBM-resident at gen 0)
                # before the train phase needs the memory
                del g_feats, q_feats, jaccard_rows
                tuples = _apply_iters_cap(tuples, getattr(cfg, "iters", 0),
                                          cfg.tuple_size)
                local_tuples, local_ts = _local_tuple_stream(
                    tuples, cfg.tuple_size
                )
                sources["tuple"].transform.reseed(cfg.seed, gen, epoch, subid)
                loader = TupleLoader(sources["tuple"], local_tuples, local_ts,
                                     prefetch=pf)
                jitter_key = jax.random.fold_in(jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(cfg.seed), gen),
                    epoch), subid)
                with timer.phase("train"):
                    params, opt_state, (lh, ls) = trainer.train_epoch(
                        params, teacher, opt_state, loader, gen,
                        print_freq=cfg.print_freq,
                        log_prefix=f"Gen {gen} Epoch [{epoch}-{subid}]",
                        rng_key=jitter_key,
                    )
                if verbose:
                    print(f"Gen {gen} Epoch [{epoch}-{subid}] "
                          f"hard {lh:.4f} soft {ls:.4f}")

            if verbose:
                print(timer.summary())
            if not ((epoch + 1) % cfg.eval_step == 0 or epoch == cfg.epochs - 1):
                continue  # eval/checkpoint cadence (netvlad_img_sfrs.py:210)
            with timer.phase("eval"):
                recalls = evaluator.evaluate_sources(
                    params, sources["q_val"], sources["db_val"],
                    dataset.val_pos, batch_size=bs, prefetch=pf,
                    print_results=verbose,
                )
            is_best = recalls[1] > best_recall5
            best_recall5 = max(recalls[1], best_recall5)
            if is_main:  # rank-0 checkpointing (shared-FS safe)
                save_checkpoint(
                    osp.join(cfg.logs_dir, f"checkpoint{gen}_{epoch}.npz"),
                    {"params": params, "opt_state": opt_state,
                     "teacher": teacher, "neg_cache": sampler.neg_cache},
                    {"epoch": epoch, "generation": gen,
                     "best_recall5": float(best_recall5)},
                    is_best=is_best,
                )
            if verbose:
                print(f" * gen {gen} epoch {epoch} recall@1/5/10: "
                      f"{recalls[0]:.1%}/{recalls[1]:.1%}/{recalls[2]:.1%}"
                      f"{' *' if is_best else ''}")

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("openibl:sfrs_ckpt_final")
    best_path = osp.join(cfg.logs_dir, "model_best.npz")
    if osp.isfile(best_path):
        loaded, _ = load_checkpoint(best_path, {"params": params})
        params = loaded["params"]
    recalls = finalize_with_pca(cfg, dataset, sources, model, params,
                                mesh=mesh, verbose=verbose)
    return params, recalls


# ---------------------------------------------------------------------------
# evaluation entry
# ---------------------------------------------------------------------------

def run_eval(cfg, mesh=None, train_cfg=None, verbose=True):
    """Checkpoint evaluation with optional PCA reduction / rerank / NMS
    (reference examples/test.py:77-133)."""
    dataset = load_dataset(cfg)
    # uint8 to the device (4x less H2D over the slow tunnel); the model
    # normalizes on chip from raw pixels (vgg16_apply dtype branch), same as
    # make_sources and the PCA-fit source below
    test_tf = TestTransform(cfg.data.height, cfg.data.width,
                            tokyo=(cfg.data.dataset == "tokyo"),
                            device_normalize=True)
    fixed_tf = TestTransform(cfg.data.height, cfg.data.width,
                             device_normalize=True)
    q_src = ImageSource(dataset.q_test, dataset.images_dir, test_tf)
    db_src = ImageSource(dataset.db_test, dataset.images_dir, fixed_tf)

    feature = "vlad" if getattr(cfg, "use_vlad", True) else "pool"
    # honor the training compute dtype + fused-head selection for the
    # rebuilt model — a bf16-trained checkpoint must also evaluate in bf16
    # for perf parity of this entry
    base = models.create(
        getattr(cfg, "arch", "vgg16"),
        compute_dtype=jnp.bfloat16
        if getattr(cfg, "compute_dtype", "float32") == "bfloat16"
        else jnp.float32,
    )
    nv = models.NetVLAD(num_clusters=cfg.num_clusters)
    model = models.create("embednet", base=base, net_vlad=nv)
    model = eval_view(model)
    params = model.init(jax.random.PRNGKey(0))
    if cfg.checkpoint:
        if cfg.checkpoint.endswith((".pth", ".pth.tar")):
            from openibl_tpu.models import convert

            # weights-only load with a numpy-scalar allowlist fallback for
            # reference full training checkpoints; never pickle execution
            state = convert.load_torch_checkpoint(cfg.checkpoint)
            if isinstance(state, dict) and "state_dict" in state:
                state = state["state_dict"]
            params = convert.embednet_params_from_torch(state)
        else:
            loaded, _ = load_checkpoint(cfg.checkpoint, {"params": params})
            params = loaded["params"]

    pca = None
    if cfg.reduction:
        # default params path matches both our trainer's finalize_with_pca
        # output and the reference convention (test.py:109:
        # pca_params_<checkpoint stem>.h5 next to the checkpoint)
        ckpt_stem = osp.basename(cfg.checkpoint).split(".")[0] or "model"
        pca_path = cfg.pca_params or osp.join(
            osp.dirname(cfg.checkpoint) or ".", f"pca_params_{ckpt_stem}.h5"
        )
        pca = pca_ops.PCA(cfg.pca_dim, whiten=getattr(cfg, "whiten", True),
                          params_path=pca_path)
        if not osp.isfile(pca_path):
            # compute PCA on demand. The reference fits on Pitts30k-train
            # regardless of the eval dataset (test.py:36-41,112-119) so the
            # whitening basis matches every published row; keep that rule for
            # the reference's datasets, and stay self-contained for custom
            # ones (override with pca_dataset/pca_scale either way).
            src_name = getattr(cfg, "pca_dataset", None) or (
                "pitts" if cfg.data.dataset in ("pitts", "tokyo")
                else cfg.data.dataset
            )
            src_scale = getattr(cfg, "pca_scale", None) or (
                "30k" if src_name == "pitts" else cfg.data.scale
            )
            kwargs = {"scale": src_scale} if src_name == "pitts" else {}
            pca_ds = datasets.create(
                src_name, osp.join(cfg.data.data_dir, src_name), **kwargs
            )
            items = sorted(set(pca_ds.q_train) | set(pca_ds.db_train))
            src = ImageSource(items, pca_ds.images_dir,
                              TestTransform(cfg.data.height, cfg.data.width,
                                            device_normalize=True))
            feats = extract_features_sharded(
                model.apply, params, src,
                batch_size=cfg.data.test_batch_size, mesh=mesh,
                feature=feature, prefetch=cfg.data.workers,
            )
            pca = _train_pca(feats, cfg.pca_dim,
                             getattr(cfg, "whiten", True), pca_path,
                             getattr(cfg, "seed", 0))

    bs = cfg.data.test_batch_size
    pf = cfg.data.workers
    gallery_pids = [it[1] for it in dataset.db_test]
    # rank-0 printing in multi-process runs (every process computes the
    # identical recalls; the reference gates on args.rank==0, test.py)
    show = verbose and jax.process_index() == 0
    eval_kwargs = dict(
        gallery_pids=gallery_pids, pca=pca, nms=cfg.nms, rerank=cfg.rerank,
        rr_topk=cfg.rr_topk, lambda_value=cfg.lambda_value, verbose=show,
        print_results=show,
    )
    if cfg.data.dataset == "tokyo":
        # variable query sizes: bucket-pad to one static shape per
        # orientation and run the masked forward — one (or two) jit
        # specializations total, exact per-image results, and the fixed
        # shapes keep the batches mesh-shardable (the reference instead
        # distributes batch-1 per-shape queries, examples/test.py:44-48)
        from openibl_tpu.data.loader import PaddedBatchLoader

        q_loader = PaddedBatchLoader(q_src, batch_size=bs, prefetch=pf)
        if jax.process_count() == 1:
            evaluator = Evaluator(model.apply, mesh=mesh, feature=feature,
                                  masked_apply_fn=model.apply_masked)
            return evaluator.evaluate(
                params, q_loader, BatchLoader(db_src, batch_size=bs,
                                              prefetch=pf),
                dataset.test_pos, **eval_kwargs,
            )
        # multi-host: the masked query path's bucket emission order can't be
        # positionally reassembled across hosts, and the query set is tiny —
        # extract queries replicated on each process's sub-mesh and shard the
        # (large, fixed-shape) gallery across hosts
        from openibl_tpu.engine.evaluator import evaluate_descriptors
        from openibl_tpu.parallel.mesh import (
            local_view_tree, process_local_mesh,
        )

        lmesh = process_local_mesh(mesh) if mesh is not None else None
        q_feats = extract_features(
            model.apply, local_view_tree(params), q_loader, mesh=lmesh,
            pca=pca, feature=feature, verbose=show,
            masked_apply_fn=model.apply_masked,
        )
        g_feats = extract_features_sharded(
            model.apply, params, db_src, batch_size=bs, mesh=mesh, pca=pca,
            feature=feature, verbose=show, prefetch=pf,
        )
        return evaluate_descriptors(
            q_feats, g_feats, dataset.test_pos, gallery_pids=gallery_pids,
            nms=cfg.nms, rerank=cfg.rerank, rr_topk=cfg.rr_topk,
            lambda_value=cfg.lambda_value, mesh=mesh, print_results=show,
        )
    # fixed-shape path: sharded across hosts in multi-process runs (each
    # host extracts a contiguous slice; single-process is one mesh pass)
    evaluator = Evaluator(model.apply, mesh=mesh, feature=feature)
    return evaluator.evaluate_sources(
        params, q_src, db_src, dataset.test_pos,
        batch_size=bs, prefetch=pf, **eval_kwargs,
    )
