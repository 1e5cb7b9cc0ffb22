"""SFRS trainer: generational self-distillation with region similarities.

TPU-native redesign of the reference SFRSTrainer + generation loop
(/root/reference/ibl/trainers.py:165-320, examples/netvlad_img_sfrs.py:177-231):

  * student + teacher param trees; per generation the teacher snapshots the
    student and the student re-initializes (backbone from pretrained weights,
    NetVLAD from centroids) with a fresh optimizer;
  * one jitted step takes the easy tuple (anchor, pos, neg_num negatives) and
    the diff tuple (anchor, pos_num difficult positives) and computes
    hard loss (gen0: global descriptors; gen>=1: hardest-of-9-regions
    negatives) + lambda_soft * soft distillation CE;
  * generation-dependent code paths (gen0 vs gen>=1, teacher temperature) are
    baked in statically — one compile per generation, 4 total.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openibl_tpu.ops.losses import sfrs_hard_loss, sfrs_soft_loss
from openibl_tpu.engine.trainer import (
    MeshBatchMixin,
    make_optimizer,
    set_learning_rate,
    steplr,
)
from openibl_tpu.parallel.mesh import data_sharding, global_batch, replicated

DEFAULT_TEMPS = (0.07, 0.07, 0.06, 0.05)  # scripts/train_sfrs_dist.sh:27


class SFRSTrainer(MeshBatchMixin):
    def __init__(self, model, loss_type="sare_ind", margin=np.sqrt(0.1),
                 temps=DEFAULT_TEMPS, soft_weight=0.5, neg_num=10,
                 lr=1e-3, momentum=0.9, weight_decay=1e-3, mesh=None,
                 remat=False, device_jitter=False,
                 jitter_params=(0.7, 0.7, 0.7, 0.5)):
        self.model = model  # EmbedRegionNet
        self.remat = remat
        # on-device ColorJitter: the step takes the RAW (T, 2+neg+pos) tuple
        # plus a key, jitters once, then splits — student and teacher see the
        # same augmented pixels, like the reference's loader-jittered tensors
        self.device_jitter = device_jitter
        self.jitter_params = tuple(jitter_params)
        self.loss_type = loss_type
        self.margin = float(margin)
        self.temps = tuple(temps)
        self.soft_weight = soft_weight
        self.neg_num = neg_num
        self.base_lr = lr
        self.mesh = mesh
        self._tx_factory = lambda mask: make_optimizer(
            lr, momentum, weight_decay, mask
        )
        self.tx = None
        self._steps = {}
        # (host_tree, leaf_ids, globalized_tree): the teacher changes once
        # per generation but train_epoch runs once per subset — without the
        # cache every subset would re-broadcast the full teacher over
        # H2D+DCN in multi-host runs
        self._teacher_cache = None

    def init_generation(self, params):
        """Fresh optimizer per generation (netvlad_img_sfrs.py:183-185)."""
        mask = None
        if hasattr(self.model, "trainable_mask"):
            mask = self.model.trainable_mask(params)
        self.tx = self._tx_factory(mask)
        return self.tx.init(params)

    def _loss_fn(self, params, teacher_params, easy, diff, gen, lambda_soft):
        t, ge = easy.shape[:2]
        flat = lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
        # one student forward over the union of both tuple views: the anchor
        # (easy[:,0] == diff[:,0]) is deduplicated and the 22-image batch
        # utilizes the MXU better than two 12/11-image launches (the
        # reference runs three separate forwards, trainers.py:235-245)
        union = jnp.concatenate([easy, diff[:, 1:]], axis=1)
        region_fn = self.model.region_descriptors
        if self.remat:
            region_fn = jax.checkpoint(region_fn)
        regions = region_fn(params, flat(union))
        l = regions.shape[-1]
        regions = regions.reshape(t, -1, 9, l)
        vlad_a = regions[:, :1]  # (T, 1, 9, L) anchors
        vlad_p = regions[:, 1:ge]  # (T, 1+neg, 9, L) easy pairs
        r_diff = regions[:, ge:]  # (T, pos, 9, L) difficult positives
        sim_easy = jnp.einsum(
            "txil,tpjl->tpij", vlad_a, vlad_p,
            preferred_element_type=jnp.float32,
        )
        sim_diff = jnp.einsum(
            "txil,tpjl->tpij", vlad_a, r_diff,
            preferred_element_type=jnp.float32,
        )
        sim_teacher, _, _ = jax.lax.stop_gradient(
            self.model.apply_train(teacher_params, flat(diff))
        )
        loss_hard = sfrs_hard_loss(
            vlad_a, vlad_p, sim_easy, self.loss_type,
            self.temps[0], self.margin, gen,
        )
        loss_soft = sfrs_soft_loss(
            sim_diff, sim_teacher, self.temps[0], self.temps[gen]
        )
        return loss_hard + lambda_soft * loss_soft, (loss_hard, loss_soft)

    def _build_step(self, gen, lambda_soft):
        def update(params, teacher_params, opt_state, easy, diff):
            (loss, (lh, ls)), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(params, teacher_params, easy, diff, gen, lambda_soft)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, lh, ls

        if self.device_jitter:
            from openibl_tpu.engine.trainer import device_jitter_batch

            def step(params, teacher_params, opt_state, images, key):
                t = images.shape[0]
                flat = images.reshape((-1,) + images.shape[2:])
                jit_imgs = device_jitter_batch(flat, key, self.jitter_params)
                images = jit_imgs.reshape((t, -1) + jit_imgs.shape[1:])
                easy, diff = self.split_tuple_images(images)
                return update(params, teacher_params, opt_state, easy, diff)
        else:
            step = update

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0, 2))
        rep = replicated(self.mesh)
        ds = data_sharding(self.mesh, 5)
        in_shardings = (
            (rep, rep, rep, ds, rep) if self.device_jitter
            else (rep, rep, rep, ds, ds)
        )
        return jax.jit(
            step,
            in_shardings=in_shardings,
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 2),
        )

    def step_fn(self, gen):
        """Per-generation jitted step (gen0 disables the soft loss,
        netvlad_img_sfrs.py:212)."""
        if not 0 <= gen < len(self.temps):
            raise ValueError(
                f"generation {gen} has no teacher temperature: temps has "
                f"{len(self.temps)} entries — pass one per generation "
                f"(reference default {DEFAULT_TEMPS})"
            )
        lam = self.soft_weight if gen > 0 else 0.0
        key = (gen, lam)
        if key not in self._steps:
            self._steps[key] = self._build_step(gen, lam)
        return self._steps[key]

    def set_epoch_lr(self, opt_state, epoch, step_size, gamma=0.5):
        return set_learning_rate(
            opt_state, steplr(self.base_lr, epoch, step_size, gamma)
        )

    def split_tuple_images(self, images, xp=jnp):
        """(T, 2+neg+pos, H, W, 3) → easy (T, 2+neg), diff (T, 1+pos) views
        (reference _parse_data, trainers.py:228-233). Pass ``xp=np`` to split
        on host before building per-part multi-host global arrays."""
        easy = images[:, : self.neg_num + 2]
        diff = xp.concatenate(
            [images[:, :1], images[:, self.neg_num + 2 :]], axis=1
        )
        return easy, diff

    def train_epoch(self, params, teacher_params, opt_state, tuple_loader,
                    gen, print_freq=10, log_prefix="", rng_key=None):
        from openibl_tpu.utils import AverageMeter
        import time

        if self.device_jitter and rng_key is None:
            raise ValueError("device_jitter training needs rng_key")
        if self.mesh is not None:
            from openibl_tpu.parallel.mesh import globalize_tree

            params = globalize_tree(self.mesh, params)
            # cache contract: the teacher tree must be REBOUND when it
            # changes (the pipeline produces it via copy_tree once per
            # generation), never mutated in place. The leaf-id tuple also
            # invalidates on in-place dict-level swaps (ADVICE r3) — jax
            # arrays themselves are immutable, so leaf identity pins value
            # identity.
            cache = self._teacher_cache
            leaves = tuple(jax.tree.leaves(teacher_params))
            # the cache HOLDS the leaf tuple (not just ids): pinning the
            # objects makes the element-identity comparison sound — bare
            # id()s of unreferenced leaves can collide via CPython address
            # reuse after an in-place dict-level swap
            if (cache is not None and cache[0] is teacher_params
                    and len(cache[1]) == len(leaves)
                    and all(a is b for a, b in zip(cache[1], leaves))):
                teacher_params = cache[2]
            else:
                globalized = globalize_tree(self.mesh, teacher_params)
                self._teacher_cache = (teacher_params, leaves, globalized)
                teacher_params = globalized
            opt_state = globalize_tree(self.mesh, opt_state)
        step = self.step_fn(gen)
        l_hard, l_soft, batch_time = AverageMeter(), AverageMeter(), AverageMeter()
        end = time.time()
        for i, images in enumerate(tuple_loader):
            if self.device_jitter:
                params, opt_state, lh, ls = step(
                    params, teacher_params, opt_state,
                    self._device_batch(images),
                    self._device_key(jax.random.fold_in(rng_key, i)),
                )
            else:
                # split on host: in multi-host runs each part is assembled
                # into its own global sharded array
                easy, diff = self.split_tuple_images(np.asarray(images),
                                                     xp=np)
                params, opt_state, lh, ls = step(
                    params, teacher_params, opt_state,
                    self._device_batch(easy), self._device_batch(diff)
                )
            l_hard.update(float(lh))
            l_soft.update(float(ls))
            batch_time.update(time.time() - end)
            end = time.time()
            if (i + 1) % print_freq == 0 and jax.process_index() == 0:
                print(
                    f"{log_prefix}[{i + 1}/{len(tuple_loader)}] "
                    f"Time {batch_time.val:.3f} ({batch_time.avg:.3f}) "
                    f"Loss_hard {l_hard.val:.3f} ({l_hard.avg:.3f}) "
                    f"Loss_soft {l_soft.val:.3f} ({l_soft.avg:.3f})"
                )
        return params, opt_state, (l_hard.avg, l_soft.avg)
