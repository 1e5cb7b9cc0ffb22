"""Baseline trainer: triplet / SARE with hard-negative mining, data-parallel.

TPU-native redesign of the reference Trainer + outer loop
(/root/reference/ibl/trainers.py:11-162, examples/netvlad_img.py:174-210):

  * one jitted train step: tuples (T, 2+neg, H, W, 3) sharded over the mesh's
    'data' axis, params replicated — XLA inserts the gradient psum that DDP's
    all-reduce performed (SURVEY.md §5);
  * optax SGD(momentum) + decoupled-as-in-torch L2 weight decay, masked by the
    backbone freeze (models.vgg.trainable_mask);
  * StepLR(gamma) via an injected learning-rate hyperparameter;
  * the mining pass reuses the evaluator's sharded extraction — the gallery
    descriptors stay HBM-resident between mining and training phases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openibl_tpu.ops.losses import tuple_loss
from openibl_tpu.parallel.mesh import (
    data_sharding, global_batch, globalize_tree, replicated,
)


def device_jitter_batch(images, key, jitter_params=(0.7, 0.7, 0.7, 0.5)):
    """(B, H, W, 3) raw 0..255 pixels → on-chip ColorJitter + mean
    subtraction; output is normalized float32 ready for the model's float
    path (the uint8 path's normalization happens in vgg16_apply instead)."""
    from openibl_tpu.data.transforms import PIXEL_MEAN
    from openibl_tpu.ops.augment import color_jitter_batch

    b, c, s, h = jitter_params
    out = color_jitter_batch(images, key, brightness=b, contrast=c,
                             saturation=s, hue=h)
    return out - jnp.asarray(PIXEL_MEAN, jnp.float32)


def make_optimizer(lr, momentum=0.9, weight_decay=1e-3, trainable_mask=None):
    """SGD matching torch.optim.SGD(lr, momentum, weight_decay): L2 penalty
    added to the gradient BEFORE the momentum buffer (netvlad_img.py:164-166).
    Frozen params receive no update at all (requires_grad filter)."""
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=lr)
    if trainable_mask is not None:
        # NB: optax.masked passes the complement's updates through UNCHANGED
        # (raw gradients would be applied to frozen params) — frozen leaves
        # must be explicitly zeroed.
        labels = jax.tree.map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def set_learning_rate(opt_state, lr):
    """StepLR: update the injected learning rate in the optimizer state.

    FUNCTIONAL: the input state is left untouched. The containers are
    rebuilt (flatten/unflatten shares the immutable leaf arrays but makes
    fresh dicts/NamedTuples), so a checkpoint snapshot taken before the LR
    change cannot see the post-decay rate through a shared hyperparams
    dict."""
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return True
        if isinstance(state, dict):
            # no short-circuit: EVERY injected LR must be updated when the
            # chain carries several (e.g. per-group inject_hyperparams)
            return any([visit(s) for s in state.values()])
        if isinstance(state, tuple):
            return any([visit(s) for s in state])
        found = False
        for attr in ("inner_state", "inner_states"):
            inner = getattr(state, attr, None)
            if inner is not None:
                found = visit(inner) or found
        return found

    if not visit(opt_state):
        raise ValueError("no injected learning_rate found in optimizer state")
    return opt_state


def steplr(base_lr, epoch, step_size, gamma=0.5):
    """torch StepLR schedule value at ``epoch``."""
    return base_lr * (gamma ** (epoch // step_size))


class MeshBatchMixin:
    """Multi-host batch/key placement shared by the trainers (expects a
    ``self.mesh`` attribute, None for single-process)."""

    def check_batch_shape(self, tuple_size):
        """Fail fast on a tuple batch the mesh can't shard."""
        if self.mesh is not None and tuple_size % self.mesh.size:
            raise ValueError(
                f"tuple_size={tuple_size} must be a multiple of the mesh "
                f"size ({self.mesh.size}) for data-parallel sharding"
            )

    def _device_batch(self, images):
        """Host rows → device batch. With a mesh this also assembles the
        multi-host global batch (each process passes its tuple-stream slice,
        data.sampler.shard_tuples)."""
        if self.mesh is None:
            return jnp.asarray(images)
        return global_batch(self.mesh, images)

    def _device_key(self, key):
        """Multi-host jits reject device arrays committed to one process's
        device; a host copy (identical on every process) is placed replicated
        by the jit's in_shardings. New-style typed PRNG keys
        (jax.random.key) are unwrapped to their raw data first —
        np.asarray on a key-dtype array raises."""
        if self.mesh is None or jax.process_count() == 1:
            return key
        if hasattr(key, "dtype") and jnp.issubdtype(key.dtype,
                                                    jax.dtypes.prng_key):
            key = jax.random.key_data(key)
        return np.asarray(key)


class Trainer(MeshBatchMixin):
    """Owns the jitted train step; state (params, opt_state) stays functional."""

    def __init__(self, model, loss_type="triplet", margin=np.sqrt(0.1),
                 lr=1e-3, momentum=0.9, weight_decay=1e-3, mesh=None,
                 use_pool_feature=False, remat=False, device_jitter=False,
                 jitter_params=(0.7, 0.7, 0.7, 0.5)):
        self.model = model
        self.loss_type = loss_type
        self.margin = float(margin)
        self.mesh = mesh
        self.use_pool_feature = use_pool_feature  # --vlad off path (C7 :70-80)
        # rematerialize the backbone forward in the backward pass: trades
        # ~1/3 more FLOPs for activation memory -> larger tuple batches
        self.remat = remat
        # on-device ColorJitter (ops/augment.py): the loader then feeds raw
        # resized uint8 and the step augments + normalizes on the chip
        self.device_jitter = device_jitter
        self.jitter_params = tuple(jitter_params)
        self.base_lr = lr
        self._tx_factory = lambda mask: make_optimizer(
            lr, momentum, weight_decay, mask
        )
        self.tx = None
        self._step = None

    def init(self, params):
        mask = None
        if hasattr(self.model, "trainable_mask"):
            mask = self.model.trainable_mask(params)
        self.tx = self._tx_factory(mask)
        opt_state = self.tx.init(params)
        self._step = self._build_step()
        return opt_state

    def _loss_fn(self, params, images, jitter_key=None):
        t, g = images.shape[:2]
        flat = images.reshape((t * g,) + images.shape[2:])
        if jitter_key is not None:
            flat = device_jitter_batch(flat, jitter_key, self.jitter_params)
        apply = self.model.apply
        if self.remat:
            apply = jax.checkpoint(apply)
        pool_x, vlad_x = apply(params, flat)
        # pool path trains on the RAW pool output like the reference
        # (trainers.py:70-80); normalization happens only at eval time
        # (extract_cnn_feature, evaluators.py:27-31)
        desc = pool_x if self.use_pool_feature else vlad_x
        desc = desc.reshape(t, g, -1)
        return tuple_loss(desc, self.loss_type, self.margin)

    def _build_step(self):
        def update(params, opt_state, images, key=None):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                params, images, jitter_key=key
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.device_jitter:
            step = update  # (params, opt_state, images, key)
        else:
            def step(params, opt_state, images):
                return update(params, opt_state, images)

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0, 1))
        rep = replicated(self.mesh)
        batch = data_sharding(self.mesh, 5)
        in_shardings = (
            (rep, rep, batch, rep) if self.device_jitter else (rep, rep, batch)
        )
        return jax.jit(
            step,
            in_shardings=in_shardings,
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )

    def step(self, params, opt_state, images, key=None):
        """One jitted update on a tuple batch (T, 2+neg, H, W, 3).

        With ``device_jitter`` the batch is raw resized pixels and ``key``
        drives the on-chip augmentation. Returns (params, opt_state, loss);
        params/opt_state are donated."""
        if self._step is None:
            raise RuntimeError("call init(params) before step()")
        if self.device_jitter:
            if key is None:
                raise ValueError("device_jitter trainer needs a PRNG key")
            return self._step(params, opt_state, self._device_batch(images),
                              self._device_key(key))
        return self._step(params, opt_state, self._device_batch(images))

    def set_epoch_lr(self, opt_state, epoch, step_size, gamma=0.5):
        return set_learning_rate(
            opt_state, steplr(self.base_lr, epoch, step_size, gamma)
        )

    def train_epoch(self, params, opt_state, tuple_loader, print_freq=10,
                    log_prefix="", rng_key=None):
        """One pass over the mined tuples. Returns (params, opt_state, avg).

        ``rng_key`` (required with device_jitter) seeds the per-step
        augmentation stream — fold it from (seed, epoch, subset) for
        reproducible, resume-faithful jitter."""
        from openibl_tpu.utils import AverageMeter
        import time

        if self.device_jitter and rng_key is None:
            raise ValueError("device_jitter training needs rng_key")
        if self.mesh is not None:
            # multi-host: init/resume/LR-mutated leaves become global arrays
            # (no-op single-process, no-op for already-global leaves)
            params = globalize_tree(self.mesh, params)
            opt_state = globalize_tree(self.mesh, opt_state)
        losses, batch_time = AverageMeter(), AverageMeter()
        end = time.time()
        for i, images in enumerate(tuple_loader):
            # through step(): one owner for the dispatch/key handling and
            # its init guard (a direct self._step call would raise an opaque
            # TypeError when init() was skipped)
            params, opt_state, loss = self.step(
                params, opt_state, images,
                key=(jax.random.fold_in(rng_key, i)
                     if self.device_jitter else None),
            )
            losses.update(float(loss))
            batch_time.update(time.time() - end)
            end = time.time()
            if (i + 1) % print_freq == 0 and jax.process_index() == 0:
                print(
                    f"{log_prefix}[{i + 1}/{len(tuple_loader)}] "
                    f"Time {batch_time.val:.3f} ({batch_time.avg:.3f}) "
                    f"Loss {losses.val:.3f} ({losses.avg:.3f})"
                )
        return params, opt_state, losses.avg
