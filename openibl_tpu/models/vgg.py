"""VGG16 convolutional backbone, TPU-native (NHWC, functional).

Re-implements the behavior of the reference backbone
(/root/reference/ibl/models/vgg.py:28-70): torchvision VGG16 ``features``
truncated by dropping the final ReLU + MaxPool, so the output is the raw
(un-activated) conv5_3 feature map, plus a global adaptive-max-pool vector.
Layers below ``train_layers`` are frozen (reference :20-26,50-53) — here
frozen-ness is expressed as an optax-compatible trainable mask, since params
are a pure pytree.

TPU-first choices: NHWC layout (XLA:TPU's native conv layout), conv via
``lax.conv_general_dilated`` feeding the MXU, optional bfloat16 compute with
float32 params.
"""

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (name, in_channels, out_channels, relu_after, pool_after)
# conv5_3 keeps no ReLU and no pool: the reference drops the trailing
# ReLU+MaxPool from torchvision's features (/root/reference/ibl/models/vgg.py:41-42).
VGG16_LAYERS = (
    ("conv1_1", 3, 64, True, False),
    ("conv1_2", 64, 64, True, True),
    ("conv2_1", 64, 128, True, False),
    ("conv2_2", 128, 128, True, True),
    ("conv3_1", 128, 256, True, False),
    ("conv3_2", 256, 256, True, False),
    ("conv3_3", 256, 256, True, True),
    ("conv4_1", 256, 512, True, False),
    ("conv4_2", 512, 512, True, False),
    ("conv4_3", 512, 512, True, True),
    ("conv5_1", 512, 512, True, False),
    ("conv5_2", 512, 512, True, False),
    ("conv5_3", 512, 512, False, False),
)

# First trainable conv per train_layers setting; everything before it is
# frozen (reference __fix_layers, /root/reference/ibl/models/vgg.py:20-26).
TRAIN_LAYERS_START = {
    "conv5": "conv5_1",
    "conv4": "conv4_1",
    "conv3": "conv3_1",
    "conv2": "conv2_1",
    "full": "conv1_1",
}

FEATURE_DIM = 512

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def init_vgg16_params(rng) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Kaiming-normal (fan_out) init, matching the reference's reset_params
    (/root/reference/ibl/models/vgg.py:72-80) for the untrained path."""
    params = {}
    keys = jax.random.split(rng, len(VGG16_LAYERS))
    for key, (name, cin, cout, _, _) in zip(keys, VGG16_LAYERS):
        fan_out = 3 * 3 * cout
        std = float(np.sqrt(2.0 / fan_out))
        params[name] = {
            "w": (jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * std),
            "b": jnp.zeros((cout,), jnp.float32),
        }
    return params


def _extent_mask(hw, h, w):
    """(N, 2) valid extents → (N, h, w, 1) boolean mask."""
    rows = jnp.arange(h)[None, :, None] < hw[:, 0][:, None, None]
    cols = jnp.arange(w)[None, None, :] < hw[:, 1][:, None, None]
    return (rows & cols)[..., None]


def vgg16_apply(
    params,
    images: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
    cut_at_pooling: bool = False,
    valid_hw=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass.

    Args:
      params: pytree from ``init_vgg16_params`` or the torch converter.
      images: (N, H, W, 3) preprocessed pixels (mean-subtracted, ~[-128,128]).
      valid_hw: optional (N, 2) int32 per-image valid (h, w) extents — images
        are zero-padded beyond them to a common static shape. Activations in
        the padded region are re-zeroed after every conv (the conv bias makes
        them non-zero otherwise), which makes every valid-region activation
        bit-identical to an unpadded run of that image: the zeros a conv sees
        beyond the valid extent are indistinguishable from the zeros SAME
        padding would supply at a true image boundary. One compiled program
        thus serves all aspect ratios exactly (Tokyo 24/7 queries; the
        reference instead runs batch-1 per shape, examples/test.py:44-46).

    Returns:
      (pool_x, feature_map): global max-pool vector (N, 512) and conv5_3 map
      (N, H/16, W/16, 512) — mirroring /root/reference/ibl/models/vgg.py:61-70.
      With ``cut_at_pooling`` returns only the feature map (reference :63-64).

    uint8 inputs are raw pixels: the preprocessing mean subtraction happens
    here on device (4x less host->device traffic than pre-normalized f32;
    numerically identical since pixels are integers). float inputs are
    assumed already normalized.
    """
    if images.dtype == jnp.uint8:
        from openibl_tpu.data.transforms import PIXEL_MEAN

        images = images.astype(compute_dtype) - jnp.asarray(
            PIXEL_MEAN, compute_dtype
        )
    x = images.astype(compute_dtype)
    hw = None if valid_hw is None else jnp.asarray(valid_hw, jnp.int32)
    if hw is not None:
        # zero out any padding garbage up front (loader pads with zeros, but
        # the mean subtraction above would have shifted uint8-path padding)
        x = jnp.where(_extent_mask(hw, x.shape[1], x.shape[2]), x, 0)
    mask = None
    for name, _, _, relu, pool in VGG16_LAYERS:
        p = params[name]
        # conv1_1 (C_in=3) runs ~3x its bandwidth floor on XLA:TPU (16% of
        # forward time for 0.9% of FLOPs) but stays on the XLA path: the
        # 2026-08-18 on-chip mosaic_probe showed the Pallas alternative does
        # not lower on this toolchain (stride-2 sublane pooling crashes the
        # Mosaic compile helper AND a lane-padded K=3 dot returns wrong
        # values) — measured verdict in docs/SCALING.md, probe in
        # scripts/mosaic_probe.py. s2d/im2col/NCHW/channel-pad rewrites all
        # measured slower (scripts/profile_backbone.py).
        x = lax.conv_general_dilated(
            x,
            p["w"].astype(compute_dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=_CONV_DN,
        )
        x = x + p["b"].astype(compute_dtype)
        if relu:
            x = jnp.maximum(x, 0)
        if hw is not None:
            if mask is None:
                mask = _extent_mask(hw, x.shape[1], x.shape[2])
            x = jnp.where(mask, x, 0)
        if pool:
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            if hw is not None:
                # VALID pooling floors the extent, exactly like torch's
                # MaxPool2d(2, 2) drops a trailing odd row/column. Re-zero
                # immediately: a window straddling the old extent leaves
                # non-zero values just outside the new one, and the next
                # conv's receptive field would pull them into valid outputs.
                hw = hw // 2
                mask = _extent_mask(hw, x.shape[1], x.shape[2])
                x = jnp.where(mask, x, 0)
    # keep the map in compute dtype: every consumer (NetVLAD XLA path, the
    # fused kernel, postprocess) upcasts to f32 itself, and an eager cast
    # here would round-trip an extra 314MB of HBM at bs=128 bf16
    if cut_at_pooling:
        return x
    if hw is not None:
        mask = _extent_mask(hw, x.shape[1], x.shape[2])
        pool_x = jnp.max(
            jnp.where(mask, x, -jnp.inf), axis=(1, 2)
        ).astype(jnp.float32)
        return pool_x, x
    pool_x = jnp.max(x, axis=(1, 2)).astype(jnp.float32)
    return pool_x, x


def trainable_mask(params, train_layers: str = "conv5"):
    """Boolean pytree: True where a param should receive gradients.

    The functional analog of the reference's ``requires_grad = False`` freeze
    (/root/reference/ibl/models/vgg.py:50-53); feed to ``optax.masked``.
    """
    start = TRAIN_LAYERS_START[train_layers]
    names = [l[0] for l in VGG16_LAYERS]
    start_i = names.index(start)
    mask = {}
    for i, name in enumerate(names):
        t = i >= start_i
        if name in params:
            mask[name] = {k: t for k in params[name]}
    return mask


@dataclasses.dataclass(frozen=True)
class VGG16:
    """Config-carrying wrapper so the model factory has a uniform surface."""

    train_layers: str = "conv5"
    cut_at_pooling: bool = False
    compute_dtype: object = jnp.float32
    feature_dim: int = FEATURE_DIM

    def init(self, rng):
        return init_vgg16_params(rng)

    def apply(self, params, images):
        return vgg16_apply(
            params,
            images,
            compute_dtype=self.compute_dtype,
            cut_at_pooling=self.cut_at_pooling,
        )

    def apply_masked(self, params, images, valid_hw):
        """Forward on bucket-padded images with per-image valid extents."""
        return vgg16_apply(
            params,
            images,
            compute_dtype=self.compute_dtype,
            cut_at_pooling=self.cut_at_pooling,
            valid_hw=valid_hw,
        )

    def trainable_mask(self, params):
        return trainable_mask(params, self.train_layers)
