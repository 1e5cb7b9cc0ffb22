"""Post-training int8 quantization for the VGG16 backbone (inference only).

TPU v5e's MXU runs int8 x int8 -> int32 at ~2x its bf16 rate. The on-chip
probe (scripts/int8_probe.py, 2026-08-19) shows XLA lowers int8
``lax.conv_general_dilated`` onto that path with a real net win at the
layer shapes that dominate VGG16 forward FLOPs — 1.38x (conv2_2), 1.32x
(conv3_2), 1.24x (conv4_2) over bf16 *including* the per-layer requantize —
while the bandwidth-bound conv1 block gains nothing (0.97x). So the
quantized forward is mixed-precision: conv1_1..conv1_2 stay bf16 and
everything from ``quant_from`` (default conv2_1) runs int8.

Scheme (standard symmetric PTQ, no reference analog — the reference stack
is fp32-only, /root/reference/ibl/models/vgg.py):
  * weights: per-output-channel symmetric int8, scale sw[o] = amax_o / 127;
  * activations: per-tensor symmetric int8, scale sx = amax / 127 from a
    one-batch calibration forward (post-ReLU tensors use the [0, 127] half);
  * each quantized conv accumulates in int32, then folds
    dequant + bias + ReLU + next-layer requant into ONE elementwise op:
        yq = clip(round(acc * m_o + bq_o), 0, 127),  m = sx*sw/sx_next,
    so between MXU convs there is a single VPU pass over the activations;
  * max-pool runs directly on int8 (max is monotone, scales pass through);
  * the final conv5_3 (no ReLU) dequantizes to float for the NetVLAD head,
    which stays in the normal f32-fidelity path.

This is an inference-time transform of trained f32 params; training is
untouched. Descriptor fidelity is gated in tests/test_quant.py.
"""

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from openibl_tpu.models.vgg import VGG16_LAYERS, _extent_mask

_CONV_DN = ("NHWC", "HWIO", "NHWC")
_INT8_MIN = -128


def _layer_names():
    return [l[0] for l in VGG16_LAYERS]


def calibrate_vgg16(params, images, *, quant_from: str = "conv2_1"):
    """Per-layer input amax for every quantized conv, from one f32 forward.

    Args:
      params: trained f32 VGG16 param tree.
      images: (N, H, W, 3) calibration batch (preprocessed float or uint8
        raw pixels, same contract as vgg16_apply).

    Returns:
      {layer_name: float amax-of-input} for layers >= quant_from. The
      conv5_3 *output* needs no scale — it is dequantized, not requantized.
    """
    names = _layer_names()
    start = names.index(quant_from)

    def fwd(params, images):
        if images.dtype == jnp.uint8:
            from openibl_tpu.data.transforms import PIXEL_MEAN

            images = images.astype(jnp.float32) - jnp.asarray(
                PIXEL_MEAN, jnp.float32
            )
        x = images.astype(jnp.float32)
        amax = {}
        for i, (name, _, _, relu, pool) in enumerate(VGG16_LAYERS):
            if i >= start:
                amax[name] = jnp.max(jnp.abs(x))
            p = params[name]
            x = lax.conv_general_dilated(
                x, p["w"], (1, 1), "SAME", dimension_numbers=_CONV_DN
            ) + p["b"]
            if relu:
                x = jnp.maximum(x, 0)
            if pool:
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return amax

    amax = jax.jit(fwd)(params, images)
    return {k: float(v) for k, v in amax.items()}


def quantize_vgg16(
    params,
    calib_images,
    *,
    quant_from: str = "conv2_1",
    act_amax: Dict[str, float] = None,
):
    """Trained f32 VGG16 params -> mixed bf16/int8 inference param tree.

    Layers before ``quant_from`` keep their f32 weights (cast to the compute
    dtype at apply time, exactly like the normal path). Layers from
    ``quant_from`` on carry:
      wq   (3, 3, cin, cout) int8   per-output-channel quantized weights
      m    (cout,) f32              acc -> next-layer-int8 multiplier
      bq   (cout,) f32              bias in next-layer int8 units
    and the last layer (conv5_3, dequantized output) instead carries:
      wq, sxsw (cout,) f32, b (cout,) f32.

    ``act_amax`` (from calibrate_vgg16) can be passed to skip calibration —
    e.g. to reuse scales measured on a larger batch.
    """
    names = _layer_names()
    start = names.index(quant_from)
    if act_amax is None:
        act_amax = calibrate_vgg16(params, calib_images, quant_from=quant_from)

    host = jax.tree.map(lambda a: jnp.asarray(a), params)
    qparams = {}
    sx = {
        name: max(act_amax[name], 1e-12) / 127.0
        for name in names[start:]
    }
    for i, (name, _, _, relu, _) in enumerate(VGG16_LAYERS):
        p = host[name]
        if i < start:
            qparams[name] = {"w": p["w"], "b": p["b"]}
            continue
        w = p["w"].astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        if i + 1 < len(names):
            s_next = sx[names[i + 1]]
            qparams[name] = {
                "wq": wq,
                "m": (sx[name] * sw / s_next).astype(jnp.float32),
                "bq": (p["b"].astype(jnp.float32) / s_next),
            }
        else:  # conv5_3: dequantize, keep float bias
            qparams[name] = {
                "wq": wq,
                "sxsw": (sx[name] * sw).astype(jnp.float32),
                "b": p["b"].astype(jnp.float32),
            }
    qparams["_meta"] = {
        "s_in": jnp.float32(sx[quant_from]),
    }
    return qparams


def vgg16_apply_int8(
    qparams,
    images,
    *,
    quant_from: str = "conv2_1",
    compute_dtype=jnp.bfloat16,
    cut_at_pooling: bool = False,
    valid_hw=None,
):
    """Mixed bf16/int8 forward; same contract as models.vgg.vgg16_apply.

    The bf16 prefix (layers before ``quant_from``) is byte-identical to the
    normal path; at the boundary activations are requantized once to int8
    and stay int8 through conv5_2 (one fused VPU pass between MXU convs);
    conv5_3 dequantizes to f32 for the head. valid_hw masking re-zeroes the
    pad region per layer exactly like the f32 path (int8 zeros are exact),
    so bucket-padded serving works unchanged.
    """
    if images.dtype == jnp.uint8:
        from openibl_tpu.data.transforms import PIXEL_MEAN

        images = images.astype(compute_dtype) - jnp.asarray(
            PIXEL_MEAN, compute_dtype
        )
    names = _layer_names()
    start = names.index(quant_from)

    x = images.astype(compute_dtype)
    hw = None if valid_hw is None else jnp.asarray(valid_hw, jnp.int32)
    if hw is not None:
        x = jnp.where(_extent_mask(hw, x.shape[1], x.shape[2]), x, 0)
    mask = None

    def remask(x, hw, mask):
        if mask is None:
            mask = _extent_mask(hw, x.shape[1], x.shape[2])
        return jnp.where(mask, x, jnp.zeros((), x.dtype)), mask

    quantized = False
    for i, (name, _, _, relu, pool) in enumerate(VGG16_LAYERS):
        p = qparams[name]
        if i == start:
            s_in = qparams["_meta"]["s_in"]
            x = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s_in), _INT8_MIN, 127
            ).astype(jnp.int8)
            quantized = True
        if not quantized:
            x = lax.conv_general_dilated(
                x, p["w"].astype(compute_dtype), (1, 1), "SAME",
                dimension_numbers=_CONV_DN,
            ) + p["b"].astype(compute_dtype)
            if relu:
                x = jnp.maximum(x, 0)
        else:
            acc = lax.conv_general_dilated(
                x, p["wq"], (1, 1), "SAME", dimension_numbers=_CONV_DN,
                preferred_element_type=jnp.int32,
            )
            if "m" in p:  # fused dequant+bias+ReLU/clamp+requant
                y = acc.astype(jnp.float32) * p["m"] + p["bq"]
                lo = 0 if relu else _INT8_MIN
                x = jnp.clip(jnp.round(y), lo, 127).astype(jnp.int8)
            else:  # conv5_3: dequantize for the head
                x = (acc.astype(jnp.float32) * p["sxsw"] + p["b"]).astype(
                    compute_dtype
                )
                if relu:
                    x = jnp.maximum(x, 0)
        if hw is not None:
            x, mask = remask(x, hw, mask)
        if pool:
            init = (
                jnp.asarray(jnp.iinfo(jnp.int8).min, jnp.int8)
                if x.dtype == jnp.int8
                else -jnp.inf
            )
            x = lax.reduce_window(
                x, init, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            if hw is not None:
                hw = hw // 2
                mask = _extent_mask(hw, x.shape[1], x.shape[2])
                x = jnp.where(mask, x, jnp.zeros((), x.dtype))
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


@dataclasses.dataclass(frozen=True)
class QuantVGG16:
    """Drop-in quantized backbone for EmbedNet/EmbedNetPCA composition.

    Usage:
        base = QuantVGG16()
        qtree = dict(params)                       # trained model params
        qtree["base"] = base.quantize(params["base"], calib_images)
        model = models.create("embednetpca", base=base, ...)
        desc = jax.jit(model.apply)(qtree, images)

    ``init`` deliberately raises: a quantized net is derived from trained
    f32 params, never initialized fresh.
    """

    quant_from: str = "conv2_1"
    compute_dtype: object = jnp.bfloat16
    cut_at_pooling: bool = False
    feature_dim: int = 512

    def init(self, rng):
        raise NotImplementedError(
            "QuantVGG16 wraps trained params: call "
            "QuantVGG16.quantize(f32_base_params, calib_images)"
        )

    def quantize(self, params, calib_images, act_amax=None):
        return quantize_vgg16(
            params, calib_images, quant_from=self.quant_from,
            act_amax=act_amax,
        )

    def apply(self, params, images):
        return vgg16_apply_int8(
            params, images, quant_from=self.quant_from,
            compute_dtype=self.compute_dtype,
            cut_at_pooling=self.cut_at_pooling,
        )

    def apply_masked(self, params, images, valid_hw):
        return vgg16_apply_int8(
            params, images, quant_from=self.quant_from,
            compute_dtype=self.compute_dtype,
            cut_at_pooling=self.cut_at_pooling, valid_hw=valid_hw,
        )

    def trainable_mask(self, params):
        raise NotImplementedError("QuantVGG16 is inference-only")


def quantize_model_params(model, params, calib_images, *, base=None):
    """Quantize the "base" subtree of an EmbedNet/EmbedNetPCA param tree.

    Returns (quant_model, quant_params): the same composite model with its
    backbone swapped for QuantVGG16 and the matching param tree. The VLAD /
    PCA subtrees are shared by reference (they stay f32)."""
    # propagate every behavior-bearing backbone field, not just the compute
    # dtype — a composite built with cut_at_pooling=True (or a nonstandard
    # feature_dim) must not silently change shape/behavior after
    # quantization (ADVICE r4)
    base = base or QuantVGG16(
        compute_dtype=getattr(model.base, "compute_dtype", jnp.bfloat16),
        cut_at_pooling=getattr(model.base, "cut_at_pooling", False),
        feature_dim=getattr(model.base, "feature_dim", 512),
    )
    qtree = dict(params)
    qtree["base"] = base.quantize(params["base"], calib_images)
    qmodel = dataclasses.replace(model, base=base)
    return qmodel, qtree


__all__ = [
    "QuantVGG16",
    "calibrate_vgg16",
    "quantize_vgg16",
    "vgg16_apply_int8",
    "quantize_model_params",
]
