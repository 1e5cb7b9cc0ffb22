"""First-layer 3x3 conv (3→64 channels) + bias + ReLU as a Pallas TPU kernel.

Why: XLA:TPU's conv for a 3-channel input pads the contraction to full lane
width, inflating the effective input read ~40x; measured on-chip the layer
runs at 4.9 TF/s and 27.5 ms of a 169 ms bs-128 forward — 16% of the model
for 0.9% of its FLOPs (scripts/profile_backbone.py). Space-to-depth and
XLA-level im2col rewrites were measured slower (the reshuffle traffic eats
the gain). This kernel streams row bands of the image through VMEM, builds
the 27-wide patch matrix on-chip and hits the MXU once per band — HBM
traffic drops to the irreducible input read + output write.

The kernel computes exactly lax.conv_general_dilated(x, w, (1,1), "SAME")
+ b with ReLU (reference conv1_1: torchvision features[0:2] as used by
/root/reference/ibl/models/vgg.py:28-45), in bf16 with f32 accumulation.
Forward-only: a custom_vjp routes gradients through the identical XLA path
(conv1_1 is frozen under the default train_layers='conv5' regardless —
reference vgg.py:20-26).

STATUS: wired into models/vgg.py behind ``VGG16(fused_conv1=True)``
(default OFF). Interpret-mode parity is pinned in tests; real-MXU lowering
is unverified — the patch concat is a sub-lane-tile concat on the lane dim,
which this Mosaic toolchain has rejected in other forms (CLAUDE.md). The
on-chip verdict comes from scripts/mosaic_probe.py + ``bench.py --metric
extract --fused-conv1`` (collector task); flip the default only if both
pass and the bench shows a gain.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def _kernel(x_ref, w_ref, b_ref, out_ref, *, band, width):
    """One (band, width) output tile from the zero-padded image resident in
    VMEM. x_ref: (1, H+2, W+2, C); out: (1, band, W, 64)."""
    b_idx = pl.program_id(1)
    slab = x_ref[0, pl.ds(b_idx * band, band + 2), :, :]  # (band+2, W+2, C)
    patches = jnp.concatenate(
        [
            slab[u : u + band, v : v + width, :]
            for u in range(3)
            for v in range(3)
        ],
        axis=-1,
    )  # (band, W, 9C)
    c9 = patches.shape[-1]
    y = jax.lax.dot_general(
        patches.reshape(band * width, c9),
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b_ref[:].astype(jnp.float32), 0)
    out_ref[0] = y.reshape(band, width, -1).astype(out_ref.dtype)


def _pick_band(h):
    """Largest row-band size in [8, 32] dividing H; None = unsupported."""
    if h <= 64:
        return h
    for band in range(32, 7, -1):
        if h % band == 0:
            return band
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv1_fused(x, w, b, interpret):
    n, h, width, c = x.shape
    cout = w.shape[3]
    band = _pick_band(h)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # patch-major weight layout matching the kernel's concat order (u, v, c)
    wk = w.reshape(9 * c, cout)
    kernel = functools.partial(_kernel, band=band, width=width)
    return pl.pallas_call(
        kernel,
        grid=(n, h // band),
        in_specs=[
            pl.BlockSpec((1, h + 2, width + 2, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((9 * c, cout), lambda i, j: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i, j: (0,),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, band, width, cout),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, width, cout), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * width * 9 * c * cout,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * h * width * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wk, b)


def _xla_path(x, w, b):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME", dimension_numbers=_CONV_DN
    ) + b.astype(x.dtype)
    return jnp.maximum(y, 0)


def _fwd(x, w, b, interpret):
    return _conv1_fused(x, w, b, interpret), (x, w, b)


def _bwd(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_xla_path, x, w, b)
    return vjp(g)


_conv1_fused.defvjp(_fwd, _bwd)


def conv1_relu(x, w, b, *, interpret=None):
    """3x3 SAME conv + bias + ReLU for small input channel counts.

    Uses the Pallas kernel on TPU when the height admits a band split and
    the image fits the VMEM budget; falls back to the XLA conv otherwise
    (and everywhere off-TPU unless ``interpret`` is forced for tests).
    """
    n, h, width, c = x.shape
    if interpret is None:
        if jax.default_backend() != "tpu":
            return _xla_path(x, w, b)
        interpret = False
    band = _pick_band(h)
    # VMEM budget: padded image + f32 band accumulator + patches (~x2 slack)
    img_bytes = (h + 2) * (width + 2) * c * x.dtype.itemsize
    band_bytes = (band or 0) * width * (w.shape[3] * 4 + 9 * c * 2) * 2
    if band is None or img_bytes + band_bytes > 12 * 1024 * 1024:
        return _xla_path(x, w, b)
    return _conv1_fused(x, w.astype(x.dtype), b, bool(interpret))
