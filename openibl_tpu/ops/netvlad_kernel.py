"""Fused NetVLAD aggregation as a Pallas TPU kernel.

The whole post-backbone descriptor head runs in one kernel per image, fully
VMEM-resident (reference math at /root/reference/ibl/models/netvlad.py:44-61
and :76-80). Measured value, honestly stated: 1.7x the XLA head in
isolation, but end-to-end extraction is conv-bound, so it buys ~0.5%
(766.6 vs 762.4 img/s, logs/bench_r02.json) — the extraction perf frontier
is the conv stack and input pipeline, not this head. It stays on because it
is strictly faster, costs nothing, and is the repo's worked example of the
Pallas pattern (VMEM-resident multi-matmul fusion) for ops where it WOULD
dominate:

    x (P, C)  -- conv5 feature map flattened over H*W
    1. row L2-normalize                      (VPU)
    2. logits = x @ assign_w   (P,C)@(C,K)   (MXU)
    3. row softmax                           (VPU)
    4. vlad = a^T @ x          (K,P)@(P,C)   (MXU)
       vlad -= colsum(a)[:,None] * centroids (VPU)
    5. intra-norm rows, global L2            (VPU)
    -> out (K*C,) final descriptor

Per-image VMEM at 480x640 input (P=1200, C=512, K=64): x 2.4 MB + a 0.3 MB +
vlad 128 KB — comfortably under the ~16 MB budget. Every intermediate
(logits, softmax, residuals) stays on-chip; the XLA path materializes them in
HBM between fusions.

The kernel is forward-only (used for extraction/eval); training uses the
XLA path (netvlad.netvlad_apply) which autodiffs. ``netvlad_fused`` carries a
custom_vjp that falls back to the XLA path's gradient so the fused op is
still safe to use under jax.grad.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, c_ref, out_ref, *, normalize_input, postprocess):
    x = x_ref[0].astype(jnp.float32)  # (P, C)
    if normalize_input:
        norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        x = x / jnp.maximum(norm, 1e-12)
    logits = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)  # (P, K)
    a = jax.nn.softmax(logits, axis=-1)
    vlad = jax.lax.dot_general(
        a, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, C) = a^T @ x
    a_sum = jnp.sum(a, axis=0)  # (K,)
    vlad = vlad - a_sum[:, None] * c_ref[:]
    if postprocess:
        intra = jnp.sqrt(jnp.sum(vlad * vlad, axis=1, keepdims=True))
        vlad = vlad / jnp.maximum(intra, 1e-12)
        glob = jnp.sqrt(jnp.sum(vlad * vlad))
        vlad = vlad / jnp.maximum(glob, 1e-12)
    out_ref[0] = vlad


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def _netvlad_fused(fmap, assign_w, centroids, normalize_input, postprocess,
                   interpret):
    n, h, w, c = fmap.shape
    k = assign_w.shape[1]
    p = h * w
    x = fmap.reshape(n, p, c)
    kernel = functools.partial(
        _kernel, normalize_input=normalize_input, postprocess=postprocess
    )
    vlad = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, p, c), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, c), lambda i: (i, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, c), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * p * c * k * 2,
            bytes_accessed=n * p * c * 4 + n * k * c * 4,
            transcendentals=n * p * k,
        ),
    )(x, assign_w, centroids)
    return vlad


def _xla_head(fmap, assign_w, centroids, normalize_input, postprocess):
    """The mathematically identical XLA head: provides this kernel's vjp AND
    the over-VMEM-budget fallback (one definition so the two can't drift)."""
    from openibl_tpu.models.netvlad import netvlad_apply, vlad_postprocess

    vlad = netvlad_apply(
        {"assign_w": assign_w, "centroids": centroids}, fmap,
        normalize_input=normalize_input,
    )
    if postprocess:
        n, k, c = vlad.shape
        vlad = vlad_postprocess(vlad).reshape(n, k, c)
    return vlad


def _fwd(fmap, assign_w, centroids, normalize_input, postprocess, interpret):
    out = _netvlad_fused(fmap, assign_w, centroids, normalize_input,
                         postprocess, interpret)
    return out, (fmap, assign_w, centroids)


def _bwd(normalize_input, postprocess, interpret, res, g):
    """Gradient via the (mathematically identical) XLA path."""
    fmap, assign_w, centroids = res

    def xla_path(fmap, assign_w, centroids):
        return _xla_head(fmap, assign_w, centroids, normalize_input,
                         postprocess)

    _, vjp = jax.vjp(xla_path, fmap, assign_w, centroids)
    return vjp(g)


_netvlad_fused.defvjp(_fwd, _bwd)


# Per-image VMEM bound for the fused kernel: x (P,C) in f32 plus its
# normalized copy, logits + softmax (P,K), weights/centroids/output (C,K /
# K,C x3). ~16 MB is the hardware budget; 12 MB leaves headroom for Mosaic's
# own temporaries. Over budget (large eval resolutions) the mathematically
# identical XLA head takes over instead of an opaque Mosaic compile error.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _fused_vmem_bytes(p, c, k):
    return 4 * (2 * p * c + 2 * p * k + 3 * k * c)


def netvlad_fused(fmap, assign_w, centroids, *, normalize_input=True,
                  postprocess=False, interpret=None):
    """Fused NetVLAD. Returns (N, K, C); with ``postprocess`` the result is
    already intra- + globally L2-normalized (reshape to (N, K*C) gives the
    final descriptor).

    ``interpret`` defaults to True off-TPU (CPU tests) and False on TPU.
    Images whose per-image working set exceeds the VMEM budget fall back to
    the XLA head (identical math — it already provides this kernel's vjp).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c = fmap.shape
    k = assign_w.shape[1]
    if not interpret and _fused_vmem_bytes(h * w, c, k) > _VMEM_BUDGET_BYTES:
        return _xla_head(fmap, assign_w, centroids, normalize_input,
                         postprocess)
    return _netvlad_fused(
        jnp.asarray(fmap), jnp.asarray(assign_w, jnp.float32),
        jnp.asarray(centroids, jnp.float32), normalize_input, postprocess,
        bool(interpret),
    )


def netvlad_descriptor_fused(params, fmap):
    """Drop-in for netvlad_apply + vlad_postprocess: (N, H, W, C) → (N, K*C)."""
    vlad = netvlad_fused(
        fmap, params["assign_w"], params["centroids"],
        normalize_input=True, postprocess=True,
    )
    n = vlad.shape[0]
    return vlad.reshape(n, -1)
