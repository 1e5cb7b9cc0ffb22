"""Fused ADC tile scoring as a Pallas TPU kernel (ops/pq.py's hot loop).

Why: pq_search's XLA formulation must MATERIALIZE the one-hot expansion of
each code tile as a dot operand in HBM (matmul operands can't fuse), so the
exhaustive-ADC scan reads ~2·ksub bytes of one-hot per code byte — the
documented reason PQ loses to the exact f32 scan on per-query latency at
gallery sizes where full-width fits (ops/pq.py:pq_search docstring). This
kernel builds the one-hot IN VMEM (an iota compare — the probe for exactly
this pattern is scripts/mosaic_probe.py:probe_onehot_dot) and feeds the MXU
directly, so HBM traffic drops to the raw code bytes + the tiny LUT:
~2·ksub x less (512x at ksub=256, bf16). That flips the cost model — the
ADC scan reads m bytes/row vs the exact scan's D·dtype bytes/row (256x less
at D=4096, m=64, f32), so PQ becomes a LATENCY win, not just a capacity
win.

Shape story per grid step (one code tile):
    lut   (m, Q, ksub) f32, VMEM-resident for the whole call
    codes (m, T) int8/int32 — the tile, transposed so subspace j is a
          STATIC sublane slice (the m loop unrolls; lane-dim dynamic
          slicing is a known Mosaic gap, CLAUDE.md)
    for j in 0..m-1 (unrolled):
        oh  = (iota(T, ksub) == codes[j][:, None])      (VPU, in VMEM)
        acc += lut[j] @ oh^T      (Q, ksub) x (ksub, T)  (MXU)
    out (Q, T) f32 ADC distances

The kernel scores ONE tile; the streaming top-k merge stays in XLA
(ops/pq.py:pq_search(kernel=True) calls this per lax.scan step — top-k
selection is exactly what Mosaic does worst and XLA does well). Forward
only (search path; nothing here needs gradients).

No reference counterpart (the reference has no quantized index at all);
the method is Jegou et al. TPAMI 2011 ADC with the lookup-accumulation
recast for the MXU.

CHIP VERDICT (this toolchain, logs/tpu_collect_r05/pq_kernel_chip.json):
ruled out — the serving-shape kernel fails to lower (remote compile
helper exit 1) and mosaic_probe p7 shows the core in-VMEM one-hot→dot
pattern returns wrong values even at toy shapes, so pq_search never
selects this kernel by default. It stays correct under interpret mode
(pinned to the float ADC oracle, tests/test_pq.py) for toolchains whose
Mosaic passes scripts/pq_kernel_bench.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lut_ref, codes_ref, out_ref, *, m, ksub, compute_dtype):
    q = lut_ref.shape[1]
    t = codes_ref.shape[1]
    acc = jnp.zeros((q, t), jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, ksub), 1)
    for j in range(m):  # static unroll: lane-dim dynamic slicing won't lower
        code_j = codes_ref[j].astype(jnp.int32)  # (T,)
        oh = (cols == code_j[:, None]).astype(compute_dtype)  # (T, ksub)
        acc = acc + jax.lax.dot_general(
            lut_ref[j].astype(compute_dtype), oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, T)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("precise", "interpret"))
def adc_tile(lut, codes_t, precise=False, interpret=False):
    """ADC-score one code tile: (m, Q, ksub) LUT x (m, T) codes -> (Q, T).

    ``lut[j, q, c] = ||q_j - codebook[j, c]||²`` (ops/pq.py builds it);
    ``codes_t`` is the tile TRANSPOSED (subspace-major). ``precise`` runs
    the in-VMEM one-hot and LUT in f32 (bit-comparable to the float ADC
    oracle); default bf16 matches pq_search's default rounding story (the
    one-hot is exactly 0/1 in either dtype — only the LUT entries round).
    """
    m, q, ksub = lut.shape
    t = codes_t.shape[1]
    kernel = functools.partial(
        _kernel, m=m, ksub=ksub,
        compute_dtype=jnp.float32 if precise else jnp.bfloat16,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((m, q, ksub), lambda: (0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((m, t), lambda: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, t), lambda: (0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, t), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * ksub * t * m,
            # the point of the kernel: HBM sees the codes + LUT + output,
            # never the (T, m·ksub) one-hot
            bytes_accessed=m * t * 4 + m * q * ksub * 4 + q * t * 4,
            transcendentals=0,
        ),
    )(lut, codes_t)


# VMEM working set: LUT (m,Q,ksub) f32 + one-hot (T,ksub) + acc/out (Q,T)
# f32 + codes (m,T) i32, plus Mosaic temporaries. 12 MB keeps the same
# headroom policy as ops/netvlad_kernel.py; past it (huge query batches)
# the XLA formulation takes over rather than an opaque Mosaic error.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fused_vmem_bytes(m, q, ksub, t, precise=False):
    el = 4 if precise else 2
    return (4 * m * q * ksub   # LUT (held across the unrolled loop)
            + el * (t * ksub + q * ksub)  # one-hot + cast LUT slice
            + 4 * 2 * q * t    # acc + out
            + 4 * m * t)       # codes as i32


def adc_tile_fits(m, q, ksub, t, precise=False):
    return fused_vmem_bytes(m, q, ksub, t, precise) <= _VMEM_BUDGET_BYTES
