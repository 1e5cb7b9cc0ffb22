"""Probe which Pallas/Mosaic patterns this toolchain lowers on the real TPU.

Hand tool (not CI). Each probe is a tiny pallas_call exercising one layout
pattern that a fused conv kernel would need; the output tells us which
first-block conv strategy is implementable before we invest in it:

  p1  lane-dim concat of 3-wide channel slices -> 27-wide patch axis
      (a conv1_1 im2col would need this)
  p2  lane-dim concat of 64-wide slices -> 576 (conv1_2 patch matrix)
  p3  sublane-dim slicing at +1/+2 offsets (halo reads for 3x3 taps)
  p4  sublane-dim stride-2 slicing (2x2 maxpool without relayout)
  p5  dot_general with K=3 (lane-padded contraction)

Usage: python scripts/mosaic_probe.py            # runs all, prints a table

VERDICT (real v5e chip, 2026-08-18, logs/tpu_collect_r04/mosaic_probe.out):
p1/p2/p3 OK; p4 FAIL (Mosaic compile-helper crash); p5 compiles but returns
WRONG VALUES; the full conv1 row-band kernel FAIL (compile crash). A Pallas
first-block conv is therefore both uncompilable and numerically unsafe on
this toolchain — ops/conv1_kernel.py was removed (this probe now SKIPs its
final row) and conv1_1 stays on the XLA path; see docs/SCALING.md.
"""

import functools
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _run(name, kernel, x, out_shape):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        got = np.asarray(jax.jit(fn)(x))
        return name, "OK", got
    except Exception as e:  # noqa: BLE001 - report any lowering failure
        msg = str(e).split("\n")[0][:110]
        return name, f"FAIL {type(e).__name__}: {msg}", None


def probe_concat(width, pieces):
    def kernel(x_ref, o_ref):
        parts = [x_ref[:, i * width : (i + 1) * width] for i in range(pieces)]
        o_ref[:] = jnp.concatenate(parts[::-1], axis=-1)

    x = np.arange(8 * width * pieces, dtype=np.float32).reshape(
        8, width * pieces
    )
    name = f"concat lane {pieces}x{width}->{pieces * width}"
    got = _run(name, kernel, x, jax.ShapeDtypeStruct(x.shape, x.dtype))
    if got[2] is not None:
        want = np.concatenate(
            [x[:, i * width : (i + 1) * width] for i in range(pieces)][::-1],
            axis=-1,
        )
        ok = np.array_equal(got[2], want)
        return got[0], got[1] + ("" if ok else " (WRONG VALUES)")
    return got[0], got[1]


def probe_sublane_offsets():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[0:16, :] + x_ref[1:17, :] + x_ref[2:18, :]

    x = np.arange(18 * 256, dtype=np.float32).reshape(18, 256)
    name = "sublane offsets +0/+1/+2"
    got = _run(name, kernel, x, jax.ShapeDtypeStruct((16, 256), x.dtype))
    if got[2] is not None:
        want = x[0:16] + x[1:17] + x[2:18]
        ok = np.array_equal(got[2], want)
        return got[0], got[1] + ("" if ok else " (WRONG VALUES)")
    return got[0], got[1]


def probe_sublane_stride2():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.maximum(x_ref[0::2, :], x_ref[1::2, :])

    x = np.random.RandomState(0).randn(32, 256).astype(np.float32)
    name = "sublane stride-2 max (pool)"
    got = _run(name, kernel, x, jax.ShapeDtypeStruct((16, 256), x.dtype))
    if got[2] is not None:
        want = np.maximum(x[0::2], x[1::2])
        ok = np.array_equal(got[2], want)
        return got[0], got[1] + ("" if ok else " (WRONG VALUES)")
    return got[0], got[1]


def probe_k3_dot():
    w = np.random.RandomState(1).randn(3, 64).astype(np.float32)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = np.random.RandomState(2).randn(128, 3).astype(np.float32)
    name = "dot K=3 (lane-padded)"
    try:
        fn = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((128, 64), np.float32)
        )
        got = np.asarray(jax.jit(fn)(x, w))
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        return name, f"FAIL {type(e).__name__}: {msg}"
    ok = np.allclose(got, x @ w, atol=1e-4)
    return name, "OK" + ("" if ok else " (WRONG VALUES)")


def probe_take_lut():
    """p6: dynamic 1-D table lookup from a VMEM-resident LUT (the CPU-ADC
    access pattern a minimal Pallas PQ kernel would use, ops/pq.py)."""
    lut = np.random.RandomState(3).randn(8, 256).astype(np.float32)
    idx = np.random.RandomState(4).randint(0, 256, (8, 128)).astype(np.int32)

    def kernel(lut_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(lut_ref[:], idx_ref[:], axis=1)

    name = "take_along_axis LUT (8,256)[/(8,128)]"
    try:
        fn = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), np.float32)
        )
        got = np.asarray(jax.jit(fn)(lut, idx))
    except Exception as e:  # noqa: BLE001
        return name, f"FAIL {type(e).__name__}: " + str(e).split("\n")[0][:110]
    want = np.take_along_axis(lut, idx, axis=1)
    ok = np.allclose(got, want, atol=1e-6)
    return name, "OK" + ("" if ok else " (WRONG VALUES)")


def probe_onehot_dot():
    """p7: build a one-hot matrix IN VMEM (compare vs iota) and feed it to
    the MXU dot without HBM materialization — the pattern that would cut
    ops/pq.py's ADC traffic to the raw code bytes (the XLA formulation must
    materialize the one-hot as a dot operand, ~2*ksub bytes/code byte)."""
    ksub = 256
    lut = np.random.RandomState(5).randn(8, ksub).astype(np.float32)
    idx = np.random.RandomState(6).randint(0, ksub, (128,)).astype(np.int32)

    def kernel(lut_ref, idx_ref, o_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, ksub), 1)
        oh = (cols == idx_ref[0][:, None]).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            lut_ref[:], oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    name = f"in-VMEM one-hot -> dot (8,{ksub})x({ksub},128)"
    try:
        fn = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), np.float32)
        )
        got = np.asarray(jax.jit(fn)(lut, idx[None]))
    except Exception as e:  # noqa: BLE001
        return name, f"FAIL {type(e).__name__}: " + str(e).split("\n")[0][:110]
    want = lut[:, idx]
    ok = np.allclose(got, want, atol=1e-4)
    return name, "OK" + ("" if ok else " (WRONG VALUES)")


def probe_conv1_kernel():
    """The real candidate kernel on real shapes, + timing vs the XLA conv."""
    import time

    try:
        from openibl_tpu.ops.conv1_kernel import _conv1_fused, _xla_path
    except ImportError as e:
        return "conv1_kernel 480x640", f"SKIP (no conv1_kernel module: {e})"

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 480, 640, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(0.1 * rng.randn(3, 3, 3, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )
    b = jnp.asarray(rng.randn(64).astype(np.float32)).astype(jnp.bfloat16)
    try:
        f = jax.jit(lambda x, w, b: _conv1_fused(x, w, b, False))
        y = np.asarray(f(x, w, b))
    except Exception as e:  # noqa: BLE001
        return "conv1_kernel 480x640", f"FAIL {type(e).__name__}: " + str(
            e
        ).split("\n")[0][:110]
    ref = np.asarray(jax.jit(_xla_path)(x, w, b), dtype=np.float32)
    err = float(np.abs(ref - y.astype(np.float32)).max())

    def bench(fn):
        np.asarray(fn(x, w, b))
        t0 = time.perf_counter()
        pending = [fn(x, w, b) for _ in range(8)]
        for p in pending:
            np.asarray(p)
        return (time.perf_counter() - t0) / 8

    tk = bench(f)
    tx = bench(jax.jit(_xla_path))
    return (
        "conv1_kernel 480x640",
        f"OK err={err:.3g} pallas={tk * 1e3:.2f}ms xla={tx * 1e3:.2f}ms",
    )


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    results = [
        probe_concat(3, 9),
        probe_concat(64, 9),
        probe_sublane_offsets(),
        probe_sublane_stride2(),
        probe_k3_dot(),
        probe_take_lut(),
        probe_onehot_dot(),
        probe_conv1_kernel(),
    ]
    for name, status in results:
        print(f"  {name:36s} {status}", flush=True)


if __name__ == "__main__":
    main()
