"""Minimal repro for the int8-conv batch>=192 compile stall (VERDICT r4 #8).

The round-4 extraction sweep found that the mixed bf16/int8 backbone
(ops/quant.py) fails at batch >= 192 while plain bf16 compiles to batch
256+ — so bench.py caps the int8 sweep at 128. This script isolates the
trigger to its smallest form: ONE int8 x int8 -> int32 conv (+ the fused
requantize) per VGG16 int8 layer shape, compiled at increasing batch sizes.

Measured (2026-08-19, this script): every SINGLE-layer int8 conv compiles
and runs fine at bs192 (8-13 s compile incl. the fused requantize), so the
failure lives in the FULL quantized-backbone program — the ``full`` case
here runs the entire mixed bf16/int8 EmbedNetPCA forward (ops/quant.py) at
the requested batch, which is exactly what bench.py sweeps. Each case runs
in its own timeout-guarded SUBPROCESS so a compile-helper crash OR stall is
recorded per case instead of wedging the probe.

Usage:  python scripts/int8_bs192_repro.py [--out logs/int8_bs192_crash.log]
One JSON line per (shape, batch): ok + compile_run_ms, a python error, or
HANG after --case-timeout seconds.
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# the int8 layers of the quantized backbone (quant_from=conv2_1),
# one representative shape per block at 480x640 input
SHAPES = {
    "conv2_1": (240, 320, 64, 128),
    "conv3_1": (120, 160, 128, 256),
    "conv4_1": (60, 80, 256, 512),
    "conv5_1": (30, 40, 512, 512),
}


def run_full(bs):
    """Child-process body: the ENTIRE mixed bf16/int8 quantized EmbedNetPCA
    forward at 480x640 — the program bench.py's int8 sweep compiles."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openibl_tpu import models
    from openibl_tpu.ops.quant import quantize_model_params

    model = models.create(
        "embednetpca", base=models.VGG16(compute_dtype=jnp.bfloat16),
        net_vlad=models.NetVLAD(num_clusters=64, fused=True), pca_dim=4096,
    )
    params = model.init(jax.random.PRNGKey(0))
    calib = jax.jit(
        lambda k: jax.random.normal(k, (8, 480, 640, 3)) * 40
    )(jax.random.PRNGKey(7))
    model, params = quantize_model_params(model, params, calib)
    fwd = jax.jit(model.apply)
    x = jax.jit(
        lambda k: jax.random.normal(k, (bs, 480, 640, 3)) * 40
    )(jax.random.PRNGKey(1))
    np.asarray(x[0, 0, 0, :2])
    t0 = time.perf_counter()
    np.asarray(fwd(params, x)[0, :2])
    dt = (time.perf_counter() - t0) * 1000
    print(json.dumps({"shape": "full", "batch": bs, "ok": True,
                      "compile_run_ms": round(dt, 1)}), flush=True)


def run_case(name, bs):
    """Child-process body: one int8 conv + fused requantize, compiled and
    fenced. Prints one JSON line on success."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if name == "full":
        return run_full(bs)
    h, w, cin, cout = SHAPES[name]
    wq = jnp.asarray(
        np.random.RandomState(0).randint(-127, 128, (3, 3, cin, cout)),
        jnp.int8,
    )

    @jax.jit
    def conv(x):
        y = jax.lax.conv_general_dilated(
            x, wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # the requantize the real backbone fuses after each conv
        return jnp.clip(jnp.round(y.astype(jnp.float32) * 0.01),
                        -127, 127).astype(jnp.int8)

    # input generated ON DEVICE (a (192, 240, 320, 64) int8 batch is 3.7GB —
    # host materialization + the ~10-20MB/s tunnel would dominate by minutes)
    mk = jax.jit(
        lambda k: jax.random.randint(
            k, (bs, h, w, cin), -127, 128).astype(jnp.int8),
    )
    x = mk(jax.random.PRNGKey(1))
    np.asarray(x[0, 0, 0, :2])  # fence input creation
    t0 = time.perf_counter()
    np.asarray(conv(x)[0, 0, 0, :2])  # compile + run + tiny fence
    dt = (time.perf_counter() - t0) * 1000
    print(json.dumps({"shape": name, "batch": bs, "ok": True,
                      "compile_run_ms": round(dt, 1)}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(ROOT / "logs" / "int8_bs192_crash.log"))
    p.add_argument("--batches", default="128,192")
    p.add_argument("--shapes", default=",".join(SHAPES) + ",full")
    p.add_argument("--case-timeout", type=int, default=240,
                   help="seconds before a case is recorded as HANG "
                        "(bs128 cases compile in ~2-10 s)")
    p.add_argument("--case", default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.case:  # child mode
        name, bs = args.case.split(",")
        run_case(name, int(bs))
        return

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    lines = []
    for name in args.shapes.split(","):
        for bs in (int(b) for b in args.batches.split(",")):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--case", f"{name},{bs}"],
                    capture_output=True, text=True,
                    timeout=args.case_timeout,
                )
                line = next(
                    (ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")),
                    None,
                )
                if r.returncode == 0 and line:
                    rec = json.loads(line)
                else:
                    err = (r.stderr.strip().splitlines() or ["<no stderr>"])[-1]
                    rec = {"shape": name, "batch": bs, "ok": False,
                           "error": f"exit {r.returncode}: {err[:200]}"}
            except subprocess.TimeoutExpired:
                rec = {"shape": name, "batch": bs, "ok": False,
                       "error": f"HANG: no result in {args.case_timeout}s "
                                f"(axon tpu_compile_helper stall)"}
            print(json.dumps(rec), flush=True)
            lines.append(json.dumps(rec))
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
