"""Minimal repro for the int8-conv batch>=192 compile crash (VERDICT r4 #8).

The round-4 extraction sweep found that the mixed bf16/int8 backbone
(ops/quant.py) crashes the axon tpu_compile_helper at batch >= 192 while
plain bf16 compiles to batch 256+ — so bench.py caps the int8 sweep at 128.
This script isolates the failure to its smallest trigger: ONE int8 x int8 ->
int32 conv per VGG16 int8 layer shape, compiled at increasing batch sizes.

Usage:  python scripts/int8_bs192_repro.py [--out logs/int8_bs192_crash.log]
Writes one line per (shape, batch): ok + ms, or the compiler error headline.
The full toolchain error for the first failure is appended to --out.
"""

import argparse
import json
import pathlib
import sys
import time
import traceback

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(ROOT / "logs" / "int8_bs192_crash.log"))
    p.add_argument("--batches", default="128,160,192,256")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    # the int8 layers of the quantized backbone (quant_from=conv2_1),
    # one representative shape per block at 480x640 input
    shapes = [
        ("conv2_1", 240, 320, 64, 128),
        ("conv3_1", 120, 160, 128, 256),
        ("conv4_1", 60, 80, 256, 512),
        ("conv5_1", 30, 40, 512, 512),
    ]
    batches = [int(b) for b in args.batches.split(",")]

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    lines = []
    first_tb = None
    for name, h, w, cin, cout in shapes:
        for bs in batches:
            wq = jnp.asarray(
                np.random.RandomState(0).randint(-127, 128, (3, 3, cin, cout)),
                jnp.int8,
            )

            @jax.jit
            def conv(x, wq=wq):
                y = jax.lax.conv_general_dilated(
                    x, wq, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                )
                # the requantize the real backbone fuses after each conv
                return jnp.clip(jnp.round(y.astype(jnp.float32) * 0.01),
                                -127, 127).astype(jnp.int8)

            x = jnp.asarray(
                np.random.RandomState(1).randint(-127, 128, (bs, h, w, cin)),
                jnp.int8,
            )
            try:
                t0 = time.perf_counter()
                np.asarray(conv(x))  # compile + run + fence
                dt = (time.perf_counter() - t0) * 1000
                rec = {"shape": name, "batch": bs, "ok": True,
                       "compile_run_ms": round(dt, 1)}
            except Exception as e:
                headline = str(e).splitlines()[0][:200] if str(e) else ""
                rec = {"shape": name, "batch": bs, "ok": False,
                       "error": f"{type(e).__name__}: {headline}"}
                if first_tb is None:
                    first_tb = traceback.format_exc()
            print(json.dumps(rec), flush=True)
            lines.append(json.dumps(rec))
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
        if first_tb:
            f.write("\n--- first failure traceback ---\n" + first_tb)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
