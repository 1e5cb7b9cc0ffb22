"""Probe: do int8 convolutions beat bf16 on this TPU toolchain?

TPU v5e's MXU runs int8 matmuls at ~2x its bf16 rate (394 TOPS vs
197 TFLOPs). If XLA lowers int8 `lax.conv_general_dilated` (int8 x int8 ->
int32 accumulate) onto that path, a post-training-quantized VGG16 inference
mode could roughly double extraction throughput over the current bf16 path
(bench.py: ~770 img/s/chip, ~73% of bf16 peak by FLOP count).

This probe times K chained convs inside ONE jit (lax.scan; the axon tunnel
has a ~33 ms dispatch floor and a no-op block_until_ready, so per-dispatch
timing lies) at the VGG16 layer shapes that dominate forward FLOPs, for:
  - bf16 x bf16 -> f32 (the current extraction path)
  - int8 x int8 -> int32, with a realistic per-iteration requantize back to
    int8 (scale + clip + round), since that is what a quantized backbone
    must pay between layers.

Usage: python scripts/int8_probe.py [--iters 30] [--cpu]
Writes one JSON line per shape; exit 0 even if int8 fails to lower (the
failure itself is the verdict — recorded in the JSON).
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    dn = ("NHWC", "HWIO", "NHWC")
    bs = args.batch
    # (name, H, W, C) at 480x640 input; C_in == C_out so the scan can chain.
    shapes = [
        ("conv1_2", 480, 640, 64),
        ("conv2_2", 240, 320, 128),
        ("conv3_2", 120, 160, 256),
        ("conv4_2", 60, 80, 512),
        ("conv5_2", 30, 40, 512),
    ]

    def timed(fn, x, w):
        out = fn(x, w)
        np.asarray(jax.tree.leaves(out)[0])  # compile + fence
        t0 = time.perf_counter()
        out = fn(x, w)
        np.asarray(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    results = []
    for name, h, w_, c in shapes:
        flops = 2 * bs * h * w_ * c * c * 9 * args.iters
        # generate on DEVICE: the conv1_2 activation alone is 630MB f32 and
        # the tunnel's H2D path would dominate (and sometimes stall) the probe
        x_f = jax.jit(
            lambda k: jax.random.normal(k, (bs, h, w_, c), jnp.float32)
        )(jax.random.PRNGKey(0))
        w_f = jax.jit(
            lambda k: jax.random.normal(k, (3, 3, c, c), jnp.float32)
            * (2.0 / (9 * c)) ** 0.5
        )(jax.random.PRNGKey(1))
        np.asarray(w_f)  # fence device-side generation before the clock

        @jax.jit
        def bf16_chain(x, wgt, _n=args.iters):
            x = x.astype(jnp.bfloat16)
            wgt = wgt.astype(jnp.bfloat16)

            def body(carry, _):
                y = lax.conv_general_dilated(
                    carry, wgt, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
                return jnp.maximum(y, 0).astype(jnp.bfloat16), ()

            out, _ = lax.scan(body, x, None, length=_n)
            return jnp.sum(out.astype(jnp.float32))

        t_bf16 = timed(bf16_chain, x_f, w_f)

        @jax.jit
        def int8_chain(x, wgt, _n=args.iters):
            xq = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
            wq = jnp.clip(jnp.round(wgt * 127.0), -127, 127).astype(jnp.int8)

            def body(carry, _):
                y = lax.conv_general_dilated(
                    carry, wq, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                # requantize: scale to keep values in int8 range, relu, clip
                yq = jnp.clip(
                    jnp.round(y.astype(jnp.float32) * (1.0 / (9 * c))),
                    0, 127,
                ).astype(jnp.int8)
                return yq, ()

            out, _ = lax.scan(body, xq, None, length=_n)
            return jnp.sum(out.astype(jnp.int32))

        row = {"shape": name, "hw": [h, w_], "c": c, "batch": bs,
               "iters": args.iters}
        row["bf16_ms"] = round(t_bf16 * 1e3, 2)
        row["bf16_tflops"] = round(flops / t_bf16 / 1e12, 1)
        try:
            t_int8 = timed(int8_chain, x_f, w_f)
            row["int8_ms"] = round(t_int8 * 1e3, 2)
            row["int8_tops"] = round(flops / t_int8 / 1e12, 1)
            row["speedup"] = round(t_bf16 / t_int8, 2)
        except Exception as e:  # lowering failure IS the verdict
            row["int8_error"] = f"{type(e).__name__}: {e}"[:300]
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"backend": jax.default_backend(),
                      "verdict": results}), flush=True)


if __name__ == "__main__":
    main()
