"""Per-stage timing of the extraction path on the real chip.

Times cumulative prefixes of the VGG16 conv stack plus the NetVLAD/PCA head
so the sub-peak stages are visible (VERDICT r1 item 9: conv stack ~75% of
bf16 peak; find where the time goes before micro-optimizing).

Not part of CI — a hand tool. Prints a table to stderr and one JSON line.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def bench_fn(fn, *args, iters=12):
    np.asarray(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        pending.append(fn(*args))
        if len(pending) > 2:
            np.asarray(pending.pop(0))
    for p in pending:
        np.asarray(p)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from openibl_tpu import models
    from openibl_tpu.models.vgg import VGG16_LAYERS, init_vgg16_params, _CONV_DN

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        rng.randn(args.batch, args.height, args.width, 3).astype(np.float32)
        * 40
    )
    params = init_vgg16_params(jax.random.PRNGKey(0))

    def prefix_apply(params, images, upto):
        x = images.astype(dtype)
        for i, (name, _, _, relu, pool) in enumerate(VGG16_LAYERS):
            if i >= upto:
                break
            p = params[name]
            x = lax.conv_general_dilated(
                x, p["w"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=_CONV_DN,
            ) + p["b"].astype(dtype)
            if relu:
                x = jnp.maximum(x, 0)
            if pool:
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        # tiny reduction so D2H is negligible regardless of depth
        return jnp.sum(x.astype(jnp.float32), axis=(1, 2, 3))

    # per-image MACs of each conv at its spatial size
    h, w = args.height, args.width
    macs = []
    for name, cin, cout, _, pool in VGG16_LAYERS:
        macs.append(h * w * 9 * cin * cout)
        if pool:
            h, w = h // 2, w // 2
    total_macs = sum(macs)

    rows = []
    prev = 0.0
    for upto in range(1, len(VGG16_LAYERS) + 1):
        fn = jax.jit(lambda p, x, u=upto: prefix_apply(p, x, u))
        dt = bench_fn(fn, params, x0, iters=args.iters)
        layer_dt = dt - prev
        prev = dt
        name = VGG16_LAYERS[upto - 1][0]
        gmacs = macs[upto - 1] * args.batch / 1e9
        tflops = 2 * gmacs / max(layer_dt, 1e-9) / 1e3
        rows.append((name, layer_dt * 1e3, gmacs, tflops))
        print(f"{name:10s} +{layer_dt*1e3:8.2f} ms  {gmacs:8.1f} GMAC  "
              f"{tflops:6.1f} TF/s", file=sys.stderr)

    # full model for comparison
    model = models.create(
        "embednetpca", base=models.VGG16(compute_dtype=dtype),
        net_vlad=models.NetVLAD(num_clusters=64,
                                fused=jax.default_backend() == "tpu"),
        pca_dim=4096,
    )
    mparams = model.init(jax.random.PRNGKey(0))
    fwd = jax.jit(model.apply)
    full_dt = bench_fn(fwd, mparams, x0, iters=args.iters)
    head_dt = full_dt - prev
    print(f"{'head':10s} +{head_dt*1e3:8.2f} ms", file=sys.stderr)
    print(f"{'TOTAL':10s}  {full_dt*1e3:8.2f} ms  "
          f"{args.batch/full_dt:6.1f} img/s  "
          f"conv avg {2*total_macs*args.batch/prev/1e12:6.1f} TF/s",
          file=sys.stderr)
    print(json.dumps({
        "batch": args.batch,
        "img_per_s": round(args.batch / full_dt, 1),
        "conv_ms": round(prev * 1e3, 2),
        "head_ms": round(head_dt * 1e3, 2),
        "layers": [
            {"name": n, "ms": round(ms, 2), "gmac": round(g, 1),
             "tflops": round(t, 1)}
            for n, ms, g, t in rows
        ],
    }))


if __name__ == "__main__":
    main()
