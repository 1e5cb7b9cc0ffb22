"""On-chip parity self-check for the fused Pallas NetVLAD head.

VERDICT r1 weak item 7: CPU CI runs the Pallas kernel in interpret mode
(ops/netvlad_kernel.py), so the real-MXU parity claim (fused vs XLA head
agree to ~1e-6 on final descriptors) needs an auditable artifact. This
script runs both heads on the real TPU over random conv5-scale inputs and
writes logs/selfcheck_r{N}.json with the measured maxima.

Reference math being checked: /root/reference/ibl/models/netvlad.py:44-61
(soft-assign + residual aggregation) and :76-80 (intra + global L2).

Usage: python scripts/tpu_selfcheck.py --round 2
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(30, 40),
                    help="feature-map spatial dims (480x640 input -> 30x40)")
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openibl_tpu.models.netvlad import netvlad_apply, vlad_postprocess
    from openibl_tpu.ops.netvlad_kernel import netvlad_fused

    backend = jax.default_backend()
    h, w = args.hw
    k, c = 64, 512

    def xla_head(params, fmap):
        vlad = netvlad_apply(params, fmap, normalize_input=True)
        return vlad_postprocess(vlad)

    xla_j = jax.jit(xla_head)
    fused_j = jax.jit(
        lambda p, f: netvlad_fused(
            f, p["assign_w"], p["centroids"],
            normalize_input=True, postprocess=True,
        ).reshape(f.shape[0], -1)
    )

    rng = np.random.RandomState(0)
    max_abs = 0.0
    max_rel = 0.0
    for t in range(args.trials):
        params = {
            "assign_w": jnp.asarray(rng.randn(c, k).astype(np.float32)),
            "centroids": jnp.asarray(rng.randn(k, c).astype(np.float32) * 0.1),
        }
        # conv5_3 activations are unbounded reals (no trailing ReLU); use a
        # heavy-tailed draw to stress the softmax/normalization numerics
        fmap = jnp.asarray(
            (rng.randn(args.batch, h, w, c) * (1.0 + 3.0 * (t % 2))).astype(
                np.float32
            )
        )
        a = np.asarray(xla_j(params, fmap))
        b = np.asarray(fused_j(params, fmap))
        d = np.abs(a - b)
        max_abs = max(max_abs, float(d.max()))
        denom = np.maximum(np.abs(a), 1e-6)
        max_rel = max(max_rel, float((d / denom).max()))

    result = {
        "round": args.round,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": backend,
        "pallas_interpret": backend != "tpu",
        "batch": args.batch,
        "fmap_hw": [h, w],
        "trials": args.trials,
        "max_abs_diff": max_abs,
        "max_rel_diff": max_rel,
        "pass": max_abs < 5e-6,
    }
    path = ROOT / "logs" / f"selfcheck_r{args.round:02d}.json"
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    if not result["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
