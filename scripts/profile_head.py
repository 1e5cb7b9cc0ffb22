"""Break down the descriptor head's on-chip time at production shape.

The backbone profile (scripts/profile_backbone.py) shows ~8.7 ms of a
169 ms bs-128 forward in the post-conv5 head. This times the pieces:
fused Pallas NetVLAD vs the XLA head, the PCA projection at each matmul
precision, and the full EmbedNetPCA tail, so the next optimization target
is chosen from data.

Hand tool, not CI. Prints one line per piece to stderr + a JSON line.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timeit(fn, *a, iters=12):
    np.asarray(fn(*a))
    t0 = time.perf_counter()
    pend = []
    for _ in range(iters):
        pend.append(fn(*a))
        if len(pend) > 2:
            np.asarray(pend.pop(0))
    for p in pend:
        np.asarray(p)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openibl_tpu.models.netvlad import (
        init_netvlad_params, init_pca_layer_params, pca_layer_apply,
        netvlad_apply, vlad_postprocess)
    from openibl_tpu.ops.netvlad_kernel import netvlad_descriptor_fused

    n = args.batch
    rng = np.random.RandomState(0)
    fmap = jnp.asarray(
        rng.randn(n, 30, 40, 512).astype(np.float32)
    ).astype(jnp.bfloat16)
    vp = init_netvlad_params(jax.random.PRNGKey(0), 64, 512)
    pp = init_pca_layer_params(jax.random.PRNGKey(1), 32768, 4096)
    desc = jnp.asarray(rng.randn(n, 32768).astype(np.float32))
    desc = desc / jnp.linalg.norm(desc, axis=1, keepdims=True)

    out = {"batch": n}

    def rec(name, fn, *a):
        ms = timeit(fn, *a, iters=args.iters)
        out[name] = round(ms, 3)
        print(f"{name:24s} {ms:8.3f} ms", file=sys.stderr)

    # two tunnel traps: (1) params must be jit ARGUMENTS — captured trees
    # become HLO constants and the 537 MB PCA weights blow the compile
    # request limit (HTTP 413); (2) outputs must be reduced ON DEVICE —
    # fetching a (128, 32768) f32 descriptor block through the ~20 MB/s
    # tunnel costs ~800 ms and swamps the sub-ms compute being measured
    rec("netvlad_fused",
        jax.jit(lambda p, f: jnp.sum(netvlad_descriptor_fused(p, f))),
        vp, fmap)
    rec("netvlad_xla",
        jax.jit(lambda p, f: jnp.sum(vlad_postprocess(netvlad_apply(p, f)))),
        vp, fmap)
    rec("pca_highest",
        jax.jit(lambda p, d: jnp.sum(pca_layer_apply(p, d))), pp, desc)

    w = pp["w"].astype(jnp.float32)
    b = pp["b"].astype(jnp.float32)
    for prec in ("default", "high"):
        f = jax.jit(lambda w, b, d, p=prec: jnp.sum((
            lambda y: y / jnp.linalg.norm(y, axis=1, keepdims=True)
        )(jnp.dot(d, w, precision=p) + b)))
        rec(f"pca_{prec}", f, w, b, desc)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
