"""On-chip validation + microbench of the Pallas ADC kernel (ops/pq_kernel).

Three questions, answered on the real TPU:
  1. Does the kernel LOWER on this toolchain? (scripts/mosaic_probe.py p7
     probes the core pattern; this drives the real kernel on real shapes.)
  2. Is it CORRECT on chip? (kernel=True vs kernel=False pq_search: ids
     equal, distances allclose — both bf16 default and f32 precise.)
  3. Is it FASTER? Search-only device time over a 100k x 4096 gallery at
     m=64 (the serving configuration): in-jit scan over Q single queries,
     one dispatch, fenced with np.asarray (block_until_ready is a no-op on
     the tunnel) — kernel ADC vs XLA ADC vs the exact f32 scan
     (ops.distance.topk_nearest), which the XLA ADC formulation loses to
     on latency (docs/SCALING.md's honest cost model).

Writes one JSON artifact (default logs/tpu_collect_r05/pq_kernel_chip.json)
and prints it. Exits non-zero if the kernel fails to lower or mismatches,
so the collector records a .fail and serving keeps the XLA formulation
(OPENIBL_PQ_KERNEL=0 is the runtime escape hatch either way).
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
    ap.add_argument("--gallery-size", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--scan-n", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3,
                    help="timed repetitions per variant (median reported)")
    ap.add_argument("--out", type=str,
                    default=str(ROOT / "logs" / "tpu_collect_r05"
                                / "pq_kernel_chip.json"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openibl_tpu.ops.distance import topk_nearest
    from openibl_tpu.ops.pq import build_pq, pq_search

    t_start = time.time()

    def stage(msg):
        print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)

    stage(f"backend {jax.default_backend()}; building "
          f"{args.gallery_size} x {args.dim} gallery on device")
    # clustered-ish unit-norm gallery, generated on device (no H2D of 1.6GB)
    gkey = jax.random.PRNGKey(0)

    @jax.jit
    def make_gallery(key):
        g = jax.random.normal(key, (args.gallery_size, args.dim),
                              jnp.float32)
        return g / jnp.linalg.norm(g, axis=1, keepdims=True)

    g_dev = make_gallery(gkey)
    np.asarray(g_dev[0, :1])  # fence
    payload = build_pq(g_dev, m=args.m, train_size=16384, iters=10)
    codes = jnp.asarray(payload["pq_codes"])
    cb = jnp.asarray(payload["pq_codebooks"])
    stage("pq built (on device)")

    out = {"gallery_size": args.gallery_size, "dim": args.dim, "m": args.m,
           "scan_n": args.scan_n, "platform": jax.default_backend()}

    # --- correctness: kernel vs XLA on the same queries -------------------
    q = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (4, args.dim)))
    d_x, i_x = pq_search(q, codes, cb, k=10, kernel=False)
    stage("xla search compiled")
    try:
        d_k, i_k = pq_search(q, codes, cb, k=10, kernel=True)
        np.asarray(d_k)
    except Exception as e:  # noqa: BLE001 - report lowering failure cleanly
        out["kernel_lowered"] = False
        out["error"] = f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
        print(json.dumps(out), flush=True)
        pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
        sys.exit(1)
    stage("kernel search compiled")
    out["kernel_lowered"] = True
    ids_equal = bool(np.array_equal(np.asarray(i_k), np.asarray(i_x)))
    # bf16 LUT rounding differs between the two formulations only by
    # accumulation order; distances must agree to bf16-scale tolerance
    dist_close = bool(np.allclose(np.asarray(d_k), np.asarray(d_x),
                                  rtol=2e-2, atol=2e-2))
    out["ids_equal_bf16"] = ids_equal
    out["dists_close_bf16"] = dist_close
    dp_x, ip_x = pq_search(q, codes[:4096], cb, k=10, kernel=False,
                           precise=True)
    dp_k, ip_k = pq_search(q, codes[:4096], cb, k=10, kernel=True,
                           precise=True)
    out["precise_ids_equal"] = bool(
        np.array_equal(np.asarray(ip_k), np.asarray(ip_x)))
    out["precise_dists_max_diff"] = float(
        np.max(np.abs(np.asarray(dp_k) - np.asarray(dp_x))))
    stage(f"correctness: bf16 ids_equal={ids_equal} "
          f"dist_close={dist_close} precise_ids_equal="
          f"{out['precise_ids_equal']}")
    if not (ids_equal and out["precise_ids_equal"]):
        print(json.dumps(out), flush=True)
        pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
        sys.exit(1)

    # --- device time: search-only in-jit scan ------------------------------
    n2 = jax.jit(lambda g: jnp.sum(jnp.square(g), axis=1))(g_dev)
    queries = jax.random.normal(jax.random.PRNGKey(9),
                                (args.scan_n, args.dim), jnp.float32)

    searches = {
        "pq_kernel": lambda d: pq_search(d, codes, cb, k=10,
                                         kernel=True)[1],
        "pq_xla": lambda d: pq_search(d, codes, cb, k=10, kernel=False)[1],
        "exact_f32": lambda d: topk_nearest(d, g_dev, k=10,
                                            gallery_sqnorm=n2)[1],
    }
    for name, search in searches.items():
        @jax.jit
        def scan_q(queries, _s=search):
            def body(_, qrow):
                return 0, _s(qrow[None])

            _, idxs = jax.lax.scan(body, 0, queries)
            return idxs

        np.asarray(scan_q(queries))  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(scan_q(queries))
            times.append((time.perf_counter() - t0) / args.scan_n * 1e3)
        ms = float(np.median(times))
        out[f"{name}_ms_per_query"] = round(ms, 3)
        stage(f"{name}: {ms:.3f} ms/query (median of {args.iters} scans "
              f"of {args.scan_n})")

    out["kernel_speedup_vs_xla"] = round(
        out["pq_xla_ms_per_query"] / out["pq_kernel_ms_per_query"], 3)
    out["kernel_speedup_vs_exact"] = round(
        out["exact_f32_ms_per_query"] / out["pq_kernel_ms_per_query"], 3)
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
