"""Wall-time of the SFRS per-refresh Jaccard rerank across implementations.

VERDICT r1 item 6 asks for a recorded speedup of the streaming rerank over
round 1's host-bound path. Three contenders, timed at mining scale (the SFRS
refresh reranks ~1k subset anchors against the q∪db union; reference:
ibl/utils/data/sampler.py:126-151 + ibl/utils/rerank.py:32):

  r1 path:     full re_ranking — N x N distmats materialized, host
               argpartition over N², C++/python expansion, host Jaccard for
               ALL n_q queries (the reference reranks every query).
  r2 streaming: build_v_sparse (device top-k, sparse feature-space V rows)
               + Jaccard ONLY for the subset anchors — host or device engine.

Usage: python scripts/time_sfrs_rerank.py --n 17000 --queries 1000
Writes logs/sfrs_rerank_timing.json.
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
    ap.add_argument("--n", type=int, default=17000,
                    help="union size (Pitts30k SFRS refresh is ~17k)")
    ap.add_argument("--n-q", type=int, default=7320,
                    help="query count in the union (Pitts30k train)")
    ap.add_argument("--queries", type=int, default=1000,
                    help="subset anchors actually mined per refresh")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k1", type=int, default=20)
    ap.add_argument("--skip-r1", action="store_true")
    args = ap.parse_args()

    from openibl_tpu.ops.distance import pairwise_sqdist
    from openibl_tpu.ops.rerank import (
        build_v_sparse,
        jaccard_for_queries,
        re_ranking,
    )

    rng = np.random.RandomState(0)
    centers = rng.randn(64, args.dim).astype(np.float32)
    feats = centers[rng.randint(64, size=args.n)] + 0.3 * rng.randn(
        args.n, args.dim
    ).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    n_q = min(args.n_q, args.n - 1)

    result = {"n_union": args.n, "n_q": n_q, "subset_queries": args.queries,
              "k1": args.k1}

    # --- round-1 path: full distmats + re_ranking over every query
    if not args.skip_r1:
        import jax.numpy as jnp

        t0 = time.perf_counter()
        u = jnp.asarray(feats)
        d = np.asarray(pairwise_sqdist(u, u), np.float32)
        d = np.sqrt(np.maximum(d, 0.0))
        t_dist = time.perf_counter() - t0
        t0 = time.perf_counter()
        re_ranking(d[:n_q, n_q:], d[:n_q, :n_q], d[n_q:, n_q:],
                   k1=args.k1, k2=1, lambda_value=0.0)
        t_r1 = time.perf_counter() - t0
        result["r1_distmat_s"] = round(t_dist, 3)
        result["r1_re_ranking_s"] = round(t_r1, 3)
        result["r1_total_s"] = round(t_dist + t_r1, 3)

    # --- round-2 streaming path
    t0 = time.perf_counter()
    rows, cols, vals, _, _ = build_v_sparse(feats, k1=args.k1)
    t_build = time.perf_counter() - t0
    qrows = np.arange(args.queries)

    t0 = time.perf_counter()
    host = jaccard_for_queries(rows, cols, vals, args.n, qrows, prefer="host")
    t_host = time.perf_counter() - t0

    t0 = time.perf_counter()
    dev = jaccard_for_queries(rows, cols, vals, args.n, qrows, prefer="device")
    t_dev = time.perf_counter() - t0

    result.update({
        "r2_build_v_s": round(t_build, 3),
        "r2_jaccard_host_s": round(t_host, 3),
        "r2_jaccard_device_s": round(t_dev, 3),
        "r2_total_s": round(t_build + min(t_host, t_dev), 3),
        "engines_max_abs_diff": float(np.abs(dev - host).max()),
    })
    if "r1_total_s" in result:
        result["speedup_vs_r1"] = round(
            result["r1_total_s"] / result["r2_total_s"], 2
        )
    import jax

    result["backend"] = jax.default_backend()
    path = ROOT / "logs" / "sfrs_rerank_timing.json"
    path.parent.mkdir(exist_ok=True)
    path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
