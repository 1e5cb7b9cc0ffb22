"""PQ / IVFADC recall characterization on model-generated descriptors.

The blob-data gates in tests/test_pq.py bound quality on synthetic
geometry; this measures the ACCURACY side of the compression trade on
descriptors the real EmbedNet produces over the synthetic place dataset
(clustered the way a real place gallery is) — the PQ counterpart of
scripts/ivf_recall.py, published in docs/SCALING.md.

Hit convention: PQ's ADC distances approximate the exact ones, so ids
can't be compared raw; a returned candidate counts as a hit when its
EXACT distance is within the exact k-th distance + eps (the same
tie-tolerant rule ivf_recall.py uses, applied through an exact re-score
of the returned ids).

Usage:  python scripts/pq_recall.py [--n-places 192] [--k 10]
Output: logs/pq_recall.json + markdown tables on stdout.
"""

import argparse
import json
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def recall_tables(desc, n_queries, k, ms, nlist, seed=0, opq_iters=6):
    """opq_iters=0 skips the OPQ columns: each OPQ build pays opq_iters
    D x D Procrustes SVDs (~80 s each at D=4096 on this 1-core host), so
    the in-suite gate (tests/test_pq.py) runs PQ-only and OPQ quality is
    gated separately at small D (TestOPQ)."""
    import jax.numpy as jnp

    from openibl_tpu.ops.distance import pairwise_sqdist
    from openibl_tpu.ops.pq import (
        build_ivfpq, build_pq, ivfpq_search, pq_search,
    )

    rng = np.random.default_rng(seed)
    qid = rng.choice(len(desc), n_queries, replace=False)
    mask = np.ones(len(desc), bool)
    mask[qid] = False
    q, g = desc[qid], desc[mask]

    d_all = np.asarray(pairwise_sqdist(jnp.asarray(q), jnp.asarray(g)))
    thresh = np.sort(d_all, axis=1)[:, k - 1] + 1e-5  # exact k-th + eps

    def hit_rate(idx):
        idx = np.asarray(idx)
        safe = np.maximum(idx, 0)
        d_ex = np.take_along_axis(d_all, safe, axis=1)
        hits = (idx >= 0) & (d_ex <= thresh[:, None])
        return float(np.mean(np.minimum(hits.sum(axis=1), k) / k))

    pq_rows = {}
    for m in ms:
        row = {}
        modes = [("", 0)] + ([("opq_", opq_iters)] if opq_iters else [])
        for tag, n_opq in modes:
            payload = build_pq(g, m=m, opq_iters=n_opq)
            codes, cb = payload["pq_codes"], payload["pq_codebooks"]
            rot = (jnp.asarray(payload["pq_rotation"])
                   if "pq_rotation" in payload else None)
            _, idx_k = pq_search(jnp.asarray(q), jnp.asarray(codes),
                                 jnp.asarray(cb), k=k, rotation=rot)
            _, idx_4k = pq_search(jnp.asarray(q), jnp.asarray(codes),
                                  jnp.asarray(cb), k=4 * k, rotation=rot)
            row[tag + "recall_at_k"] = hit_rate(idx_k)
            row[tag + "recall_at_k_in_top_4k"] = hit_rate(idx_4k)
            # reconstruction MSE in the original frame: the OPQ win shows
            # here even where tie-tolerant recall saturates
            from openibl_tpu.ops.pq import decode_pq

            y = decode_pq(cb, codes)
            if rot is not None:
                y = y @ payload["pq_rotation"].T
            row[tag + "recon_mse"] = float(
                np.mean(np.sum((g - y) ** 2, axis=1)))
        pq_rows[m] = row

    ivfpq_rows = {}
    m_ivf = ms[len(ms) // 2]
    payload = build_ivfpq(g, nlist=nlist, m=m_ivf)
    nprobes, npb = [], 1
    while npb < nlist:
        nprobes.append(npb)
        npb *= 2
    nprobes.append(nlist)
    for nprobe in nprobes:
        _, idx = ivfpq_search(jnp.asarray(q),
                              jnp.asarray(payload["ivfpq_codes"]),
                              jnp.asarray(payload["ivfpq_codebooks"]),
                              jnp.asarray(payload["ivf_centroids"]),
                              jnp.asarray(payload["ivf_lists"]),
                              k=4 * k, nprobe=nprobe)
        ivfpq_rows[nprobe] = hit_rate(idx)
    return pq_rows, ivfpq_rows, m_ivf, int(len(g))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-places", type=int, default=192)
    ap.add_argument("--imgs-per-place", type=int, default=6)
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--n-queries", type=int, default=96)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ms", type=str, default="8,16,32,64",
                    help="PQ subquantizer counts to sweep")
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--opq-iters", type=int, default=6,
                    help="OPQ alternations for the opq_ columns (0 = skip; "
                         "each pays a D x D SVD, ~80 s at D=4096 on CPU)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str,
                    default=str(ROOT / "logs" / "pq_recall.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(ROOT / "scripts"))
    from ivf_recall import model_descriptors  # same world, same extractor

    desc = model_descriptors(args.n_places, args.imgs_per_place,
                             args.height, args.width)
    print(f"{len(desc)} model descriptors (D={desc.shape[1]})")
    ms = [int(v) for v in args.ms.split(",") if v]
    pq_rows, ivfpq_rows, m_ivf, gallery_n = recall_tables(
        desc, args.n_queries, args.k, ms, args.nlist,
        opq_iters=args.opq_iters)

    print(f"\n| PQ m (bytes/desc) | recall@{args.k} | "
          f"recall@{args.k} in top-{4 * args.k} | recon MSE | "
          f"OPQ recall@{args.k} | OPQ in top-{4 * args.k} | OPQ recon MSE |")
    print("|---|---|---|---|---|---|---|")
    for m, row in pq_rows.items():
        opq = (f"{row['opq_recall_at_k']:.3f} | "
               f"{row['opq_recall_at_k_in_top_4k']:.3f} | "
               f"{row['opq_recon_mse']:.3e}"
               if "opq_recall_at_k" in row else "- | - | -")
        print(f"| {m} | {row['recall_at_k']:.3f} | "
              f"{row['recall_at_k_in_top_4k']:.3f} | "
              f"{row['recon_mse']:.3e} | {opq} |")
    print(f"\n| IVFADC m={m_ivf}, nprobe (of {args.nlist}) | "
          f"recall@{args.k} in top-{4 * args.k} |")
    print("|---|---|")
    for npb, r in ivfpq_rows.items():
        print(f"| {npb} | {r:.3f} |")

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "gallery": gallery_n, "n_queries": args.n_queries, "k": args.k,
        "descriptor_dim": int(desc.shape[1]),
        "pq": pq_rows,
        "ivfpq": {"m": m_ivf, "nlist": args.nlist,
                  "recall_in_top_4k_by_nprobe": ivfpq_rows},
    }, indent=1))
    print(json.dumps({"artifact": str(out), "ok": True}))


if __name__ == "__main__":
    main()
