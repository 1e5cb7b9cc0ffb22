"""Serving latency table: RetrievalService per-bucket p50 on the real chip.

VERDICT r3 item 8: measure the end-to-end service latency (uint8 pixels in,
ranked matches out) for every index storage variant — f32 / f16 / int8 /
IVF — at each compiled batch bucket, and persist one JSON artifact for
docs/API.md. Extends the reference hub contract
(/root/reference/hubconf.py:5-11) with production serving numbers the
reference never measured.

Usage:  python scripts/bench_serving.py [--gallery-size 100000] [--iters 15]
Output: logs/serving_latency.json + one summary line per variant/bucket.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def p50(samples):
    return float(np.percentile(np.asarray(samples), 50))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gallery-size", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=4096,
                    help="must match the model descriptor dim (EmbedNetPCA "
                         "= 4096); exposed only for completeness")
    ap.add_argument("--iters", type=int, default=9,
                    help="p50 samples at bucket 1; larger buckets run "
                         "max(5, iters//bucket) — their per-image H2D "
                         "dominates wall time on the tunneled chip")
    ap.add_argument("--ivf-nlist", type=int, default=256)
    ap.add_argument("--ivf-nprobe", type=int, default=32)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--out", type=str,
                    default=str(ROOT / "logs" / "serving_latency.json"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from openibl_tpu.ops.distance import quantize_index_int8
    from openibl_tpu.ops.ivf import build_ivf
    from openibl_tpu.serving import RetrievalService

    t_start = time.perf_counter()

    def stage(msg):
        print(f"[{time.perf_counter() - t_start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    g = rng.standard_normal((args.gallery_size, args.dim), np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    stage("gallery built")

    codes, scales = quantize_index_int8(g)
    stage("int8 quantized")
    # cheap coarse quantizer: this benchmark measures LATENCY, which depends
    # only on the nlist/maxlen/nprobe shapes, not on centroid quality
    ivf = build_ivf(g, nlist=args.ivf_nlist, iters=8, train_size=16384)
    stage("ivf built")

    variants = {
        "f32": dict(index={"descriptors": g}),
        "f16": dict(index={"descriptors": g.astype(np.float16)}),
        "int8": dict(index={"descriptors": codes, "scales": scales}),
        "ivf_f32": dict(
            index={"descriptors": g, "ivf_centroids": ivf["centroids"],
                   "ivf_lists": ivf["lists"]},
            ivf_nprobe=args.ivf_nprobe,
        ),
    }

    results = {
        "gallery_size": args.gallery_size,
        "dim": args.dim,
        "iters": args.iters,
        "resolution": [args.height, args.width],
        "platform": jax.devices()[0].platform,
        "ivf": {"nlist": args.ivf_nlist, "nprobe": args.ivf_nprobe},
        "variants": {},
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    def flush_artifact():
        # incremental + atomic: a timeout mid-suite still leaves every
        # completed variant's table on disk
        tmp = out.with_suffix(out.suffix + ".tmp")
        tmp.write_text(json.dumps(results, indent=1))
        tmp.replace(out)

    for name, kw in variants.items():
        svc = RetrievalService(weights=None, height=args.height,
                               width=args.width, **kw)
        svc.warmup()
        stage(f"{name}: service warm (index H2D + bucket compiles done)")
        table = {}
        for bucket in svc.buckets:
            imgs = list(
                rng.integers(0, 256,
                             (bucket, svc.height, svc.width, 3)).astype(
                                 np.uint8))
            svc.query(imgs)  # one settled warm query at this bucket
            samples = []
            for _ in range(max(args.iters // bucket, 5)):
                t0 = time.perf_counter()
                svc.query(imgs)
                samples.append((time.perf_counter() - t0) * 1e3)
            table[f"bs{bucket}"] = {
                "p50_ms": round(p50(samples), 2),
                "p50_ms_per_image": round(p50(samples) / bucket, 2),
                "iters": len(samples),
            }
            print(f"{name} bs{bucket}: p50 {table[f'bs{bucket}']['p50_ms']} ms"
                  f" ({table[f'bs{bucket}']['p50_ms_per_image']} ms/img)",
                  flush=True)
        results["variants"][name] = table
        flush_artifact()
        del svc

    print(json.dumps({"artifact": str(out), "ok": True}))


if __name__ == "__main__":
    main()
