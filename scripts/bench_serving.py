"""Serving latency table: RetrievalService per-bucket p50 on the real chip.

VERDICT r3 item 8: measure the end-to-end service latency (uint8 pixels in,
ranked matches out) for every index storage variant — f32 / f16 / int8 /
IVF / PQ / PQ+exact-re-rank — at each compiled batch bucket, and persist
one JSON artifact for
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


def _flush(results, out):
    """Incremental + atomic artifact write: a timeout mid-suite still
    leaves every completed row on disk (shared by both passes)."""
    import json

    tmp = out.with_suffix(out.suffix + ".tmp")
    tmp.write_text(json.dumps(results, indent=1))
    tmp.replace(out)


def _device_time_pass(args, results, todo, g_dev, stage, out):
    """Per-variant DEVICE latency: one jitted lax.scan of scan_n queries
    (image generated in-body -> model forward -> search), one dispatch —
    the only timing the tunnel's ~33 ms floor and multi-MB image H2D can't
    pollute (same technique as bench.py --device-time). All index variants
    are built ON DEVICE from the resident gallery (no 1.6 GB host bounce);
    the artifact rows land next to the synchronous p50s as
    ``device_ms_per_query``.

    Each variant builds its index LAZILY, right before its own
    measure+flush: on a degraded tunnel a single scan compile can stall
    past the collector window, and the up-front-build version lost every
    already-buildable row (plus a ~6 min ivf fill_lists pass) to whichever
    variant stalled first. Cheap variants now land on disk before the
    expensive builds even start, so a timed-out run resumes mid-list."""
    import json
    import time

    import jax
    import jax.numpy as jnp

    from openibl_tpu.hub import vgg16_netvlad
    from openibl_tpu.ops.distance import topk_nearest

    model, params = vgg16_netvlad(None)
    n2 = jax.jit(lambda g: jnp.sum(jnp.square(g), axis=1))(g_dev)

    def _mk_f32():
        return lambda d: topk_nearest(d, g_dev, k=10, gallery_sqnorm=n2)[1]

    def _mk_f16():
        g16 = jax.jit(lambda g: g.astype(jnp.float16))(g_dev)
        return lambda d: topk_nearest(d, g16, k=10, gallery_sqnorm=n2)[1]

    def _mk_int8():
        @jax.jit
        def _quant(g):
            s = jnp.maximum(jnp.max(jnp.abs(g), axis=1) / 127.0, 1e-30)
            c = jnp.clip(jnp.round(g / s[:, None]), -127, 127).astype(
                jnp.int8)
            n2i = jnp.sum(jnp.square(c.astype(jnp.float32)
                                     * s[:, None]), axis=1)
            return c, s, n2i

        codes8, scales8, n2i = _quant(g_dev)
        return lambda d: topk_nearest(
            d, codes8, k=10, gallery_scale=scales8, gallery_sqnorm=n2i)[1]

    def _mk_ivf():
        from openibl_tpu.ops.ivf import fill_lists, ivf_search

        nlist = args.ivf_nlist
        maxlen = -(-2 * args.gallery_size // nlist)
        centroids = g_dev[:nlist]  # uniform data: rows ARE centroid-quality
        _, ranked = topk_nearest(g_dev, centroids, k=8)
        lists = jnp.asarray(
            fill_lists(np.asarray(ranked), nlist, maxlen, x=g_dev,
                       centroids=np.asarray(centroids)))
        stage("ivf lists filled")
        nprobe = min(args.ivf_nprobe, nlist)
        return lambda d: ivf_search(
            d, g_dev, centroids, lists, k=10, nprobe=nprobe,
            gallery_sqnorm=n2)[1]

    def _mk_pq():
        from openibl_tpu.ops.pq import build_pq, pq_search

        payload = build_pq(g_dev, m=64, train_size=16384, iters=10)
        pq_codes = jnp.asarray(payload["pq_codes"])
        pq_cb = jnp.asarray(payload["pq_codebooks"])
        stage("pq built (on device)")
        return lambda d: pq_search(d, pq_codes, pq_cb, k=10)[1]

    def _mk_pq_rerank():
        from openibl_tpu.ops.pq import build_pq, pq_search_rerank

        payload = build_pq(g_dev, m=64, train_size=16384, iters=10)
        pq_codes = jnp.asarray(payload["pq_codes"])
        pq_cb = jnp.asarray(payload["pq_codebooks"])
        stage("pq built (rerank variant, on device)")
        return lambda d: pq_search_rerank(
            d, pq_codes, pq_cb, g_dev, k=10, shortlist=args.pq_shortlist,
            gallery_sqnorm=n2)[1]

    builders = {"f32": _mk_f32, "f16": _mk_f16, "int8": _mk_int8,
                "ivf_f32": _mk_ivf, "pq": _mk_pq,
                "pq_rerank": _mk_pq_rerank}
    # cheapest-build-first so a stall costs the fewest unflushed rows
    order = ["f32", "f16", "int8", "pq", "pq_rerank", "ivf_f32"]
    todo = sorted(todo, key=order.index)

    n = args.scan_n
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    for name in todo:
        search = builders[name]()
        stage(f"{name}: index ready; compiling scan")

        @jax.jit
        def scan_queries(params, keys, _search=search):
            def body(_, k):
                im = jax.random.normal(
                    k, (1, args.height, args.width, 3)) * 40
                return 0, _search(model.apply(params, im))

            _, idxs = jax.lax.scan(body, 0, keys)
            return idxs

        np.asarray(scan_queries(params, keys))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(scan_queries(params, keys))
        ms = (time.perf_counter() - t0) / n * 1e3
        row = results["variants"].setdefault(name, {})
        row["device_ms_per_query"] = round(ms, 2)
        row["device_scan_n"] = n
        print(f"{name}: device {ms:.2f} ms/query (scan of {n})", flush=True)
        _flush(results, out)
    print(json.dumps({"artifact": str(out), "ok": True,
                      "mode": "device-time"}))


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
    ap.add_argument("--pq-shortlist", type=int, default=128,
                    help="pq_rerank variant: ADC shortlist size re-ranked "
                         "by exact distance")
    ap.add_argument("--variants", type=str,
                    default="f32,f16,int8,ivf_f32,pq,pq_rerank",
                    help="subset to measure; completed variants already in "
                         "--out are skipped (resume), so a timed-out run "
                         "can be finished by re-running")
    ap.add_argument("--device-time", action="store_true",
                    help="additionally record per-variant DEVICE latency "
                         "(one jitted lax.scan of n distinct queries — "
                         "model forward + search — per variant): the "
                         "synchronous p50s above are dominated by the "
                         "tunnel's ~33 ms dispatch floor and the uint8 "
                         "image H2D (~15 MB at bs16), which buries the "
                         "between-variant search deltas in transfer noise")
    ap.add_argument("--scan-n", type=int, default=30,
                    help="queries per device-time scan")
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

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    results = {
        "gallery_size": args.gallery_size,
        "dim": args.dim,
        "iters": args.iters,
        "resolution": [args.height, args.width],
        "platform": jax.devices()[0].platform,
        "ivf": {"nlist": args.ivf_nlist, "nprobe": args.ivf_nprobe},
        "variants": {},
    }
    if out.is_file():  # resume: keep rows a previous (timed-out) run made
        try:
            results["variants"] = json.loads(
                out.read_text()).get("variants", {})
        except (json.JSONDecodeError, OSError):
            pass
    wanted = [v for v in args.variants.split(",") if v]
    known = {"f32", "f16", "int8", "ivf_f32", "pq", "pq_rerank"}
    unknown = [v for v in wanted if v not in known]
    if unknown:
        raise SystemExit(f"unknown variants: {unknown}")
    # each pass resumes on ITS OWN key ("bs1" p50 table vs
    # device_ms_per_query): a row holding only the other pass's result must
    # not mark this pass complete — a --device-time run creating a bare
    # {'device_ms_per_query': ...} row would otherwise silently swallow a
    # later synchronous run of the same variant
    if args.device_time:
        todo = [v for v in wanted
                if "device_ms_per_query"
                not in results["variants"].get(v, {})]
    else:
        todo = [v for v in wanted
                if "bs1" not in results["variants"].get(v, {})]
    if not todo:
        print(json.dumps({"artifact": str(out), "ok": True,
                          "skipped": "all variants already captured"}))
        return
    stage(f"variants to measure: {todo} (resumed: "
          f"{sorted(results['variants'])})")

    # gallery content is irrelevant to LATENCY (top-k cost is
    # data-independent) but generating 400M gaussians on this 1-core host
    # takes ~8 minutes — make them on the device in ms and D2H once
    import jax.numpy as jnp

    @jax.jit
    def _mk_gallery(key):
        raw = jax.random.normal(key, (args.gallery_size, args.dim),
                                jnp.float32)
        return raw / jnp.linalg.norm(raw, axis=1, keepdims=True)

    g_dev = _mk_gallery(jax.random.PRNGKey(0))
    if args.device_time:
        _device_time_pass(args, results, todo, g_dev, stage, out)
        return
    g = np.asarray(g_dev)
    del g_dev
    stage("gallery built (on device)")

    variants = {"f32": lambda: dict(index={"descriptors": g}),
                "f16": lambda: dict(
                    index={"descriptors": g.astype(np.float16)})}

    def _int8():
        codes, scales = quantize_index_int8(g)
        stage("int8 quantized")
        return dict(index={"descriptors": codes, "scales": scales})

    def _ivf():
        # cheap coarse quantizer: latency depends only on the
        # nlist/maxlen/nprobe shapes, not on centroid quality
        ivf = build_ivf(g, nlist=args.ivf_nlist, iters=8, train_size=16384)
        stage("ivf built")
        return dict(
            index={"descriptors": g, "ivf_centroids": ivf["centroids"],
                   "ivf_lists": ivf["lists"]},
            ivf_nprobe=args.ivf_nprobe,
        )

    def _pq():
        from openibl_tpu.ops.pq import build_pq

        # random-uniform data has no cluster structure, so a 16k Lloyd
        # subsample is plenty — the bench measures ADC latency, not recall
        payload = build_pq(g, m=64, train_size=16384, iters=10)
        stage("pq built")
        return dict(index=payload)

    def _pq_rerank():
        from openibl_tpu.ops.pq import build_pq

        payload = build_pq(g, m=64, train_size=16384, iters=10)
        stage("pq built (rerank variant)")
        return dict(index={**payload, "descriptors": g},
                    pq_rerank=args.pq_shortlist)

    variants["int8"] = _int8
    variants["ivf_f32"] = _ivf
    variants["pq"] = _pq
    variants["pq_rerank"] = _pq_rerank
    rng = np.random.default_rng(1)  # query images only (tiny host work)
    for name in todo:
        kw = variants[name]()
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
        # merge, don't replace: a device-time pass may already have written
        # device_ms_per_query into this variant's row
        results["variants"].setdefault(name, {}).update(table)
        _flush(results, out)
        del svc

    print(json.dumps({"artifact": str(out), "ok": True}))


if __name__ == "__main__":
    main()
