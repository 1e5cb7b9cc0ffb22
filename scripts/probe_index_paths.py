"""On-chip probe: which index-search formulations are fastest on this TPU.

Round-4 serving latency table (logs/tpu_collect_r04/serving_latency.json)
showed the reduced-precision and IVF index variants REGRESSING at bs16:
int8 53 ms/img and IVF 89 ms/img vs 21.4 ms/img for the plain f32 scan.
Model: (a) the streaming path materializes a full-width f32 copy of the
gallery tile-by-tile (read storage + write f32 + read f32 ~ 2.5x the f32
direct traffic); (b) batched IVF gathers Q*nprobe*maxlen rows — at Q=16
that is ~4x the whole gallery. This probe times candidate fixes on the
real chip before we commit to a redesign (same decide-by-measurement
protocol as scripts/mosaic_probe.py).

Variants (Q queries, N gallery, D dim, top-k):
  f32_full        current full path: f32 dot + top_k (t2 computed per call)
  f32_norms       same but gallery sqnorms precomputed (saves one pass)
  bf16_direct     bf16 gallery fed straight to the dot (native MXU), f32 acc
  f16_stream      current behavior for an f16 index (per-tile upcast scan)
  int8_stream     current behavior for an int8 index (per-tile dequant scan)
  int8_colscale   int8 -> bf16 convert consumed by the dot, per-row scales
                  applied to the (Q, N) product COLUMNS (O(QN), not O(ND))
  int8_native     int8 x int8 dot (query quantized per-row), int32 accum,
                  dequant the product — the MXU inference path
  ivf_gather      current ivf_search (per-query row gathers)

Usage: python scripts/probe_index_paths.py [--n 100000] [--q 16] [--iters 8]
Writes one JSON line per variant + a summary line.
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--q", type=int, default=16)
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform, "device": str(dev)}))

    rng = np.random.RandomState(0)
    g_host = rng.randn(args.n, args.d).astype(np.float32)
    g_host /= np.linalg.norm(g_host, axis=1, keepdims=True)
    q_host = rng.randn(args.iters, args.q, args.d).astype(np.float32)
    q_host /= np.linalg.norm(q_host, axis=2, keepdims=True)

    from openibl_tpu.ops.distance import quantize_index_int8

    codes_host, scales_host = quantize_index_int8(g_host)

    g32 = jnp.asarray(g_host)
    gbf = jnp.asarray(g_host, jnp.bfloat16)
    g16 = jnp.asarray(g_host, jnp.float16)
    gi8 = jnp.asarray(codes_host)
    scales = jnp.asarray(scales_host)
    qs = jnp.asarray(q_host)
    norms32 = jnp.sum(jnp.square(g32), axis=1)
    k = args.k

    def timed(name, fn, *fargs):
        try:
            out = fn(*fargs)
            np.asarray(out)  # compile + warm; the only reliable fence
            t0 = time.perf_counter()
            out = fn(*fargs)
            np.asarray(out)
            dt = time.perf_counter() - t0
            row = {
                "variant": name,
                "ms_per_call": round(dt / args.iters * 1000, 3),
                "q": args.q, "n": args.n,
            }
        except Exception as e:  # record lowering failures, keep probing
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(row), flush=True)
        return row

    def scan_calls(per_query_fn):
        """Amortize the tunnel dispatch floor: iters calls inside one jit."""

        @jax.jit
        def run(qs):
            def body(acc, q):
                _, idx = per_query_fn(q)
                return acc + jnp.sum(idx), None

            acc, _ = lax.scan(body, jnp.int32(0), qs)
            return acc

        return run

    def topk_from_d(d):
        neg_d, idx = lax.top_k(-d, k)
        return -neg_d, idx

    # --- full-path variants ------------------------------------------------
    def f32_full(q):
        q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
        t2 = jnp.sum(jnp.square(g32), axis=1)[None, :]
        xy = jnp.dot(q, g32.T, preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
        return topk_from_d(q2 + t2 - 2.0 * xy)

    def f32_norms(q):
        q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
        xy = jnp.dot(q, g32.T, preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
        return topk_from_d(q2 + norms32[None, :] - 2.0 * xy)

    def bf16_direct(q):
        q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
        xy = jnp.dot(q.astype(jnp.bfloat16), gbf.T,
                     preferred_element_type=jnp.float32)
        return topk_from_d(q2 + norms32[None, :] - 2.0 * xy)

    def int8_colscale(q):
        q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
        xy = jnp.dot(q.astype(jnp.bfloat16), gi8.T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        xy = xy * scales[None, :]
        return topk_from_d(q2 + norms32[None, :] - 2.0 * xy)

    def int8_native(q):
        qscale = jnp.max(jnp.abs(q), axis=1) / 127.0
        qi = jnp.clip(jnp.round(q / qscale[:, None]), -127, 127
                      ).astype(jnp.int8)
        q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
        xy = jnp.dot(qi, gi8.T, preferred_element_type=jnp.int32)
        xy = xy.astype(jnp.float32) * (qscale[:, None] * scales[None, :])
        return topk_from_d(q2 + norms32[None, :] - 2.0 * xy)

    # --- current library paths --------------------------------------------
    from openibl_tpu.ops.distance import topk_nearest
    from openibl_tpu.ops.ivf import build_ivf, ivf_search

    def f16_stream(q):
        return topk_nearest(q, g16, k=k, full_path=False)

    def int8_stream(q):
        return topk_nearest(q, gi8, k=k, full_path=False,
                            gallery_scale=scales)

    rows = []
    rows.append(timed("f32_full", scan_calls(f32_full), qs))
    rows.append(timed("f32_norms", scan_calls(f32_norms), qs))
    rows.append(timed("bf16_direct", scan_calls(bf16_direct), qs))
    rows.append(timed("f16_stream", scan_calls(f16_stream), qs))
    rows.append(timed("int8_stream", scan_calls(int8_stream), qs))
    rows.append(timed("int8_colscale", scan_calls(int8_colscale), qs))
    rows.append(timed("int8_native", scan_calls(int8_native), qs))

    ivf = build_ivf(g_host, nlist=args.nlist, iters=5)
    cents = jnp.asarray(ivf["centroids"])
    lists = jnp.asarray(ivf["lists"])

    def ivf_gather(q):
        return ivf_search(q, g32, cents, lists, k=k, nprobe=args.nprobe)

    rows.append(timed(f"ivf_gather_np{args.nprobe}", scan_calls(ivf_gather),
                      qs))

    # accuracy cross-check: do the cheap formulations still rank like f32?
    qa = qs[0]
    _, ref = f32_full(qa)
    ref = np.asarray(ref)
    acc = {}
    for name, fn in [("bf16_direct", bf16_direct),
                     ("int8_colscale", int8_colscale),
                     ("int8_native", int8_native)]:
        try:
            _, got = fn(qa)
            got = np.asarray(got)
            # top-10 overlap per query (near-ties may legally reorder)
            ov = np.mean([
                len(set(got[i]) & set(ref[i])) / len(ref[i])
                for i in range(ref.shape[0])
            ])
            acc[name] = round(float(ov), 4)
        except Exception as e:
            acc[name] = f"{type(e).__name__}"
    print(json.dumps({"top10_overlap_vs_f32": acc}), flush=True)
    print(json.dumps({"summary": {r["variant"]: r.get("ms_per_call",
                                                      r.get("error"))
                                  for r in rows}}), flush=True)


if __name__ == "__main__":
    main()
