"""Build a descriptor index over an image directory and query it.

The serving-shaped composition of the framework (no reference equivalent —
the hub model + TPU retrieval as a standalone tool):

  python examples/index_and_query.py build gallery_dir/ index.npz --weights w.pth
  python examples/index_and_query.py query index.npz photo.jpg --topk 5
"""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def build(args):
    if args.pq_only and not args.pq_m:
        # validate BEFORE the gallery extraction — failing after hours of
        # descriptor computation over a real gallery discards all the work
        raise SystemExit("--pq-only requires --pq-m")
    if args.opq_iters and not args.pq_m:
        raise SystemExit("--opq-iters requires --pq-m")

    from openibl_tpu.hub import vgg16_netvlad
    from openibl_tpu.data.loader import ImageSource, BatchLoader
    from openibl_tpu.data.transforms import TestTransform
    from openibl_tpu.parallel.extract import extract_features

    paths = sorted(
        p for p in glob.glob(osp.join(args.gallery, "**", "*"), recursive=True)
        if p.lower().endswith(IMAGE_EXTS)
    )
    if not paths:
        raise SystemExit(f"no images under {args.gallery}")
    print(f"indexing {len(paths)} images from {args.gallery}")
    model, params = vgg16_netvlad(args.weights, pca_params=args.pca_params)
    src = ImageSource(
        [(p, i, 0.0, 0.0) for i, p in enumerate(paths)],
        transform=TestTransform(args.height, args.width, device_normalize=True),
    )
    feats = extract_features(
        model.apply, params, BatchLoader(src, batch_size=args.batch_size),
        verbose=True,
    )
    index_path = args.index if args.index.endswith(".npz") else args.index + ".npz"
    # quantize BEFORE fitting IVF: build_ivf must see the same vectors the
    # search will run over (codes * scales for int8, the f16 rounding for
    # f16) — cells assigned on pre-quantization floats would mis-place rows
    # near cell boundaries and silently cost recall
    payload = {"paths": np.array(paths)}
    if args.store_dtype == "int8":
        from openibl_tpu.ops.distance import quantize_index_int8

        codes, scales = quantize_index_int8(feats)
        payload.update(descriptors=codes, scales=scales)
        search_vectors = codes.astype(np.float32) * scales[:, None]
    else:
        stored = feats.astype(args.store_dtype)
        payload.update(descriptors=stored)
        search_vectors = stored.astype(np.float32)
    # PQ/IVF arrays are trained on the same vectors the full-width search
    # would run over (post store-dtype rounding) — cells/codes fit on
    # pre-quantization floats would mis-place rows near boundaries
    if args.pq_m and args.ivf_nlist:
        from openibl_tpu.ops.pq import build_ivfpq

        # IVFADC: ONE clustering produces both the IVF tables (usable by
        # the full-width ivf_nprobe path) and the residual-PQ codes
        payload.update(build_ivfpq(search_vectors, nlist=args.ivf_nlist,
                                   m=args.pq_m, opq_iters=args.opq_iters))
        print(f"IVFADC: {payload['ivf_lists'].shape[0]} cells x "
              f"{payload['ivf_lists'].shape[1]} capacity, m={args.pq_m} "
              f"residual codes"
              + (f", OPQ rotation ({args.opq_iters} iters)"
                 if args.opq_iters else ""))
    elif args.ivf_nlist:
        from openibl_tpu.ops.ivf import build_ivf

        ivf = build_ivf(search_vectors, nlist=args.ivf_nlist)
        payload.update(ivf_centroids=ivf["centroids"],
                       ivf_lists=ivf["lists"])
        print(f"IVF: {ivf['lists'].shape[0]} cells x "
              f"{ivf['lists'].shape[1]} capacity")
    elif args.pq_m:
        from openibl_tpu.ops.pq import build_pq

        payload.update(build_pq(search_vectors, m=args.pq_m,
                                opq_iters=args.opq_iters))
        print(f"PQ: m={args.pq_m} -> {args.pq_m} bytes/descriptor "
              f"({feats.shape[1] * 4 // args.pq_m}x smaller than f32)"
              + (f", OPQ rotation ({args.opq_iters} iters)"
                 if args.opq_iters else ""))
    if args.pq_only:  # arg combo validated at the top of build()
        del payload["descriptors"]
        payload.pop("scales", None)
    np.savez(index_path, **payload)
    stored = args.store_dtype
    if args.pq_m:
        kind = "ivfadc" if args.ivf_nlist else "pq"
        stored = (f"{kind} m={args.pq_m} only" if args.pq_only
                  else f"{stored} + {kind} m={args.pq_m}")
    print(f"wrote {index_path}: {feats.shape} descriptors ({stored})")


def query(args):
    import jax.numpy as jnp
    from PIL import Image

    from openibl_tpu.hub import DescriptorExtractor
    from openibl_tpu.ops.distance import topk_nearest

    index_path = args.index if args.index.endswith(".npz") else args.index + ".npz"
    data = np.load(index_path, allow_pickle=False)
    paths = data["paths"]
    extractor = DescriptorExtractor(args.weights, args.height, args.width,
                                    pca_params=args.pca_params)
    desc = extractor(Image.open(args.image).convert("RGB"))
    if "descriptors" in data.files:
        gallery = data["descriptors"]
        scales = data["scales"] if gallery.dtype == np.int8 else None
        d, idx = topk_nearest(jnp.asarray(desc), jnp.asarray(gallery),
                              k=min(args.topk, len(gallery)),
                              gallery_scale=scales)
    elif "ivfpq_codes" in data.files:
        # IVFADC-only index (--pq-m --ivf-nlist --pq-only): probe nprobe
        # cells, ADC over their residual codes
        from openibl_tpu.ops.pq import ivfpq_search

        codes = data["ivfpq_codes"]
        nlist = data["ivf_centroids"].shape[0]
        rot = (jnp.asarray(data["ivfpq_rotation"])
               if "ivfpq_rotation" in data.files else None)
        d, idx = ivfpq_search(jnp.asarray(desc), jnp.asarray(codes),
                              jnp.asarray(data["ivfpq_codebooks"]),
                              jnp.asarray(data["ivf_centroids"]),
                              jnp.asarray(data["ivf_lists"]),
                              k=min(args.topk, len(codes)),
                              nprobe=args.nprobe or max(nlist // 8, 1),
                              rotation=rot)
    else:  # PQ-only index (build --pq-m ... --pq-only): exhaustive ADC
        from openibl_tpu.ops.pq import pq_search

        codes = data["pq_codes"]
        rot = (jnp.asarray(data["pq_rotation"])
               if "pq_rotation" in data.files else None)
        d, idx = pq_search(jnp.asarray(desc), jnp.asarray(codes),
                           jnp.asarray(data["pq_codebooks"]),
                           k=min(args.topk, len(codes)), rotation=rot)
    d, idx = np.asarray(d)[0], np.asarray(idx)[0]
    # drop unfilled (inf, -1) slots — a low-nprobe IVF/IVFADC probe can
    # return fewer than topk candidates, and paths[-1] would silently show
    # the LAST gallery image as a phantom match (serving._query_batch
    # filters the same way)
    filled = [(i, dist) for i, dist in zip(idx, d) if i >= 0]
    print(f"top-{len(filled)} matches for {args.image}:")
    for rank, (i, dist) in enumerate(filled, 1):
        print(f"  {rank}. {paths[i]}  (sq-dist {dist:.4f})")


def main():
    p = argparse.ArgumentParser(description="descriptor index build/query (TPU)")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("gallery")
    b.add_argument("index")
    b.add_argument("--store-dtype", choices=["float32", "float16", "int8"],
                   default="float32",
                   help="float16 halves (int8 quarters, with per-row "
                        "scales) index size on disk and in HBM; unit-norm "
                        "descriptors lose only near-tie ordering")
    b.add_argument("--ivf-nlist", type=int, default=0,
                   help="also build an IVF coarse index with this many "
                        "cells (ops.ivf): the serving layer then probes "
                        "only the nearest cells per query instead of "
                        "scanning the whole index (0 = exact-only index)")
    b.add_argument("--pq-m", type=int, default=0,
                   help="also product-quantize the index into this many "
                        "uint8 subcodes per descriptor (ops.pq; m bytes "
                        "each — 256x smaller than f32 at D=4096, m=64); "
                        "serving/query score codes by exhaustive ADC")
    b.add_argument("--opq-iters", type=int, default=0,
                   help="with --pq-m: train an OPQ rotation (ops.pq "
                        "train_opq, Ge et al. CVPR'13) for this many "
                        "alternating iterations before encoding — lower "
                        "quantization error at the same m for one extra "
                        "(D, D) matmul per query; the rotation is stored "
                        "in the index and applied automatically")
    b.add_argument("--pq-only", action="store_true",
                   help="with --pq-m: store ONLY the PQ arrays (drop the "
                        "full-width descriptors) — the max-compression "
                        "index for galleries that cannot fit full-width")
    q = sub.add_parser("query")
    q.add_argument("index")
    q.add_argument("image")
    q.add_argument("--topk", type=int, default=5)
    q.add_argument("--nprobe", type=int, default=0,
                   help="IVFADC-only indexes: cells probed per query "
                        "(default nlist/8)")
    for sp in (b, q):
        sp.add_argument("--weights", type=str, default=None)
        sp.add_argument("--pca-params", type=str, default=None,
                        help="PCA-whitening .h5/.npz for trainer checkpoints "
                             "(auto-discovered next to the checkpoint)")
        sp.add_argument("--height", type=int, default=480)
        sp.add_argument("--width", type=int, default=640)
        sp.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args()
    (build if args.cmd == "build" else query)(args)


if __name__ == "__main__":
    main()
