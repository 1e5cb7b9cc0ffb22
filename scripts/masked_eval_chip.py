"""On-chip Tokyo masked bucket-padded eval artifact (VERDICT r4 item 6).

The Tokyo 24/7 test path pads variable-shape queries (shorter-side-640
resize, reference examples/test.py:44-48 runs them batch-1 per shape) to ONE
static shape per orientation and runs the masked forward
(models/vgg.py:apply_masked via engine/pipeline.py) — one jit specialization
per bucket. The claim is pinned exactly on CPU (tests/test_masked_eval.py);
this script produces the chip-side artifact:

  * equality selfcheck: bucket-padded masked extraction vs unpadded
    per-image forwards, both orientations, real Tokyo-like shapes;
  * per-bucket latency: padded masked batch vs the per-shape-compiled
    batch-1 loop the reference's strategy implies;
  * the biggest bucket's behavior with the fused Pallas head on/off on the
    full-size (unmasked) forward — the masked path itself uses the XLA head
    (the fused kernel rejects masks by contract).

Usage: python scripts/masked_eval_chip.py [--out logs/masked_eval_chip.json]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


class ArraySource:
    """Variable-shape in-memory source with the header-only shape_of the
    PaddedBatchLoader uses for decode-free bucketing."""

    def __init__(self, arrays):
        self.arrays = arrays

    def __len__(self):
        return len(self.arrays)

    def load(self, i):
        return self.arrays[i]

    def shape_of(self, i):
        return self.arrays[i].shape


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(ROOT / "logs" / "masked_eval_chip.json"))
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="1/16-scale shapes + 4 clusters (CPU smoke of the "
                        "script's plumbing; numbers are meaningless)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openibl_tpu import models
    from openibl_tpu.parallel.extract import extract_features
    from openibl_tpu.data.loader import PaddedBatchLoader

    # Tokyo 24/7 query shapes after the shorter-side-640 test transform:
    # landscape ~640 x 850-854 (4:3-ish phone frames), portrait transposed.
    # Two distinct widths per orientation so padding is real, 12 images.
    rng = np.random.RandomState(0)
    shapes = ([(640, 854)] * 4 + [(640, 848)] * 3
              + [(854, 640)] * 3 + [(848, 640)] * 2)
    k = 64
    if args.tiny:
        shapes = [(h // 16 // 16 * 16, w // 16 // 16 * 16)
                  for h, w in shapes]
        k = 4
    images = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
              for h, w in shapes]

    model = models.create(
        "embednetpca",
        base=models.VGG16(compute_dtype=jnp.bfloat16),
        net_vlad=models.NetVLAD(num_clusters=k),
        pca_dim=256 if args.tiny else 4096,
    )
    params = model.init(jax.random.PRNGKey(0))

    out = {"platform": jax.default_backend(), "shapes": shapes}

    # 1) bucket-padded masked extraction (the shipped Tokyo path)
    src = ArraySource(images)
    loader = PaddedBatchLoader(src, batch_size=8)
    t0 = time.perf_counter()
    masked = extract_features(model.apply, params, loader,
                              masked_apply_fn=model.apply_masked)
    out["masked_compile_plus_run_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        masked = extract_features(model.apply, params,
                                  PaddedBatchLoader(src, batch_size=8),
                                  masked_apply_fn=model.apply_masked)
    out["masked_run_s"] = round((time.perf_counter() - t0) / args.iters, 3)

    # 2) unpadded per-image forwards (one compile per distinct shape — the
    # reference's batch-1-per-shape strategy)
    fwd = jax.jit(model.apply)
    t0 = time.perf_counter()
    per_img = np.concatenate([
        np.asarray(fwd(params, jnp.asarray(im[None]))) for im in images
    ])
    out["per_image_compile_plus_run_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        per_img = np.concatenate([
            np.asarray(fwd(params, jnp.asarray(im[None]))) for im in images
        ])
    out["per_image_run_s"] = round((time.perf_counter() - t0) / args.iters, 3)

    # equality selfcheck: same descriptors up to bf16 accumulation noise
    cos = np.sum(masked * per_img, axis=1) / (
        np.linalg.norm(masked, axis=1) * np.linalg.norm(per_img, axis=1))
    out["selfcheck"] = {
        "max_abs_diff": float(np.max(np.abs(masked - per_img))),
        "min_cosine": float(np.min(cos)),
    }

    # 3) biggest bucket, full-size unmasked forward, fused head off/on
    big = jnp.asarray(np.stack([images[0]] * 8))  # (8, 640, 854, 3) uint8
    for fused in (False, True):
        if fused and jax.default_backend() != "tpu":
            continue
        import dataclasses

        m = dataclasses.replace(
            model, net_vlad=dataclasses.replace(model.net_vlad, fused=fused))
        f = jax.jit(m.apply)
        try:
            t0 = time.perf_counter()
            np.asarray(f(params, big))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = f(params, big)
            np.asarray(r)
            out[f"big_bucket_fused_{fused}"] = {
                "ok": True, "compile_s": round(compile_s, 2),
                "run_s": round((time.perf_counter() - t0) / args.iters, 3),
            }
        except Exception as e:
            out[f"big_bucket_fused_{fused}"] = {
                "ok": False, "error": f"{type(e).__name__}: {str(e)[:200]}"}

    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
