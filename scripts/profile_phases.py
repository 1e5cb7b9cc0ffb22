"""Phase-level profiling artifact for the training pipeline (the reference
has only per-iteration wall-clock meters, ibl/trainers.py:28-61; this is the
first-class counterpart SURVEY.md §5 calls for).

Runs one epoch of baseline training on the hermetic synthetic dataset with
``utils/profiling.PhaseTimer`` threaded through ``engine/pipeline.py`` and
prints ONE JSON line with the per-phase wall-clock breakdown
(mining_extract / mining_refresh / train / eval). On TPU it uses
reference-scale 480x640 images and also captures a jax.profiler device trace
under --trace-dir (view in Perfetto/TensorBoard).
"""

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="logs/traces",
                   help="jax.profiler trace output (TPU only; '' disables)")
    p.add_argument("--height", type=int, default=0,
                   help="0 = 480 on TPU, 32 on CPU")
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this sets jax.config after import)")
    p.add_argument("--max-seconds", type=int, default=1100,
                   help="hard cap: exit(3) instead of hanging on a degraded "
                        "tunnel")
    args = p.parse_args()

    if args.max_seconds > 0:
        import threading

        def _deadline():
            print("profile_phases exceeded --max-seconds — aborting",
                  file=sys.stderr, flush=True)
            os._exit(3)

        t = threading.Timer(args.max_seconds, _deadline)
        t.daemon = True
        t.start()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from openibl_tpu.config import DataConfig, TrainConfig
    from openibl_tpu.engine import pipeline
    from openibl_tpu.utils import profiling

    on_tpu = jax.default_backend() == "tpu"
    h = args.height or (480 if on_tpu else 32)
    w = args.width or (640 if on_tpu else 48)

    with tempfile.TemporaryDirectory() as tmp:
        cfg = TrainConfig(
            data=DataConfig(dataset="synthetic", scale=None,
                            data_dir=os.path.join(tmp, "data"),
                            height=h, width=w,
                            test_batch_size=16 if on_tpu else 8),
            num_clusters=8, loss_type="sare_ind", tuple_size=1,
            neg_num=2, neg_pool=5, cache_size=4, epochs=1, eval_step=1,
            pca_dim=16, logs_dir=os.path.join(tmp, "logs"),
            init_dir=os.path.join(tmp, "logs"), print_freq=1000, seed=0,
            compute_dtype="bfloat16" if on_tpu else "float32",
        )
        timer = profiling.PhaseTimer()
        t0 = time.perf_counter()
        if on_tpu and args.trace_dir:
            os.makedirs(args.trace_dir, exist_ok=True)
            with profiling.trace(args.trace_dir):
                pipeline.run_baseline_training(cfg, verbose=False, timer=timer)
        else:
            pipeline.run_baseline_training(cfg, verbose=False, timer=timer)
        wall = time.perf_counter() - t0

    print(json.dumps({
        "metric": "phase_breakdown",
        "backend": jax.default_backend(),
        "image_hw": [h, w],
        "wall_seconds": round(wall, 2),
        "phases": {
            name: {"seconds": round(timer.totals[name], 3),
                   "count": timer.counts[name]}
            for name in sorted(timer.totals)
        },
        "hbm": profiling.device_memory_stats() if on_tpu else None,
        "trace_dir": args.trace_dir if (on_tpu and args.trace_dir) else None,
    }))


if __name__ == "__main__":
    main()
