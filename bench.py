"""Benchmark: descriptor extraction images/sec/chip at 480x640.

The reference publishes no throughput numbers (SURVEY.md §6); BASELINE.json's
north star is >5x the reference's per-GPU extraction rate on a v5e chip. The
baseline constant below is an estimate of the reference stack's per-GPU rate
(torch VGG16+NetVLAD fp32 at 480x640 on the 11GB-class GPUs it documents,
docs/REPRODUCTION.md:5-7): ~50 img/s.

Prints ONE JSON line per measured mode:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "tflops": N, "mfu": N}
The default TPU extract run emits TWO lines — pure bf16 and mixed bf16/int8
(quantized names carry an _int8 tag) — so the cross-round flagship series
stays apples-to-apples (VERDICT r4). "mfu" is achieved/peak dense matmul
throughput with FLOPs = 2*MACs on both sides (v5e bf16 peak 197 TFLOP/s);
the train/sfrs metrics take their FLOPs from the compiled executable's own
cost analysis (post-DCE — the frozen conv1-4 backward is eliminated).
"""

import argparse
import json
import sys
import time

import numpy as np

# Documented estimates of the reference stack's per-GPU rates (torch fp32 on
# the 11GB-class GPUs its docs assume). Derivations:
#   extract: VGG16+NetVLAD fwd at 480x640 ~ 50 img/s
#   train:   fwd+bwd on a 12-image tuple (~3x fwd cost) ~ 0.7 tuples/s
#   query:   fwd (~20 ms) + CPU 100k-distmat + argsort (~20 ms) ~ 40 ms
REFERENCE_GPU_IMG_PER_SEC = 50.0
REFERENCE_GPU_TRAIN_TUPLES_PER_SEC = 0.7
REFERENCE_GPU_QUERY_MS = 40.0
# SFRS gen>=1 step: the reference runs THREE forwards (12-image easy tuple +
# 11-image diff tuple twice: student and teacher, trainers.py:235-245) plus
# backward over two of them ~ 1.4x its baseline step -> ~0.5 tuples/s
REFERENCE_GPU_SFRS_TUPLES_PER_SEC = 0.5

# v5e peak dense matmul throughput (one MXU chip): 197 TFLOP/s bf16,
# 394 TOP/s int8 — the denominators for the MFU field. FLOPs are counted
# with the standard 2*MAC convention (multiply + accumulate), the same
# convention those peak numbers use.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_INT8_OPS = 394e12


def vgg16_netvlad_flops(height, width):
    """Analytic forward FLOPs/image (2*MACs) of VGG16-conv5 + NetVLAD + PCA.

    The conv stack is ~99.7% of the work (187.9 GFLOP at 480x640); the head
    adds the 1x1 soft-assign conv, the factorized VLAD accumulation
    (models/netvlad.py) and the 32768->4096 PCA matmul (~0.6 GFLOP).
    Returns (total, per_stage) where per_stage maps conv block -> FLOPs —
    the roofline split in docs/SCALING.md is derived from it.
    """
    blocks = [  # VGG16 conv blocks to conv5_3 (pool follows all but 5)
        [(3, 64), (64, 64)],
        [(64, 128), (128, 128)],
        [(128, 256), (256, 256), (256, 256)],
        [(256, 512), (512, 512), (512, 512)],
        [(512, 512), (512, 512), (512, 512)],
    ]
    per_stage = {}
    h, w = height, width
    for bi, block in enumerate(blocks, start=1):
        fl = sum(2 * h * w * cin * cout * 9 for cin, cout in block)
        per_stage[f"conv{bi}"] = fl
        h, w = h // 2, w // 2  # pool1..4 halve; pool5 absent (cut at conv5)
    npix = (height // 16) * (width // 16)
    head = (2 * npix * 512 * 64      # soft-assignment logits (1x1 conv)
            + 2 * npix * 512 * 64    # factorized VLAD accumulation
            + 2 * 64 * 512 * 4096)   # PCA projection 32768 -> 4096
    per_stage["head"] = head
    return sum(per_stage.values()), per_stage


def _aot_step(jitted, *args, alarm_s=0):
    """AOT-compile a jitted train step and harvest its exact FLOPs.

    Returns (callable, flops-per-call or None). The compiled executable is
    used for the benchmark loop itself (no second compile), and its
    cost_analysis gives the POST-optimization FLOPs — which matters here:
    XLA dead-code-eliminates the backward through the frozen conv1-4 stack
    (measured: the masked step is 1.12x forward FLOPs at 64x64 where a full
    backward would be 3.00x), so an analytic fwd+bwd formula would
    overstate the work and flatter the MFU.

    alarm_s>0 bounds the compile with SIGALRM (main thread only): on a
    degraded tunnel day the ts8 whole-program compile can outlast the
    collector window that r4's run fit in 3x over
    (logs/tpu_collect_r05/log.txt bench_train_ts8 rc=124), and a hung AOT
    must degrade to the plain jit + scaled-flops path, not eat the task's
    entire budget."""
    import signal
    import threading

    can_alarm = (alarm_s > 0 and hasattr(signal, "SIGALRM")
                 and threading.current_thread() is threading.main_thread())
    if can_alarm:
        def _raise(signum, frame):
            raise TimeoutError(f"AOT compile exceeded {alarm_s}s")

        prev = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(alarm_s)
    try:
        compiled = jitted.lower(*args).compile()
    except Exception:
        return jitted, None
    finally:
        if can_alarm:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older JAX returns [dict]
            ca = ca[0] if ca else {}
        flops = float((ca or {}).get("flops", 0)) or None
    except Exception:
        pass
    return compiled, flops


def _scaled_step_flops(jitted, small_args, height, width, sh, sw):
    """Post-DCE step FLOPs at full resolution, measured at a small spatial
    size and scaled by the pixel ratio.

    Exact for the conv stack: every 3x3 same-padding conv's fwd/bwd FLOPs
    are 2*H*W*cin*cout*9, linear in H*W (both sizes /16-divisible so all
    pooled stages scale identically), and the DCE structure (frozen conv1-4
    backward eliminated) is shape-independent. The only off-scale terms are
    the descriptor-space loss and the O(params) optimizer update — <0.3% of
    a 480x640 step. Fallback for when the full-shape AOT compile times out;
    returns None if the small compile yields no cost analysis either."""
    _, fs = _aot_step(jitted, *small_args, alarm_s=180)
    if not fs:
        return None
    return fs * (height * width) / (sh * sw)


def _mfu_fields(rate_tuples_per_sec, flops_per_call, tuples_per_call, dtype):
    # mfu only for bf16 compute: the denominator is the bf16 MXU peak, and
    # an f32 run has no single comparable peak (XLA decomposes f32 matmuls
    # into several bf16 passes) — dividing by the bf16 peak would overstate
    # an f32 run's utilization ~2-3x in a committed artifact
    if not flops_per_call or dtype != "bfloat16":
        return {}
    tflops = rate_tuples_per_sec * flops_per_call / tuples_per_call / 1e12
    return {"tflops": round(tflops, 1),
            "mfu": round(tflops * 1e12 / V5E_PEAK_BF16_FLOPS, 3)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = sweep and report the best")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--quick", action="store_true", help="small sweep")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no-fused", action="store_true",
                   help="disable the fused Pallas NetVLAD head")
    p.add_argument("--int8", action="store_true", default=None,
                   help="extract metric only: run ONLY the post-training-"
                        "quantized backbone (mixed bf16/int8, ops/quant.py) "
                        "— the MXU's int8 path runs ~2x bf16; measured 1.30x "
                        "end to end (1002 vs 770 img/s, descriptor cosine vs "
                        "f32 >0.999, tests/test_quant.py). Quantized metric "
                        "names carry an _int8 tag; plain ones don't. "
                        "DEFAULT on TPU is BOTH: one bf16 line then one int8 "
                        "line, so the cross-round series stays comparable")
    p.add_argument("--no-int8", dest="int8", action="store_false",
                   help="disable the quantized backbone (pure bf16 extract)")
    p.add_argument("--metric", type=str, default="extract",
                   choices=["extract", "query", "train", "sfrs"],
                   help="extract = images/sec/chip; query = end-to-end "
                        "single-query p50 latency vs a 100k-item gallery; "
                        "train = SARE train-step tuples/sec (12 images each); "
                        "sfrs = SFRS gen>=1 step tuples/sec (12-image easy + "
                        "11-image diff tuple, hard + soft distillation loss)")
    p.add_argument("--gallery-size", type=int, default=100_000)
    p.add_argument("--ivf-nprobe", type=int, default=0,
                   help="query metric only: >0 searches via an IVF coarse "
                        "index probing this many of 256 cells per query "
                        "(ops.ivf) instead of the exact full-gallery scan")
    p.add_argument("--device-time", action="store_true",
                   help="query metric only: report per-query DEVICE latency "
                        "by scanning many queries inside one jit (single "
                        "dispatch; the synchronous p50 sits on the tunnel's "
                        "~33 ms dispatch floor and says nothing about "
                        "on-device headroom)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (code-path validation when "
                        "the tunnel is degraded; numbers are meaningless)")
    p.add_argument("--max-seconds", type=int, default=1500,
                   help="hard wall-clock cap: exit(3) instead of hanging "
                        "when the TPU tunnel is degraded (backend init and "
                        "transfers can block indefinitely)")
    args = p.parse_args()

    deadline_timer = None
    if args.max_seconds > 0:
        import os
        import threading

        def _deadline():
            print(
                f"bench exceeded --max-seconds={args.max_seconds} "
                f"(degraded TPU tunnel?) — aborting without a result",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

        deadline_timer = threading.Timer(args.max_seconds, _deadline)
        deadline_timer.daemon = True
        deadline_timer.start()

    try:
        _bench_body(args)
    finally:
        # cancel so in-process embedders (the smoke tests exec this file)
        # don't inherit a live os._exit timer after a successful run
        if deadline_timer is not None:
            deadline_timer.cancel()


def _bench_body(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openibl_tpu import models

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    fused = jax.default_backend() == "tpu" and not args.no_fused
    if args.int8 is not None and args.metric != "extract":
        # an explicit --int8/--no-int8 with a non-extract metric would be
        # silently ignored (ADVICE r4) — reject instead
        print(f"--int8/--no-int8 applies to --metric extract only "
              f"(got --metric {args.metric})", file=sys.stderr)
        sys.exit(2)
    if args.metric == "extract":
        if args.int8 is None:
            # default on TPU: BOTH modes, one JSON line each (the flagship
            # series stays apples-to-apples across rounds — VERDICT r4 weak
            # #3); CPU int8 convs are reference-slow and would stall smoke
            # tests, so CPU smoke runs bf16 only
            extract_modes = ([False, True]
                             if jax.default_backend() == "tpu" else [False])
        else:
            extract_modes = [bool(args.int8)]
    else:
        extract_modes = [False]

    def build_extract_model(quantized):
        model = models.create(
            "embednetpca",
            base=models.VGG16(compute_dtype=dtype),
            net_vlad=models.NetVLAD(num_clusters=64, fused=fused),
            pca_dim=4096,
        )
        params = model.init(jax.random.PRNGKey(0))
        if quantized:
            from openibl_tpu.ops.quant import quantize_model_params

            calib = jax.jit(
                lambda k: jax.random.normal(
                    k, (8, args.height, args.width, 3)
                ) * 40
            )(jax.random.PRNGKey(7))
            model, params = quantize_model_params(model, params, calib)
        return model, params, jax.jit(model.apply)

    if args.metric == "query":
        model, params, fwd = build_extract_model(False)
        # end-to-end query path: one 480x640 image -> 4096-d descriptor ->
        # top-10 against an HBM-resident gallery (the serving-latency shape)
        from openibl_tpu.ops.distance import topk_nearest

        rng = np.random.RandomState(0)
        # generate the gallery on device: it is resident state in a real
        # serving setup, and a 1.6GB H2D is not the metric
        gallery = jax.jit(
            lambda k: jax.random.normal(k, (args.gallery_size, 4096)),
        )(jax.random.PRNGKey(0))
        img = jnp.asarray(
            rng.randn(1, args.height, args.width, 3).astype(np.float32) * 40
        )

        ivf_suffix = ""
        if args.ivf_nprobe:
            # IVF over the synthetic gallery. Random-uniform data has no
            # cluster structure, so random gallery rows ARE k-means-quality
            # centroids for it and cells come out balanced — the bench
            # measures the probe path's latency, not recall. The ranking
            # (device) + greedy fill (host, 3.2MB D2H) avoids pulling the
            # 1.6GB gallery through the tunnel.
            from openibl_tpu.ops.ivf import fill_lists, ivf_search

            nlist = 256
            maxlen = -(-2 * args.gallery_size // nlist)
            centroids = gallery[:nlist]
            _, ranked = topk_nearest(gallery, centroids, k=8)
            # pass geometry so overflow rows spill to their NEAREST open
            # cell exactly like the shipped build_ivf (VERDICT r4 weak #2 —
            # without it the benched index's recall characteristics silently
            # differ from ops.ivf.build_ivf's). The device gallery is passed
            # as-is: fill_lists gathers ONLY the overflow rows, so the 1.6GB
            # gallery never crosses the tunnel.
            lists = jnp.asarray(
                fill_lists(np.asarray(ranked), nlist, maxlen,
                           x=gallery, centroids=np.asarray(centroids)))
            nprobe = min(args.ivf_nprobe, nlist)
            ivf_suffix = f"_ivf{nprobe}of{nlist}"

            @jax.jit
            def query(params, img, gallery):
                desc = model.apply(params, img)
                return ivf_search(desc, gallery, centroids, lists,
                                  k=10, nprobe=nprobe)
        else:
            @jax.jit
            def query(params, img, gallery):
                desc = model.apply(params, img)
                return topk_nearest(desc, gallery, k=10, chunk=16384)

        np.asarray(query(params, img, gallery)[1])  # compile + warm
        if args.device_time:
            # Per-query DEVICE latency: run n distinct queries inside ONE
            # jitted lax.scan, so a single dispatch covers all of them and
            # the tunnel's ~33 ms per-dispatch floor amortizes to <1 ms/query.
            # (Keeping multiple separate dispatches in flight was measured
            # NOT to help — the axon client serializes dispatches, so a
            # depth-9 pipeline still reported exactly the floor;
            # logs/tpu_collect_r04/query_device.out.)
            from jax import lax

            n = max(args.iters, 50)
            # each distinct query image is generated INSIDE the scan body
            # from its fold_in'd key (O(1) HBM for any n; a materialized
            # (n, H, W, 3) batch would be ~15 GB at n=4000 next to the
            # 1.6 GB gallery). The per-step normal fill is ~4 MB of VPU
            # writes — noise against the ~ms conv forward it precedes.
            keys = jax.random.split(jax.random.PRNGKey(2), n)

            @jax.jit
            def query_scan(params, keys, gallery):
                def body(_, k):
                    im = jax.random.normal(
                        k, (1, args.height, args.width, 3)) * 40
                    return 0, query(params, im, gallery)[1]

                _, idxs = lax.scan(body, 0, keys)
                return idxs

            np.asarray(query_scan(params, keys, gallery))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(query_scan(params, keys, gallery))
            amort = (time.perf_counter() - t0) / n * 1000
            print(json.dumps({
                "metric": (f"query_device_ms_{args.gallery_size}gallery"
                           f"{ivf_suffix}_scan{n}"),
                "value": round(amort, 2),
                "unit": "ms",
                "vs_baseline": round(REFERENCE_GPU_QUERY_MS / amort, 2),
            }))
            return
        times = []
        for _ in range(max(args.iters, 10)):
            t0 = time.perf_counter()
            np.asarray(query(params, img, gallery)[1])
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times)) * 1000
        print(json.dumps({
            "metric": (f"query_p50_latency_ms_{args.gallery_size}gallery"
                       f"{ivf_suffix}"),
            "value": round(p50, 2),
            "unit": "ms",
            "vs_baseline": round(REFERENCE_GPU_QUERY_MS / p50, 2),
        }))
        return

    if args.metric == "train":
        # full SARE train step on the published tuple shape
        # (anchor + positive + 10 negatives at 480x640)
        from openibl_tpu.engine.trainer import Trainer

        tmodel = models.create(
            "embednet", base=models.VGG16(compute_dtype=dtype),
            net_vlad=models.NetVLAD(num_clusters=64),
        )
        tparams = tmodel.init(jax.random.PRNGKey(0))
        # remat off: v5e's 16GB HBM fits 4-tuple activations; remat is for
        # bigger tuples/images (measured: remat costs ~45% here)
        trainer = Trainer(tmodel, loss_type="sare_ind", lr=1e-3, remat=False)
        opt = trainer.init(tparams)
        t_size = args.batch_size or 4
        tup = jax.jit(
            lambda k: jax.random.normal(
                k, (t_size, 12, args.height, args.width, 3)
            ) * 40
        )(jax.random.PRNGKey(1))
        # AOT: the compiled executable runs the loop AND reports exact FLOPs
        # (mesh is None here so trainer._step's device-batch handling is a
        # no-op; trainer.step() would route to the same jit)
        step, step_flops = _aot_step(trainer._step, tparams, opt, tup,
                                     alarm_s=300)
        sh, sw = 64, 96
        if (step_flops is None and args.dtype == "bfloat16"
                and args.height % 16 == 0 and args.width % 16 == 0
                and (args.height, args.width) != (sh, sw)):
            tup_s = jax.jit(
                lambda k: jax.random.normal(
                    k, (t_size, 12, sh, sw, 3)) * 40
            )(jax.random.PRNGKey(1))
            step_flops = _scaled_step_flops(
                trainer._step, (tparams, opt, tup_s),
                args.height, args.width, sh, sw)
        tparams, opt, loss = step(tparams, opt, tup)  # compile/warm
        float(loss)
        group = max(args.iters // 3, 1)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(group):
                tparams, opt, loss = step(tparams, opt, tup)
            float(loss)  # fence
            rates.append(t_size * group / (time.perf_counter() - t0))
        rate = float(np.median(rates))
        print(json.dumps({
            "metric": f"sare_train_tuples_per_sec_{args.height}x{args.width}_{args.dtype}_ts{t_size}",
            "value": round(rate, 3),
            "unit": "tuples/sec/chip",
            "vs_baseline": round(rate / REFERENCE_GPU_TRAIN_TUPLES_PER_SEC, 2),
            **_mfu_fields(rate, step_flops, t_size, args.dtype),
        }))
        return

    if args.metric == "sfrs":
        # flagship SFRS step at the published shape: tuple_size per chip,
        # easy (anchor + pos + 10 negs) + diff (anchor + 10 difficult
        # positives), gen>=1 so the hardest-of-9-regions hard loss AND the
        # teacher-forward soft loss are both on the clock
        from openibl_tpu.engine.sfrs import SFRSTrainer

        t_size = args.batch_size or 1
        smodel = models.create(
            "embedregionnet", base=models.VGG16(compute_dtype=dtype),
            net_vlad=models.NetVLAD(num_clusters=64), tuple_size=t_size,
        )
        sparams = smodel.init(jax.random.PRNGKey(0))
        t_params = smodel.init(jax.random.PRNGKey(1))
        trainer = SFRSTrainer(smodel, loss_type="sare_ind", neg_num=10,
                              lr=1e-3)
        opt = trainer.init_generation(sparams)
        step = trainer.step_fn(1)
        mk = jax.jit(
            lambda k, n: jax.random.normal(
                k, (t_size, n, args.height, args.width, 3)
            ) * 40,
            static_argnums=1,
        )
        easy = mk(jax.random.PRNGKey(2), 12)
        diff = mk(jax.random.PRNGKey(3), 11)
        step, step_flops = _aot_step(step, sparams, t_params, opt, easy, diff,
                                     alarm_s=300)
        sh, sw = 64, 96
        if (step_flops is None and args.dtype == "bfloat16"
                and args.height % 16 == 0 and args.width % 16 == 0
                and (args.height, args.width) != (sh, sw)):
            mk_s = jax.jit(
                lambda k, n: jax.random.normal(
                    k, (t_size, n, sh, sw, 3)) * 40,
                static_argnums=1,
            )
            step_flops = _scaled_step_flops(
                step, (sparams, t_params, opt,
                       mk_s(jax.random.PRNGKey(2), 12),
                       mk_s(jax.random.PRNGKey(3), 11)),
                args.height, args.width, sh, sw)
        sparams, opt, lh, ls = step(sparams, t_params, opt, easy, diff)
        float(lh)  # compile + fence
        group = max(args.iters // 3, 1)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(group):
                sparams, opt, lh, ls = step(sparams, t_params, opt, easy, diff)
            float(lh)  # fence
            rates.append(t_size * group / (time.perf_counter() - t0))
        rate = float(np.median(rates))
        print(json.dumps({
            "metric": f"sfrs_train_tuples_per_sec_{args.height}x{args.width}_{args.dtype}_ts{t_size}",
            "value": round(rate, 3),
            "unit": "tuples/sec/chip",
            "vs_baseline": round(rate / REFERENCE_GPU_SFRS_TUPLES_PER_SEC, 2),
            **_mfu_fields(rate, step_flops, t_size, args.dtype),
        }))
        return

    flops_per_img, _ = vgg16_netvlad_flops(args.height, args.width)
    rng = np.random.RandomState(0)
    any_line = False
    for quantized in extract_modes:
        model, params, fwd = build_extract_model(quantized)
        batches = [args.batch_size] if args.batch_size else (
            [8, 16] if args.quick else (
                # the FULL int8 program at bs>=192 stalls the axon
                # tpu_compile_helper indefinitely (scripts/int8_bs192_repro.py;
                # logs/tpu_collect_r05/int8_bs192_crash.log — every single
                # layer compiles fine, the whole-program compile hangs);
                # bs128 wins the sweep in both modes anyway
                [16, 32, 64, 128] if quantized
                else [16, 32, 64, 128, 192, 256]
            )
        )
        best = 0.0
        best_bs = 0
        for bs in batches:
            x = jnp.asarray(
                rng.randn(bs, args.height, args.width, 3)
                .astype(np.float32) * 40
            )

            def run_once():
                # NB: on the tunneled TPU platform block_until_ready is a
                # no-op; np.asarray materialization is the only reliable
                # fence. Keep two batches in flight so dispatch/D2H overlaps
                # compute (sustained-throughput shape; +40% over fully
                # synchronous timing).
                np.asarray(fwd(params, x))  # compile + warm
                t0 = time.perf_counter()
                pending = []
                for _ in range(args.iters):
                    pending.append(fwd(params, x))
                    if len(pending) > 2:
                        np.asarray(pending.pop(0))
                for p in pending:
                    np.asarray(p)
                return time.perf_counter() - t0

            try:
                try:
                    dt = run_once()
                except Exception:  # transient tunnel errors; retry once
                    dt = run_once()
            except Exception as e:  # persistent failure (e.g. OOM)
                if args.verbose:
                    print(f"batch {bs}: {type(e).__name__}: {str(e)[:200]}",
                          file=sys.stderr)
                break
            rate = bs * args.iters / dt
            if args.verbose:
                tag = "int8 " if quantized else ""
                print(f"{tag}batch {bs}: {rate:.1f} img/s", file=sys.stderr)
            if rate > best:
                best, best_bs = rate, bs

        if best_bs == 0:
            # every batch size failed persistently: a 0.0 img/s "success"
            # would be recorded by automation as a valid benchmark
            print("bench: no batch size completed (persistent device "
                  "failure)", file=sys.stderr, flush=True)
            continue
        any_line = True
        qtag = "_int8" if quantized else ""
        # MFU vs the chip's bf16 matmul peak (2*MAC FLOP convention on both
        # sides); bf16 runs only — an f32 run has no single comparable peak.
        # For the mixed bf16/int8 mode the true ceiling is higher (int8
        # layers run against the 394 TOP/s path), so its "mfu" is a lower
        # bound — docs/SCALING.md carries the per-precision split.
        print(json.dumps({
            "metric": f"descriptor_images_per_sec_per_chip_{args.height}x{args.width}_{args.dtype}{qtag}_bs{best_bs}",
            "value": round(best, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(best / REFERENCE_GPU_IMG_PER_SEC, 2),
            **_mfu_fields(best, flops_per_img, 1, args.dtype),
        }), flush=True)
    if not any_line:
        sys.exit(1)


if __name__ == "__main__":
    main()
