"""bench.py smoke tests (tiny shapes, CPU): the driver depends on bench
emitting exactly one valid JSON line per metric."""

import json
import os.path as osp
import sys

import pytest

BENCH = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "bench.py")


def _run_bench(argv, capsys):
    old = sys.argv
    # --max-seconds 0: the deadline is an os._exit(3) timer — even though
    # bench.py cancels it on normal completion, never arm a process-killer
    # inside the pytest process
    sys.argv = ["bench.py"] + argv + ["--max-seconds", "0"]
    try:
        with open(BENCH) as f:
            code = f.read()
        exec(compile(code, BENCH, "exec"), {"__name__": "__main__"})
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    return payload


def test_aot_step_alarm_falls_back_to_jitted():
    """A hung AOT compile must degrade to the plain jitted fn, not block
    (the ts8 whole-program compile outlasted the 20-min collector window on
    a degraded tunnel day, logs/tpu_collect_r05/log.txt)."""
    import importlib.util
    import time

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    class _SlowLowered:
        def compile(self):
            time.sleep(30)

    class _FakeJitted:
        def lower(self, *a):
            return _SlowLowered()

    fake = _FakeJitted()
    t0 = time.perf_counter()
    fn, flops = bench._aot_step(fake, 1, alarm_s=1)
    assert time.perf_counter() - t0 < 10
    assert fn is fake and flops is None


@pytest.mark.parametrize("metric_args", [
    ["--batch-size", "2", "--iters", "2", "--height", "64", "--width", "64",
     "--dtype", "float32"],
    ["--metric", "train", "--batch-size", "1", "--iters", "3",
     "--height", "64", "--width", "64", "--dtype", "float32"],
    ["--metric", "query", "--gallery-size", "256", "--iters", "2",
     "--height", "64", "--width", "64", "--dtype", "float32"],
    ["--metric", "query", "--gallery-size", "512", "--iters", "2",
     "--height", "64", "--width", "64", "--dtype", "float32",
     "--ivf-nprobe", "8"],
    ["--metric", "query", "--gallery-size", "256", "--iters", "2",
     "--height", "64", "--width", "64", "--dtype", "float32",
     "--device-time"],
    ["--metric", "sfrs", "--batch-size", "1", "--iters", "3",
     "--height", "64", "--width", "64", "--dtype", "float32"],
    ["--batch-size", "2", "--iters", "2", "--height", "64", "--width", "64",
     "--dtype", "float32", "--int8"],
])
def test_bench_emits_json(metric_args, capsys):
    payload = _run_bench(metric_args, capsys)
    assert payload["value"] > 0
