"""Run the full bench suite on the real chip and persist a committed artifact.

VERDICT r1 item 7: the driver's BENCH_r{N}.json captures only the default
extract metric; the query-p50 and train-tuples/s numbers (and the fused
Pallas head's speedup over the XLA head) must be recorded reproducibly.

Usage:  python scripts/bench_all.py --round 2   -> logs/bench_r02.json

Each entry is the verbatim JSON line bench.py printed, tagged with the arg
set and wall time. The fused-vs-XLA delta is computed from the two extract
runs and recorded under "fused_speedup".
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent

SUITE = [
    # bs128 pinned: the full batch sweep is the collector's own
    # extract_sweep task; re-sweeping twice here would blow the suite's
    # wall-clock budget on the tunneled chip
    # int8 is the TPU default since 2026-08-19 (ops/quant.py; _int8 metric
    # tag); the bf16 rows keep the historical comparison alive
    # explicit --int8: the TPU default runs BOTH modes (dual flagship
    # lines), which would duplicate the extract_fused bf16 pass here
    ("extract_int8", ["--metric", "extract", "--batch-size", "128",
                      "--int8"]),
    ("extract_fused", ["--metric", "extract", "--no-int8",
                       "--batch-size", "128"]),
    ("extract_nofused", ["--metric", "extract", "--no-int8", "--no-fused",
                         "--batch-size", "128"]),
    ("query", ["--metric", "query", "--iters", "30"]),
    ("query_device", ["--metric", "query", "--device-time"]),
    ("query_ivf32", ["--metric", "query", "--iters", "30",
                     "--ivf-nprobe", "32"]),
    ("query_ivf32_device", ["--metric", "query", "--device-time",
                            "--ivf-nprobe", "32"]),
    ("train", ["--metric", "train"]),
    ("train_sfrs", ["--metric", "sfrs"]),
]


def run_one(extra, timeout=1200):
    cmd = [sys.executable, str(ROOT / "bench.py")] + extra
    t0 = time.time()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=ROOT
    )
    wall = round(time.time() - t0, 1)
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                line = json.loads(ln)
            except json.JSONDecodeError:
                continue
    return {
        "args": extra,
        "rc": proc.returncode,
        "wall_s": wall,
        "result": line,
        "stderr_tail": proc.stderr[-400:] if proc.returncode else "",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated subset of suite names")
    ap.add_argument("--force", action="store_true",
                    help="re-run entries already captured with rc=0 "
                         "(default: resume — skip them)")
    args = ap.parse_args()

    only = set(filter(None, args.only.split(",")))
    out = {"round": args.round, "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
           "entries": {}}
    path = ROOT / "logs" / f"bench_r{args.round:02d}.json"
    if path.exists():  # allow incremental --only reruns
        out = json.loads(path.read_text())
        out["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")

    path.parent.mkdir(exist_ok=True)

    def flush():
        # incremental + atomic after every entry: a timeout mid-suite (the
        # tunneled chip can stretch any run) still leaves all completed
        # entries on disk, and the next attempt can resume with --only
        ef = out["entries"].get("extract_fused", {}).get("result")
        en = out["entries"].get("extract_nofused", {}).get("result")
        if ef and en and en["value"]:
            out["fused_speedup"] = round(ef["value"] / en["value"], 3)
        ei = out["entries"].get("extract_int8", {}).get("result")
        if ei and ef and ef["value"]:
            out["int8_speedup"] = round(ei["value"] / ef["value"], 3)
        tmp = path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(out, indent=2) + "\n")
        tmp.replace(path)

    for name, extra in SUITE:
        if only and name not in only:
            continue
        prev = out["entries"].get(name)
        if (not args.force and prev and prev.get("rc") == 0
                and prev.get("result")):
            print(f"[bench_all] {name}: already captured (resume); "
                  f"--force to re-run", file=sys.stderr)
            continue
        print(f"[bench_all] {name}: bench.py {' '.join(extra)}",
              file=sys.stderr)
        out["entries"][name] = run_one(extra)
        print(f"[bench_all]   -> {out['entries'][name]['result']}",
              file=sys.stderr)
        flush()

    flush()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
