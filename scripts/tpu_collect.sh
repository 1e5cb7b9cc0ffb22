#!/bin/bash
# Detached TPU artifact collector (CLAUDE.md outage pattern).
#
# Loops on a tunnel probe; whenever the tunnel is up, works through the task
# list below, stamping each task .done on success so intermittent recovery
# windows make incremental progress. Exits when every task is done.
#
# Launch detached:  setsid nohup bash scripts/tpu_collect.sh > /dev/null 2>&1 &
# Progress:         tail -f logs/tpu_collect_r03/log.txt
set -u
OUT=${TPU_COLLECT_OUT:-/root/repo/logs/tpu_collect_r03}
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date +%F' '%T)] $*" >> "$OUT/log.txt"; }

probe() { timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

# run NAME TIMEOUT CMD... — run CMD with stdout->$OUT/NAME.out, stamp .done
# on rc=0. Deterministic failures (OOM, code bug — not tunnel flakiness,
# which the outer probe gate absorbs) stamp .fail after MAX_ATTEMPTS so the
# loop terminates instead of re-burning TPU windows forever.
MAX_ATTEMPTS=3
run() {
  local name=$1 tmo=$2; shift 2
  [ -e "$OUT/$name.done" ] || [ -e "$OUT/$name.fail" ] && return 0
  local att=0
  [ -f "$OUT/$name.attempts" ] && att=$(cat "$OUT/$name.attempts")
  att=$((att + 1)); echo "$att" > "$OUT/$name.attempts"
  log "start $name (attempt $att/$MAX_ATTEMPTS)"
  timeout "$tmo" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  log "end $name rc=$rc: $(tail -c 300 "$OUT/$name.out" | tr '\n' ' ')"
  if [ $rc -eq 0 ] && [ -s "$OUT/$name.out" ]; then
    touch "$OUT/$name.done"
  elif [ "$att" -ge "$MAX_ATTEMPTS" ]; then
    log "$name giving up after $att attempts"
    touch "$OUT/$name.fail"
  fi
  return $rc
}

all_done() {
  for t in mosaic_probe selfcheck bench_extract bench_train bench_query \
           query_device extract_bs160 extract_bs192 extract_bs256 \
           train_ts6 train_ts8 profile_trace; do
    [ -e "$OUT/$t.done" ] || [ -e "$OUT/$t.fail" ] || return 1
  done
  return 0
}

log "collector started (pid $$)"
while ! all_done; do
  if ! probe; then
    log "tunnel down; sleeping 60s"
    sleep 60
    continue
  fi
  log "TUNNEL UP"
  # Ordered by value: headline bench numbers first (what BENCH_r03 needs),
  # then the open kernel question, then sweeps.
  run bench_extract 1600 python -u bench.py --metric extract
  run bench_train   1600 python -u bench.py --metric train
  run bench_query   1600 python -u bench.py --metric query
  run query_device  1600 python -u bench.py --metric query --device-time
  run mosaic_probe  1200 python -u scripts/mosaic_probe.py
  run selfcheck     1200 python -u scripts/tpu_selfcheck.py
  run extract_bs160  900 python -u bench.py --metric extract --batch-size 160
  run extract_bs192  900 python -u bench.py --metric extract --batch-size 192
  run extract_bs256  900 python -u bench.py --metric extract --batch-size 256
  run train_ts6      900 python -u bench.py --metric train --batch-size 6
  run train_ts8      900 python -u bench.py --metric train --batch-size 8
  run profile_trace 1200 python -u scripts/profile_phases.py
  sleep 5
done
log "ALL DONE"
