#!/bin/bash
# Second-wave round-5 collector: waits for the first collector (if running)
# to finish so the two never contend for the chip, then captures the
# artifacts added after the first wave launched:
#   * per-variant DEVICE serving latency (in-jit scan; the synchronous p50
#     table is tunnel-H2D dominated at bs16 — ~15 MB of pixels/batch)
#   * the PQ index's synchronous p50 row
#   * a long-window train-ts8 (insurance for the 1200 s first-wave slot
#     that timed out on the degraded tunnel)
#
# Launch detached:  setsid nohup bash scripts/tpu_collect_r05b.sh > /dev/null 2>&1 &
set -u
OUT=${TPU_COLLECT_OUT:-/root/repo/logs/tpu_collect_r05}
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date +%F' '%T)] $*" >> "$OUT/log_b.txt"; }

probe() { timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

# serialize behind the first-wave collector
FIRST_PID=${FIRST_COLLECTOR_PID:-}
if [ -n "$FIRST_PID" ]; then
  log "waiting for first-wave collector (pid $FIRST_PID)"
  while kill -0 "$FIRST_PID" 2>/dev/null; do sleep 30; done
  log "first-wave collector exited"
fi

TASKS=(
  "serving_devtime|2400|python -u scripts/bench_serving.py --device-time --out $OUT/serving_latency.json"
  "serving_pq|1800|python -u scripts/bench_serving.py --variants pq --out $OUT/serving_latency.json"
  "train_ts8_long|3000|if [ -e $OUT/bench_train_ts8.done ]; then echo skipped: first wave captured ts8; else python -u bench.py --metric train --batch-size 8 --max-seconds 2900; fi"
)

MAX_ATTEMPTS=3

run_one() {
  local name=$1 tmo=$2 cmd=$3
  [ -e "$OUT/$name.done" ] || [ -e "$OUT/$name.fail" ] && return 0
  local att=0
  [ -f "$OUT/$name.attempts" ] && att=$(cat "$OUT/$name.attempts")
  att=$((att + 1)); echo "$att" > "$OUT/$name.attempts"
  log "start $name (attempt $att/$MAX_ATTEMPTS)"
  timeout "$tmo" bash -c "$cmd" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  log "end $name rc=$rc: $(tail -c 300 "$OUT/$name.out" | tr '\n' ' ')"
  if [ $rc -eq 0 ] && [ -s "$OUT/$name.out" ]; then
    touch "$OUT/$name.done"
    return 0
  fi
  if ! probe; then
    att=$((att - 1)); echo "$att" > "$OUT/$name.attempts"
    log "$name failed during a tunnel outage; attempt refunded"
    return 1
  fi
  if [ "$att" -ge "$MAX_ATTEMPTS" ]; then
    log "$name giving up after $att attempts"
    touch "$OUT/$name.fail"
  fi
  return 0
}

all_done() {
  local spec name
  for spec in "${TASKS[@]}"; do
    name=${spec%%|*}
    [ -e "$OUT/$name.done" ] || [ -e "$OUT/$name.fail" ] || return 1
  done
  return 0
}

log "second-wave collector started (pid $$)"
while ! all_done; do
  if ! probe; then
    log "tunnel down; sleeping 60s"
    sleep 60
    continue
  fi
  for spec in "${TASKS[@]}"; do
    name=${spec%%|*}
    rest=${spec#*|}
    tmo=${rest%%|*}
    cmd=${rest#*|}
    run_one "$name" "$tmo" "$cmd" || break
  done
  sleep 5
done
log "ALL DONE"
