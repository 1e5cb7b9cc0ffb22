#!/bin/bash
# Fourth-wave round-5 collector: the pq_rerank serving device-time row
# (added to scripts/bench_serving.py after wave c launched). MERGEs into
# the same serving_latency.json — resume semantics skip the rows waves
# 1-3 already captured.
#
# Launch detached (serialized behind wave c via PREV_PID):
#   PREV_PID=<wave-c pid> setsid nohup bash scripts/tpu_collect_r05d.sh > /dev/null 2>&1 &
set -u
OUT=${TPU_COLLECT_OUT:-/root/repo/logs/tpu_collect_r05}
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date +%F' '%T)] $*" >> "$OUT/log_d.txt"; }

probe() { timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

PREV_PID=${PREV_PID:-}
if [ -n "$PREV_PID" ]; then
  log "waiting for previous collector (pid $PREV_PID)"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
  log "previous collector exited"
fi

TASKS=(
  "serving_pqrr|2400|python -u scripts/bench_serving.py --device-time --variants pq_rerank --out $OUT/serving_latency.json"
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

log "fourth-wave collector started (pid $$)"
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
