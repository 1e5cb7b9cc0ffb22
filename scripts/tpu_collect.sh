#!/bin/bash
# Detached TPU artifact collector (CLAUDE.md outage pattern).
#
# Loops on a tunnel probe; whenever the tunnel is up, works through the task
# list below, stamping each task .done on success so intermittent recovery
# windows make incremental progress. Exits when every task is done.
#
# Launch detached:  setsid nohup bash scripts/tpu_collect.sh > /dev/null 2>&1 &
# Progress:         tail -f logs/tpu_collect_r05/log.txt
set -u
OUT=${TPU_COLLECT_OUT:-/root/repo/logs/tpu_collect_r05}
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date +%F' '%T)] $*" >> "$OUT/log.txt"; }

probe() { timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

# Single source of truth for the task list: "name|timeout|command".
# Ordered per VERDICT r3 item 1 so a SHORT recovery window still yields the
# flagship number: single bs128 extract first (r2 showed bs128 wins the
# sweep), then train, then the honest device-time query, then the
# mosaic probe that decided conv1_1 (kernel since deleted), then the
# round-3 IVF features, then serving latency, sweeps, and profiles.
TASKS=(
  "bench_extract_dual|1800|python -u bench.py --metric extract"
  "bench_train_ts8|1200|python -u bench.py --metric train --batch-size 8"
  "bench_sfrs|1200|python -u bench.py --metric sfrs"
  "query_device|1200|python -u bench.py --metric query --device-time"
  "query_ivf32_device|1200|python -u bench.py --metric query --ivf-nprobe 32 --device-time"
  "serving_latency_quiet|2400|cp -n $OUT/serving_latency.json $OUT/serving_latency_contended.json 2>/dev/null; rm -f $OUT/serving_latency.json; python -u scripts/bench_serving.py --out $OUT/serving_latency.json"
  "masked_eval_quiet|1800|cp -n $OUT/masked_eval_chip.json $OUT/masked_eval_contended.json 2>/dev/null; python -u scripts/masked_eval_chip.py --out $OUT/masked_eval_chip.json"
  "int8_bs192|1200|python -u scripts/int8_bs192_repro.py --out $OUT/int8_bs192_crash.log"
  "selfcheck|1200|python -u scripts/tpu_selfcheck.py --round 5"
  "bench_query|1200|python -u bench.py --metric query"
  "bench_all|3000|python -u scripts/bench_all.py --round 5"
)

# Attempts only count toward .fail when the task failed while the tunnel was
# still up afterwards (a deterministic failure — OOM, code bug). A task killed
# by a mid-run outage gets its attempt refunded and the loop returns to the
# probe gate, so a multi-hour degradation can never burn every task to .fail.
MAX_ATTEMPTS=3

# run_one NAME TIMEOUT CMD — returns 0 if the outer task loop should continue
# to the next task, 1 if it should fall back to the probe/sleep gate.
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

log "collector started (pid $$)"
while ! all_done; do
  if ! probe; then
    log "tunnel down; sleeping 60s"
    sleep 60
    continue
  fi
  log "TUNNEL UP"
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
