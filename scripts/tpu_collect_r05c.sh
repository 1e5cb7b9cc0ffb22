#!/bin/bash
# Third-wave round-5 collector: the Pallas-ADC-kernel artifacts + the
# device-time serving retry that waves 1/2 lost to degraded-tunnel compiles.
# Task order is deliberate:
#   1. mosaic_probe — quick; records whether p6 (VMEM LUT gather) and p7
#      (in-VMEM one-hot -> dot) lower on this toolchain
#   2. pq_kernel_chip — validates ops/pq_kernel.py on the real chip and
#      microbenches kernel vs XLA ADC vs exact (search-only in-jit scan)
#   3. serving_devtime2 — per-variant device-time rows; OPENIBL_PQ_KERNEL=0
#      pins the pq row to the XLA formulation so it stays comparable with
#      the synchronous rows already in serving_latency.json (the kernel's
#      own number lives in pq_kernel_chip.json)
#
# Launch detached:  setsid nohup bash scripts/tpu_collect_r05c.sh > /dev/null 2>&1 &
set -u
OUT=${TPU_COLLECT_OUT:-/root/repo/logs/tpu_collect_r05}
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date +%F' '%T)] $*" >> "$OUT/log_c.txt"; }

probe() { timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

# serialize behind any prior devtime run still holding the chip
PREV_PID=${PREV_PID:-}
if [ -n "$PREV_PID" ]; then
  log "waiting for previous chip job (pid $PREV_PID)"
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
  log "previous chip job exited"
fi

TASKS=(
  "mosaic_probe|1200|python -u scripts/mosaic_probe.py"
  "pq_kernel_chip|3000|python -u scripts/pq_kernel_bench.py --out $OUT/pq_kernel_chip.json"
  "serving_devtime2|3400|OPENIBL_PQ_KERNEL=0 python -u scripts/bench_serving.py --device-time --out $OUT/serving_latency.json"
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

log "third-wave collector started (pid $$)"
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
