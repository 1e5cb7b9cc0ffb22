#!/usr/bin/env bash
# Multi-host (multi-slice / multi-node) baseline training under Slurm —
# parity with the reference's scripts/train_baseline_slurm.sh:28-38, adapted
# to single-controller JAX: one task per HOST (not per chip; each process
# drives all of its host's TPU chips) and jax.distributed auto-detects the
# Slurm rendezvous (SLURM_PROCID/SLURM_NTASKS/nodelist) — no explicit
# torch.distributed-style port scan needed. maybe_init_distributed() fails
# loudly on a half-configured environment.
#
# Usage: PARTITION=<part> NODES=<n> ./scripts/train_baseline_slurm.sh \
#          [pitts] [30k] [sare_ind]
set -euo pipefail
cd "$(dirname "$0")/.."

PARTITION=${PARTITION:?set PARTITION}
NODES=${NODES:-1}
DATASET=${1:-pitts}
SCALE=${2:-30k}
LOSS=${3:-sare_ind}
# tuple_size is the GLOBAL tuples-per-step (sharded over the full mesh);
# it must be a multiple of the global device count. Default: one tuple per
# chip, matching the reference's per-GPU tuple_size=1 recipe
# (train_baseline_dist.sh:30) at equal total batch.
CHIPS_PER_HOST=${CHIPS_PER_HOST:-4}
TUPLE_SIZE=${TUPLE_SIZE:-$((NODES * CHIPS_PER_HOST))}

srun --partition="$PARTITION" \
  --nodes="$NODES" --ntasks="$NODES" --ntasks-per-node=1 \
  --kill-on-bad-exit=1 \
  python examples/train_baseline.py -d "$DATASET" --scale "$SCALE" \
    --loss-type "$LOSS" \
    --tuple-size "$TUPLE_SIZE" --neg-num 10 --neg-pool 1000 --cache-size 1000 \
    --lr 0.001 --momentum 0.9 --weight-decay 0.001 \
    --epochs 5 --step-size 5 --margin 0.1 \
    --logs-dir "logs/netvlad-tpu/${DATASET}${SCALE}-${LOSS}"
