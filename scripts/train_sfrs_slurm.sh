#!/usr/bin/env bash
# Multi-host SFRS training under Slurm — parity with the reference's
# scripts/train_sfrs_slurm.sh:29-40, adapted to single-controller JAX:
# one task per HOST (each process drives all its host's TPU chips),
# jax.distributed auto-detects the Slurm rendezvous, and
# maybe_init_distributed() fails loudly on a half-configured environment.
#
# Usage: PARTITION=<part> NODES=<n> ./scripts/train_sfrs_slurm.sh [pitts] [30k]
set -euo pipefail
cd "$(dirname "$0")/.."

PARTITION=${PARTITION:?set PARTITION}
NODES=${NODES:-1}
DATASET=${1:-pitts}
SCALE=${2:-30k}
# global tuples-per-step; must be a multiple of the global device count
# (see train_baseline_slurm.sh)
CHIPS_PER_HOST=${CHIPS_PER_HOST:-4}
TUPLE_SIZE=${TUPLE_SIZE:-$((NODES * CHIPS_PER_HOST))}

srun --partition="$PARTITION" \
  --nodes="$NODES" --ntasks="$NODES" --ntasks-per-node=1 \
  --kill-on-bad-exit=1 \
  python examples/train_sfrs.py -d "$DATASET" --scale "$SCALE" \
    --loss-type sare_ind \
    --tuple-size "$TUPLE_SIZE" --neg-num 10 --neg-pool 1000 --cache-size 1000 \
    --pos-num 10 --pos-pool 20 \
    --lr 0.001 --momentum 0.9 --weight-decay 0.001 \
    --epochs 5 --step-size 5 --margin 0.1 \
    --generations 4 --temperature 0.07 0.07 0.06 0.05 --soft-weight 0.5 \
    --logs-dir "logs/sfrs-tpu/${DATASET}${SCALE}"
