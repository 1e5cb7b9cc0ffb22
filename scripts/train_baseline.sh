#!/usr/bin/env bash
# Published baseline recipe (TPU equivalent of the reference's
# scripts/train_baseline_dist.sh): SARE/triplet on Pitts30k.
# Single-controller JAX uses every local TPU chip automatically; multi-host
# slices export JAX_COORDINATOR_ADDRESS (or run under Slurm) before launching.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET=${1:-pitts}
SCALE=${2:-30k}
LOSS=${3:-sare_ind}   # triplet | sare_ind | sare_joint
shift $(( $# > 3 ? 3 : $# ))

python examples/train_baseline.py -d "$DATASET" --scale "$SCALE" \
  --loss-type "$LOSS" \
  --tuple-size 1 --neg-num 10 --neg-pool 1000 --cache-size 1000 \
  --lr 0.001 --momentum 0.9 --weight-decay 0.001 \
  --epochs 5 --step-size 5 --margin 0.1 \
  --logs-dir "logs/netvlad-tpu/${DATASET}${SCALE}-${LOSS}" "$@"
