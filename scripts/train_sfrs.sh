#!/usr/bin/env bash
# Published SFRS recipe (TPU equivalent of the reference's
# scripts/train_sfrs_dist.sh): 4 generations, temps 0.07/0.07/0.06/0.05.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET=${1:-pitts}
SCALE=${2:-30k}
shift $(( $# > 2 ? 2 : $# ))

python examples/train_sfrs.py -d "$DATASET" --scale "$SCALE" \
  --loss-type sare_ind \
  --tuple-size 1 --neg-num 10 --neg-pool 1000 --cache-size 1000 \
  --pos-num 10 --pos-pool 20 \
  --lr 0.001 --momentum 0.9 --weight-decay 0.001 \
  --epochs 5 --step-size 5 --margin 0.1 \
  --generations 4 --temperature 0.07 0.07 0.06 0.05 --soft-weight 0.5 \
  --logs-dir "logs/sfrs-tpu/${DATASET}${SCALE}" "$@"
