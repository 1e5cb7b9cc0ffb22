#!/usr/bin/env bash
# Checkpoint evaluation (TPU equivalent of the reference's scripts/test_dist.sh).
#   scripts/test.sh <checkpoint> [dataset] [scale]
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${1:?usage: test.sh <checkpoint> [dataset] [scale]}
DATASET=${2:-pitts}
SCALE=${3:-250k}

python examples/test_model.py -d "$DATASET" --scale "$SCALE" \
  --checkpoint "$CKPT"
