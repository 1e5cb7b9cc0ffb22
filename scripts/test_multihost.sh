#!/usr/bin/env bash
# Multi-host distributed evaluation — parity with the reference's 8-process
# scripts/test_dist.sh / test_slurm.sh. Two launch modes:
#
#   Slurm:   PARTITION=<part> NODES=<n> ./scripts/test_multihost.sh pitts 250k <ckpt>
#   Manual:  on every host, with the same COORDINATOR (host 0's address):
#            JAX_COORDINATOR_ADDRESS=$COORDINATOR:8476 \
#            JAX_NUM_PROCESSES=<n> JAX_PROCESS_ID=<i> \
#            ./scripts/test_multihost.sh pitts 250k <ckpt>
#
# Each process extracts its contiguous slice of the gallery
# (parallel/extract.py extract_features_sharded) and descriptors are
# all-gathered over DCN; the kNN runs sharded over each host's local mesh.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET=${1:-pitts}
SCALE=${2:-250k}
CHECKPOINT=${3:?usage: test_multihost.sh <dataset> <scale> <checkpoint>}
shift 3 || true

CMD=(python examples/test_model.py -d "$DATASET" --scale "$SCALE" \
     --checkpoint "$CHECKPOINT" --reduction "$@")

if [[ -n "${PARTITION:-}" ]]; then
  srun --partition="$PARTITION" \
    --nodes="${NODES:-1}" --ntasks="${NODES:-1}" --ntasks-per-node=1 \
    --kill-on-bad-exit=1 "${CMD[@]}"
else
  exec "${CMD[@]}"
fi
