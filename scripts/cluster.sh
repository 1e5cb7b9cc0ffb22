#!/usr/bin/env bash
# NetVLAD centroid bootstrap (TPU equivalent of the reference's scripts/cluster.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
DATASET=${1:-pitts}
shift $(( $# > 0 ? 1 : 0 ))
python examples/cluster.py -d "$DATASET" "$@"
