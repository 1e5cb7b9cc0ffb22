#!/usr/bin/env bash
# NetVLAD centroid bootstrap (TPU equivalent of the reference's scripts/cluster.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python examples/cluster.py -d "${1:-pitts}" --scale 30k
