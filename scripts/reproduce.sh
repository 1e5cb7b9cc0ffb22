#!/usr/bin/env bash
# End-to-end reproduction of the reference's published numbers (BASELINE.md)
# on a data-mounted TPU host — zero decisions required.
#
#   scripts/reproduce.sh [triplet|sare|sfrs|all]   (default: all)
#
# Covers BASELINE.json configs #3/#4/#5 with the published recipe
# (reference scripts/train_baseline_dist.sh:27-35, train_sfrs_dist.sh:26-28):
#   #3 triplet   : NetVLAD triplet training, Pitts30k-train
#   #4 sare      : SARE_ind training, Pitts30k-train
#   #5 sfrs      : SFRS self-distillation, Pitts30k-train
# each followed by Pitts250k-test AND Tokyo 24/7 evaluation of model_best —
# the MODEL_ZOO.md rows BASELINE.md pins.
#
# Prerequisites (layout: docs/INSTALL.md, docs/REPRODUCTION.md):
#   data/pitts/raw/   — Pittsburgh images + pitts{30,250}k_*.mat dbStructs
#   data/tokyo/raw/   — Tokyo 24/7 + TM images and .mat dbStructs
# Single-controller JAX uses every local chip automatically; for multi-host
# slices run each stage under Slurm via scripts/*_slurm.sh instead (same
# hyperparameters; tuple_size scales with the global chip count).
set -euo pipefail
cd "$(dirname "$0")/.."

WHAT=${1:-all}

need_data() {
  [ -d "data/$1/raw" ] || {
    echo "missing data/$1/raw — mount the $1 dataset first" >&2
    echo "(directory layout: docs/INSTALL.md)" >&2
    exit 1
  }
}
need_data pitts
need_data tokyo

test_both() { # <checkpoint-dir>
  # Pitts250k-test then Tokyo 24/7, reranking off — the MODEL_ZOO.md setting
  python examples/test_model.py -d pitts --scale 250k \
    --checkpoint "$1/model_best.npz"
  python examples/test_model.py -d tokyo \
    --checkpoint "$1/model_best.npz"
}

# Stage 0: NetVLAD centroid bootstrap (examples/cluster.py writes the
# reference-compatible vgg16_pitts_64_desc_cen.hdf5 cache next to the logs;
# every training run below reuses it).
bash scripts/cluster.sh pitts

if [ "$WHAT" = triplet ] || [ "$WHAT" = all ]; then
  bash scripts/train_baseline.sh pitts 30k triplet
  test_both logs/netvlad-tpu/pitts30k-triplet
fi

if [ "$WHAT" = sare ] || [ "$WHAT" = all ]; then
  bash scripts/train_baseline.sh pitts 30k sare_ind
  test_both logs/netvlad-tpu/pitts30k-sare_ind
fi

if [ "$WHAT" = sfrs ] || [ "$WHAT" = all ]; then
  bash scripts/train_sfrs.sh pitts 30k
  test_both logs/sfrs-tpu/pitts30k
fi

echo "reproduce.sh: done — compare the printed recalls to BASELINE.md"
