#!/usr/bin/env bash
# End-to-end reproduction of the reference's published numbers (BASELINE.md)
# on a data-mounted TPU host — zero decisions required.
#
#   scripts/reproduce.sh [--dry-run] [triplet|sare|sfrs|all]   (default: all)
#
# Covers BASELINE.json configs #3/#4/#5 with the published recipe
# (reference scripts/train_baseline_dist.sh:27-35, train_sfrs_dist.sh:26-28):
#   #3 triplet   : NetVLAD triplet training, Pitts30k-train
#   #4 sare      : SARE_ind training, Pitts30k-train
#   #5 sfrs      : SFRS self-distillation, Pitts30k-train
# each followed by Pitts250k-test AND Tokyo 24/7 evaluation of model_best —
# the MODEL_ZOO.md rows BASELINE.md pins.
#
# --dry-run exercises the SAME stage chain and argument plumbing against the
# hermetic synthetic dataset with a tiny config (no real data needed, CPU or
# TPU, minutes not days) — run it once on a freshly data-mounted host before
# committing to the multi-day real run, so the first real attempt cannot die
# on a flag typo or a missing directory.
#
# Prerequisites for the real run (layout: docs/INSTALL.md, docs/REPRODUCTION.md):
#   data/pitts/raw/   — Pittsburgh images + pitts{30,250}k_*.mat dbStructs
#   data/tokyo/raw/   — Tokyo 24/7 + TM images and .mat dbStructs
# Single-controller JAX uses every local chip automatically; for multi-host
# slices run each stage under Slurm via scripts/*_slurm.sh instead (same
# hyperparameters; tuple_size scales with the global chip count).
set -euo pipefail
cd "$(dirname "$0")/.."

DRY=0
if [ "${1:-}" = "--dry-run" ]; then
  DRY=1
  shift
fi
WHAT=${1:-all}

need_data() {
  [ -d "data/$1/raw" ] || {
    echo "missing data/$1/raw — mount the $1 dataset first" >&2
    echo "(directory layout: docs/INSTALL.md)" >&2
    exit 1
  }
}

if [ "$DRY" = 1 ]; then
  DS=synthetic
  ROOTD=${DRYRUN_DIR:-/tmp/openibl_dryrun}
  rm -rf "$ROOTD"
  mkdir -p "$ROOTD/logs"
  # tiny hermetic config appended AFTER the published recipe: argparse takes
  # the last occurrence, so the dry run overrides sizes but walks the exact
  # same scripts/flags the real run does
  COMMON=(--data-dir "$ROOTD/data" --num-clusters 8)
  TRAIN=("${COMMON[@]}" --init-dir "$ROOTD/logs" --test-batch-size 8
         --height 32 --width 48
         --neg-num 2 --neg-pool 8 --cache-size 4 --epochs 1 --iters 2)
  # 64x64 -> 4x4 conv5 map: exact quartering for the SFRS region model
  SFRS=("${COMMON[@]}" --init-dir "$ROOTD/logs" --test-batch-size 8
        --height 64 --width 64
        --neg-num 2 --neg-pool 8 --cache-size 4 --epochs 1 --iters 2
        --generations 2 --temperature 0.07 0.07 --pos-num 2 --pos-pool 3)
  TESTARGS=("${COMMON[@]}" --test-batch-size 8 --height 32 --width 48)
  CLUSTERARGS=("${COMMON[@]}" --logs-dir "$ROOTD/logs" -b 8
               --height 32 --width 48)
  SCALE=30k   # ignored by the synthetic dataset; exercises the flag path
else
  DS=pitts
  SCALE=30k
  TRAIN=(); SFRS=(); TESTARGS=(); CLUSTERARGS=()
  need_data pitts
  need_data tokyo
fi

test_both() { # <checkpoint-dir> — Pitts250k-test then Tokyo 24/7 (real run);
  # two synthetic evals with the same flag shapes (dry run)
  if [ "$DRY" = 1 ]; then
    python examples/test_model.py -d "$DS" \
      --checkpoint "$1/model_best.npz" "${TESTARGS[@]}"
    python examples/test_model.py -d "$DS" \
      --checkpoint "$1/model_best.npz" "${TESTARGS[@]}" --no-reduction
  else
    python examples/test_model.py -d pitts --scale 250k \
      --checkpoint "$1/model_best.npz"
    python examples/test_model.py -d tokyo \
      --checkpoint "$1/model_best.npz"
  fi
}

# Stage 0: NetVLAD centroid bootstrap (examples/cluster.py writes the
# reference-compatible {arch}_{dataset}_{k}_desc_cen.hdf5 cache next to the
# logs; every training run below reuses it).
bash scripts/cluster.sh "$DS" ${CLUSTERARGS[@]+"${CLUSTERARGS[@]}"}

# canonical checkpoint dirs (the real-run values match what the launch
# scripts compute themselves; passing --logs-dir explicitly is a no-op
# there and redirects into the scratch root for --dry-run)
if [ "$DRY" = 1 ]; then
  DIR_TRIPLET=$ROOTD/logs/triplet
  DIR_SARE=$ROOTD/logs/sare
  DIR_SFRS=$ROOTD/logs/sfrs
else
  DIR_TRIPLET=logs/netvlad-tpu/pitts30k-triplet
  DIR_SARE=logs/netvlad-tpu/pitts30k-sare_ind
  DIR_SFRS=logs/sfrs-tpu/pitts30k
fi

if [ "$WHAT" = triplet ] || [ "$WHAT" = all ]; then
  bash scripts/train_baseline.sh "$DS" "$SCALE" triplet \
    ${TRAIN[@]+"${TRAIN[@]}"} --logs-dir "$DIR_TRIPLET"
  test_both "$DIR_TRIPLET"
fi

if [ "$WHAT" = sare ] || [ "$WHAT" = all ]; then
  bash scripts/train_baseline.sh "$DS" "$SCALE" sare_ind \
    ${TRAIN[@]+"${TRAIN[@]}"} --logs-dir "$DIR_SARE"
  test_both "$DIR_SARE"
fi

if [ "$WHAT" = sfrs ] || [ "$WHAT" = all ]; then
  bash scripts/train_sfrs.sh "$DS" "$SCALE" \
    ${SFRS[@]+"${SFRS[@]}"} --logs-dir "$DIR_SFRS"
  test_both "$DIR_SFRS"
fi

echo "reproduce.sh: done — compare the printed recalls to BASELINE.md"
