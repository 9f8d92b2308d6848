#!/usr/bin/env bash
# Download EuRoC MAV sequences (ASL ETH Zurich) and generate index-aligned
# TUM ground truth from each sequence's state_groundtruth_estimate0 CSV
# (tools/make_euroc_gt.py). Counterpart of scripts/download_7scenes.sh.
#
# Usage: scripts/download_euroc.sh [out_dir] [seq...]
set -euo pipefail
OUT=${1:-data/euroc}
shift || true
SEQS=${*:-"MH_01_easy MH_02_easy MH_03_medium V1_01_easy V1_02_medium V2_01_easy"}
BASE="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
REPO_ROOT=$(dirname "$SCRIPT_DIR")

room_for() {
  case "$1" in
    MH_*) echo "machine_hall/$1";;
    V1_*) echo "vicon_room1/$1";;
    V2_*) echo "vicon_room2/$1";;
    *) echo "$1";;
  esac
}

mkdir -p "$OUT"
for seq in $SEQS; do
  short=${seq%_easy}; short=${short%_medium}; short=${short%_difficult}
  if [[ ! -d "$OUT/$short/mav0" ]]; then
    echo "downloading $seq..."
    wget -q "$BASE/$(room_for "$seq")/$seq.zip" -O "$OUT/$seq.zip"
    mkdir -p "$OUT/$short"
    unzip -q "$OUT/$seq.zip" -d "$OUT/$short"
    rm -f "$OUT/$seq.zip"
  fi
  gt="$OUT/groundtruths/$short.txt"
  if [[ ! -f "$gt" ]]; then
    mkdir -p "$OUT/groundtruths"
    python "$REPO_ROOT/tools/make_euroc_gt.py" "$OUT/$short/mav0" "$gt"
  fi
done
echo "done -> $OUT (ground truths in $OUT/groundtruths)"
