#!/usr/bin/env bash
# Download the 7-Scenes dataset (Microsoft Research) and unpack seq-01 of
# each scene. Ground-truth TUM trajectories must be generated from the
# per-frame pose files (see tools/make_7scenes_gt.py).
set -euo pipefail
OUT=${1:-data/7scenes}
BASE="https://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"
mkdir -p "$OUT"
for scene in chess fire heads office pumpkin redkitchen stairs; do
  if [[ ! -d "$OUT/$scene" ]]; then
    echo "downloading $scene..."
    wget -q "$BASE/$scene.zip" -O "$OUT/$scene.zip"
    unzip -q "$OUT/$scene.zip" -d "$OUT"
    (cd "$OUT/$scene" && unzip -q seq-01.zip)
    rm -f "$OUT/$scene.zip"
  fi
done
echo "done -> $OUT"
