#!/usr/bin/env bash
# Download the 7-Scenes dataset (Microsoft Research), unpack seq-01 of each
# scene, and generate the TUM ground-truth trajectories from the per-frame
# pose files (tools/make_7scenes_gt.py) so the eval gate runs end-to-end
# from a bare checkout.
set -euo pipefail
OUT=${1:-data/7scenes}
BASE="https://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
REPO_ROOT=$(dirname "$SCRIPT_DIR")
GT_DIR="$SCRIPT_DIR/groundtruths/7scenes"
mkdir -p "$OUT" "$GT_DIR"
for scene in chess fire heads office pumpkin redkitchen stairs; do
  if [[ ! -d "$OUT/$scene" ]]; then
    echo "downloading $scene..."
    wget -q "$BASE/$scene.zip" -O "$OUT/$scene.zip"
    unzip -q "$OUT/$scene.zip" -d "$OUT"
    (cd "$OUT/$scene" && unzip -q seq-01.zip)
    rm -f "$OUT/$scene.zip"
  fi
  if [[ ! -f "$GT_DIR/$scene.txt" ]]; then
    python "$REPO_ROOT/tools/make_7scenes_gt.py" "$OUT/$scene/seq-01" "$GT_DIR/$scene.txt"
  fi
done
echo "done -> $OUT (ground truths in $GT_DIR)"
