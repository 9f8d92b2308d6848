#!/usr/bin/env bash
# EuRoC MAV cam0 evaluation: fisheye/radial-tangential undistortion from the
# calib JSON, inverse-depth-friendly BA, timestamped TUM trajectories scored
# with Sim3 APE. Equivalent of the reference scripts/eval_euroc.sh including
# its per-sequence start-frame skip table (:50-59).
#
# Usage: scripts/eval_euroc.sh <euroc_root> <pi3.npz> <calib.json> [moge.npz] [out]
set -euo pipefail

DATA_ROOT=${1:?euroc root}
PI3_NPZ=${2:?pi3 weights}
CALIB=${3:?cam0 calibration json}
MOGE_NPZ=${4:-}
OUT=${5:-eval_euroc_out}
CHUNK_LENGTH=${CHUNK_LENGTH:-100}
OVERLAP=${OVERLAP:-20}
SEQS=${SEQS:-"MH_01 MH_02 MH_03 V1_01 V1_02 V2_01"}
# DEVICE=cpu forces the CPU backend (synthetic smoke runs; tools/smoke_eval_scripts.py)
DEVICE=${DEVICE:-tpu}
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
REPO_ROOT=$(dirname "$SCRIPT_DIR")
GT_DIR=${GT_DIR:-$SCRIPT_DIR/groundtruths/euroc}

# per-sequence start-frame skips (stationary initialization segments)
skip_for() {
  case "$1" in
    MH_01) echo 700;;
    MH_02) echo 600;;
    MH_03) echo 400;;
    V1_*|V2_*) echo 0;;
    *) echo 0;;
  esac
}

MOGE_ARGS=""
if [[ -n "$MOGE_NPZ" ]]; then MOGE_ARGS="--moge-path $MOGE_NPZ"; else MOGE_ARGS="--no-metric-depth"; fi

for seq in $SEQS; do
  echo "=== $seq ==="
  img_dir="$DATA_ROOT/$seq/mav0/cam0/data"
  out_dir="$OUT/$seq"
  mkdir -p "$out_dir"
  skip=$(skip_for "$seq")
  "$SCRIPT_DIR/run_with_retries.sh" 5 python "$REPO_ROOT/create_offline_chunks.py" \
    --images "$img_dir" --resume \
    --model-path "$PI3_NPZ" $MOGE_ARGS \
    --cam-dist-path "$CALIB" \
    --skip-start "$skip" \
    --output "$out_dir" \
    --chunk-length "$CHUNK_LENGTH" --overlap "$OVERLAP" \
    --device "$DEVICE" \
    --keypoints grid --max-kp "${MAX_KP:-400}"
  python "$REPO_ROOT/reconstruct_offline.py" \
    --chunks "$out_dir" --max-observations-per-track 10 --use-inverse-depth \
    --device "$DEVICE"
  gt="$GT_DIR/$seq.txt"
  if [[ ! -f "$gt" ]]; then
    # generate index-aligned GT from the dataset itself (accounts for the
    # start-frame skip so integer-index timestamps line up exactly)
    gt="$out_dir/groundtruth_tum.txt"
    python "$REPO_ROOT/tools/make_euroc_gt.py" "$DATA_ROOT/$seq/mav0" "$gt" \
      --skip-start "$skip" || true
  fi
  if [[ -f "$gt" ]]; then
    python -c "
from pi3_slam_tpu.utils.evaluation import evaluate_tum_files
r = evaluate_tum_files('$gt', '$out_dir/trajectory_tum.txt', align_sim3=True, max_diff=0.5, plot_path='$out_dir/evo_ape.png')
print(f'$seq APE RMSE: {r.rmse:.4f} m (pairs {r.num_pairs})')
"
  else
    echo "no ground truth at $gt - skipping APE"
  fi
done
