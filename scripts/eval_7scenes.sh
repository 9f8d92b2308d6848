#!/usr/bin/env bash
# 7-Scenes evaluation: offline pipeline per scene + Sim3-aligned APE.
# Equivalent of the reference scripts/eval_7scenes.sh (same protocol: grid
# keypoints, max-kp 400, max-observations-per-track 10, metric depth on,
# integer-timestamp TUM output scored against the seq-01 ground truth).
#
# Usage: scripts/eval_7scenes.sh <data_root> <pi3_weights.npz> [moge.npz] [out_dir]
#   data_root/<scene>/seq-01/*.color.png  and  groundtruths/7scenes/<scene>.txt
# MODE=online evaluates the streaming pipeline instead of offline
# (the reference script's --online branch, eval_7scenes.sh:130-170).
set -euo pipefail

DATA_ROOT=${1:?data root}
PI3_NPZ=${2:?pi3 weights npz}
MOGE_NPZ=${3:-}
OUT=${4:-eval_7scenes_out}
CHUNK_LENGTH=${CHUNK_LENGTH:-100}
OVERLAP=${OVERLAP:-20}
MAX_KP=${MAX_KP:-400}
MAX_OBS=${MAX_OBS:-10}
MODE=${MODE:-offline}
# DEVICE=cpu forces the CPU backend (synthetic smoke runs; tools/smoke_eval_scripts.py)
DEVICE=${DEVICE:-tpu}
# optional accuracy features (off = reference-equivalent protocol):
# KEYPOINTS=aliked ALIKED_NPZ=... enables learned keypoints; LOOP=1 enables
# loop closure (needs aliked); REFINE=1 enables ZNCC observation refinement
KEYPOINTS=${KEYPOINTS:-grid}
ALIKED_NPZ=${ALIKED_NPZ:-}
LOOP=${LOOP:-0}
REFINE=${REFINE:-0}
SCENES=${SCENES:-"chess fire heads office pumpkin redkitchen stairs"}
SCRIPT_DIR=$(cd "$(dirname "$0")" && pwd)
REPO_ROOT=$(dirname "$SCRIPT_DIR")

MOGE_ARGS=""
if [[ -n "$MOGE_NPZ" ]]; then MOGE_ARGS="--moge-path $MOGE_NPZ"; else MOGE_ARGS="--no-metric-depth"; fi
KP_ARGS="--keypoints $KEYPOINTS"
if [[ -n "$ALIKED_NPZ" ]]; then KP_ARGS="$KP_ARGS --aliked-path $ALIKED_NPZ"; fi
CREATE_EXTRA=""
if [[ "$REFINE" == "1" ]]; then CREATE_EXTRA="--refine-observations"; fi
RECON_EXTRA=""
if [[ "$LOOP" == "1" ]]; then RECON_EXTRA="--loop-closure"; fi

declare -A APE
for scene in $SCENES; do
  echo "=== $scene ==="
  seq_dir="$DATA_ROOT/$scene/seq-01"
  out_dir="$OUT/$scene"
  mkdir -p "$out_dir"
  if [[ "$MODE" == "online" ]]; then
    "$SCRIPT_DIR/run_with_retries.sh" 5 python "$REPO_ROOT/pi3_slam_online.py" \
      --images "$seq_dir/*.color.png" \
      --model-path "$PI3_NPZ" $MOGE_ARGS \
      --output "$out_dir" \
      --chunk-length "$CHUNK_LENGTH" --overlap "$OVERLAP" \
      $KP_ARGS --max-kp "$MAX_KP" $CREATE_EXTRA $RECON_EXTRA \
      --max-observations-per-track "$MAX_OBS" \
      --device "$DEVICE" \
      --tum-integer-timestamps
  else
    "$SCRIPT_DIR/run_with_retries.sh" 5 python "$REPO_ROOT/create_offline_chunks.py" \
      --images "$seq_dir/*.color.png" \
      --model-path "$PI3_NPZ" $MOGE_ARGS \
      --output "$out_dir" --resume \
      --chunk-length "$CHUNK_LENGTH" --overlap "$OVERLAP" \
      --device "$DEVICE" \
      $KP_ARGS --max-kp "$MAX_KP" $CREATE_EXTRA
    python "$REPO_ROOT/reconstruct_offline.py" \
      --chunks "$out_dir" $RECON_EXTRA \
      --device "$DEVICE" \
      --max-observations-per-track "$MAX_OBS"
  fi
  gt="$SCRIPT_DIR/groundtruths/7scenes/$scene.txt"
  if [[ ! -f "$gt" ]]; then
    # generate GT from the dataset's per-frame pose files
    gt="$out_dir/groundtruth_tum.txt"
    python "$REPO_ROOT/tools/make_7scenes_gt.py" "$seq_dir" "$gt"
  fi
  APE[$scene]=$(python -c "
from pi3_slam_tpu.utils.evaluation import evaluate_tum_files
r = evaluate_tum_files('$gt', '$out_dir/trajectory_tum.txt', align_sim3=True, max_diff=0.5, plot_path='$out_dir/evo_ape.png')
print(f'{r.rmse:.4f}')
")
  echo "$scene APE RMSE: ${APE[$scene]} m"
done

echo "=== summary ==="
python - <<EOF
vals = dict($(for s in $SCENES; do echo -n "$s=${APE[$s]},"; done))
mean = sum(map(float, vals.values())) / len(vals)
for k, v in vals.items():
    print(f"{k:12s} {float(v):.4f} m")
print(f"{'mean':12s} {mean:.4f} m  (reference: 0.069 m)")
EOF
