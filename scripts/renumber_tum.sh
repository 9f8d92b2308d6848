#!/usr/bin/env bash
# Re-index a TUM trajectory's timestamps to consecutive integers (the
# reference scripts/renumber_tum.sh equivalent). Usage: renumber_tum.sh in out
set -euo pipefail
IN=${1:?input tum file}
OUT=${2:?output tum file}
awk 'BEGIN{i=0} /^#/{print; next} NF>=8{$1=i++; print}' "$IN" > "$OUT"
