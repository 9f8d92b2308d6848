#!/usr/bin/env bash
# Retry wrapper for long pipeline runs on flaky TPU runtimes.
#
# The remote TPU worker can crash mid-session under sustained load; chunk
# creation is resumable (chunk files are the checkpoints), so the robust way
# to run long sequences is to retry the process with --resume until it
# completes:
#
#   scripts/run_with_retries.sh 5 python create_offline_chunks.py \
#       --images ... --output out --resume ...
#
# Works for any idempotent/resumable command.
set -uo pipefail
RETRIES=${1:?max retries}
shift
for attempt in $(seq 1 "$RETRIES"); do
  echo "=== attempt $attempt/$RETRIES: $*"
  if "$@"; then
    echo "=== succeeded on attempt $attempt"
    exit 0
  fi
  echo "=== attempt $attempt failed (exit $?); retrying"
  sleep 10
done
echo "=== all $RETRIES attempts failed"
exit 1
