#!/bin/bash
# Retry the TPU measurement queue until the tunnel recovers (outages are
# full-day events sometimes; probe every 10 min, give up after ~6 h).
# Usage: scripts/tpu_retry.sh [queue-runner args...]
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 36); do
  echo "[tpu_retry] attempt $i: $(date -u +%H:%M:%S)"
  python scripts/run_tpu_queue.py "$@"
  rc=$?
  if [ "$rc" != "2" ]; then
    echo "[tpu_retry] queue finished rc=$rc"
    exit "$rc"
  fi
  sleep 600
done
echo "[tpu_retry] gave up after 36 attempts"
exit 2
