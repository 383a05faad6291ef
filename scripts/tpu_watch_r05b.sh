#!/bin/bash
# Poll the axon TPU tunnel until it is reachable, then run the round-5b
# measurement queue (scripts/tpu_queue_r05b.sh) exactly once. See
# scripts/tpu_watch.sh (r4) for the rationale: a tunnel outage must not be
# able to silently eat the round's measurements.
#
# Usage: nohup bash scripts/tpu_watch_r05b.sh >> results/tpu_watch_r05b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
POLL_S="${POLL_S:-180}"
MAX_HOURS="${MAX_HOURS:-8}"
DONE_FLAG="results/TPU_QUEUE_DONE_r05b"
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

if [ -e "$DONE_FLAG" ]; then
  echo "[tpu_watch] $DONE_FLAG already present; nothing to do"
  exit 0
fi

while [ "$(date +%s)" -lt "$deadline" ]; do
  echo "[tpu_watch] $(date -u +%H:%M:%S) probing tunnel..."
  if timeout 60 python -c "import jax; print(jax.devices())" > /tmp/tpu_watch_probe.txt 2>&1; then
    echo "[tpu_watch] tunnel UP: $(tail -1 /tmp/tpu_watch_probe.txt)"
    echo "[tpu_watch] running queue"
    if bash scripts/tpu_queue_r05b.sh; then
      date -u > "$DONE_FLAG"
      echo "[tpu_watch] queue complete"
      exit 0
    else
      echo "[tpu_watch] queue FAILED (rc=$?); will retry next poll"
    fi
  else
    echo "[tpu_watch] still down"
  fi
  sleep "$POLL_S"
done
echo "[tpu_watch] deadline reached without a successful queue run"
exit 1
