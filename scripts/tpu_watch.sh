#!/bin/bash
# Poll the axon TPU tunnel until it is reachable, then run the round's
# TPU measurement queue (scripts/tpu_queue_r04.sh) exactly once.
#
# Motivation (VERDICT r3 item 1): the round-3 tunnel outage silently ate
# every TPU measurement of the round. This watcher makes an outage unable
# to do that again — start it in the background at round start; it probes
# every POLL_S seconds (default 300) and fires the queue on first success.
#
# Usage: nohup bash scripts/tpu_watch.sh >> results/tpu_watch_r04.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
POLL_S="${POLL_S:-300}"
MAX_HOURS="${MAX_HOURS:-11}"
DONE_FLAG="results/TPU_QUEUE_DONE_r04"
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

if [ -e "$DONE_FLAG" ]; then
  echo "[tpu_watch] $DONE_FLAG already present; nothing to do"
  exit 0
fi

while [ "$(date +%s)" -lt "$deadline" ]; do
  echo "[tpu_watch] $(date -u +%H:%M:%S) probing tunnel..."
  if timeout 60 python -c "import jax; print(jax.devices())" > /tmp/tpu_watch_probe.txt 2>&1; then
    echo "[tpu_watch] tunnel UP: $(cat /tmp/tpu_watch_probe.txt | tail -1)"
    echo "[tpu_watch] running queue"
    if bash scripts/tpu_queue_r04.sh; then
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
