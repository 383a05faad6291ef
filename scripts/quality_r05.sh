#!/bin/bash
# Round-5 quality-table campaign (VERDICT r4 items 1-3, 7).
# Priorities: (1) re-land the 3D humanoid rows through the fixed fused path
# (NaN containment + fuse auto-degrade + scan CEM loop), (2) the two rows
# r4 never produced (planet/reacher_easy, halfcheetah ensemble), (3) refresh
# everything else at >=3 GT iterations. Incremental merge into
# results/QUALITY_r05.json means a partial run still leaves evidence.
cd "$(dirname "$0")/.."
export ICEM_ROUND=5
export ICEM_QUALITY_SEEDS=${ICEM_QUALITY_SEEDS:-0,1,2}

run() {
  echo "=== quality: $1 ($(date -u +%H:%M:%S))"
  CONFIGS="$1" timeout "${2:-3600}" python scripts/quality_table.py \
    2>>results/quality_r05.err || echo "!! $1 failed"
}

# Phase 1 — the rows round 4 got wrong: NaN (humanoid), TPU crash (standup
# blitz), 2-iteration spread (standup best)
run humanoid/i-cem-blitz 5400
run humanoid_standup/i-cem-blitz 9000
run humanoid_standup/i-cem-best 9000

# Phase 2 — the rows round 4 never produced
run planet/reacher_easy 7200
run halfcheetah_running/ensemble-icem 7200

# Phase 3 — refresh the GT table at >=3 iterations
run ant/i-cem-blitz 3600
run hopper/i-cem-blitz 3600
run halfcheetah_running/i-cem-blitz 3600
run halfcheetah_running/cem-std 3600
run pendulum/i-cem-blitz 1800
run mountain_car/i-cem-best 1800
run door/i-cem-blitz 3600
run relocate/i-cem-blitz 3600
run fetch_reach/i-cem-blitz 1800
run fpp/i-cem-blitz 3600
run planet/cartpole_swingup_gt 3600

# Phase 4 — learned-model refresh
run pendulum/ensemble-icem 3600
run planet/cartpole_swingup 7200
run planet/cheetah_run 7200

# Phase 5 — the full 30-iteration halfcheetah ensemble protocol
ICEM_QUALITY_FULL=1 run halfcheetah_running/ensemble-icem 14400

echo "=== quality campaign complete ($(date -u +%H:%M:%S))"
