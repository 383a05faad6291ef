#!/bin/bash
# Round-4 quality-table campaign (VERDICT r3 items 3, 5, 6).
# Phased, cheapest-risk-first within each phase; incremental merge into
# results/QUALITY_r04.json means a partial run still leaves evidence.
cd "$(dirname "$0")/.."
export ICEM_ROUND=4
export ICEM_QUALITY_SEEDS=${ICEM_QUALITY_SEEDS:-0,1,2}

run() {
  echo "=== quality: $1 ($(date -u +%H:%M:%S))"
  CONFIGS="$1" timeout "${2:-3600}" python scripts/quality_table.py \
    2>>results/quality_r04.err || echo "!! $1 failed"
}

# Phase 1 — the flagship 3D biped rows (VERDICT Missing #2 / item 3)
run humanoid_standup/i-cem-blitz 5400
run humanoid_standup/i-cem-best 7200
run humanoid/i-cem-blitz 5400

# Phase 2 — refresh every folded r2 GT row (item 6) + 3D ant on the fast path
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

# Phase 3 — learned models (items 5 + 6): RSSM cartpole at 3 seeds,
# planet cheetah/reacher past the 3-iteration stub, pendulum ensemble
run pendulum/ensemble-icem 3600
run planet/cartpole_swingup 7200
run planet/cheetah_run 7200
run planet/reacher_easy 7200

# Phase 4 — the full 30-iteration halfcheetah ensemble protocol (item 5),
# single config, full budget; 3 seeds if the wall allows (driver-bounded)
ICEM_QUALITY_FULL=1 run halfcheetah_running/ensemble-icem 14400

echo "=== quality campaign complete ($(date -u +%H:%M:%S))"
