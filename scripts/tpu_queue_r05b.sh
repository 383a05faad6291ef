#!/bin/bash
# Round-5 (second half) TPU measurement queue — run by
# scripts/tpu_watch_r05b.sh (or by hand) when the axon tunnel is reachable.
# ONE job at a time: the host side shares a single CPU core.
#
# Ordering: kernel-test gate first (it decides whether the spatial bench
# measures the Pallas kernel or the XLA row path), then the quality rows
# this round still owes (VERDICT r4 #1-#3). The verify drive already
# passed this round (results/TPU_VERIFY_r05.log, tail cost 0.0012) and the
# driver runs bench.py itself at round end.
set -u
cd "$(dirname "$0")/.."
export ICEM_ROUND=5

echo "== tunnel probe"
timeout 60 python -c "import jax; print(jax.devices())" || exit 1

echo "== spatial + planar Pallas kernel tests on device"
if ICEM_TESTS_TPU=1 timeout 3600 python -m pytest tests/test_pallas_rollout.py -q \
    2>&1 | tee results/PALLAS_TESTS_r05b.log; then
  echo "kernel tests green"
else
  # the spatial quality/bench runs below must not die on a kernel-lowering
  # failure: fall back to the XLA row path and record that provenance
  export ICEM_TPU_NO_PALLAS=1
  echo "!! spatial kernel tests failed; continuing with ICEM_TPU_NO_PALLAS=1"
fi

echo "== humanoid_standup blitz, full horizon, chunked fused path (r4 crash row)"
CONFIGS=humanoid_standup/i-cem-blitz timeout 10800 python scripts/quality_table.py \
  2>>results/quality_r05b.err || echo "!! standup blitz failed"

echo "== spatial bench refresh: pop 504 + 4096 through the Pallas kernel"
timeout 7200 python scripts/bench_spatial.py --round 5 \
  2>>results/quality_r05b.err || echo "!! bench_spatial failed"

echo "== halfcheetah ensemble: the FULL 30-iteration protocol (VERDICT r4 #2)"
ICEM_QUALITY_FULL=1 CONFIGS=halfcheetah_running/ensemble-icem \
  timeout 14400 python scripts/quality_table.py \
  2>>results/quality_r05b.err || echo "!! ensemble full protocol failed"

echo "== planet/cheetah_run (the missing PlaNet row)"
CONFIGS=planet/cheetah_run timeout 10800 python scripts/quality_table.py \
  2>>results/quality_r05b.err || echo "!! cheetah_run failed"

echo "== planet/cartpole_swingup (RSSM, 20-iteration protocol)"
CONFIGS=planet/cartpole_swingup timeout 10800 python scripts/quality_table.py \
  2>>results/quality_r05b.err || echo "!! cartpole_swingup failed"

echo "== queue complete ($(date -u))"
