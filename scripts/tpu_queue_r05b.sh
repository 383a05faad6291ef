#!/bin/bash
# Round-5 (second half) TPU measurement queue — run by scripts/tpu_watch.sh
# (or by hand) when the axon tunnel is reachable. ONE job at a time: the
# host side shares a single CPU core.
#
# Ordering: cheap gates first (verify drive, kernel tests), then the
# quality rows this round still owes (VERDICT r4 #1-#3), then benches.
set -u
cd "$(dirname "$0")/.."
export ICEM_ROUND=5

echo "== tunnel probe"
timeout 60 python -c "import jax; print(jax.devices())" || exit 1

echo "== verify drive on TPU (pendulum swing-up through the public API)"
timeout 1800 python - <<'EOF' 2>&1 | tee results/TPU_VERIFY_r05.log
import numpy as np, jax, jax.numpy as jnp
from icem_tpu.envs.classic import ContinuousPendulum
from icem_tpu.models.ground_truth import GroundTruthModel
from icem_tpu.controllers.icem import MpcICem
from icem_tpu.runtime.seeding import Seeding
Seeding.set_seed(42)
env = ContinuousPendulum()
ctrl = MpcICem(env=env, forward_model=GroundTruthModel(env=env), horizon=20,
               action_sampler_params=dict(noise_beta=2.0), seed=1)
state = jnp.array([np.pi, 0.0]); obs = env.observation(state)
ctrl.beginning_of_rollout(observation=obs, state=state)
step = jax.jit(env.step)
rew = []
for _ in range(120):
    a = ctrl.get_action(obs, state)
    state, obs, r, _ = step(state, jnp.asarray(a))
    rew.append(float(r))
tail = -np.mean(rew[-20:])
print("tail cost:", tail)
assert tail < 0.1
EOF

echo "== spatial + planar Pallas kernel tests on device"
if ICEM_TESTS_TPU=1 timeout 3600 python -m pytest tests/test_pallas_rollout.py -q \
    2>&1 | tee results/PALLAS_TESTS_r05b.log; then
  SPATIAL_KERNEL_OK=1
else
  # the spatial quality/bench runs below must not die on a kernel-lowering
  # failure: fall back to the XLA row path and record that provenance
  SPATIAL_KERNEL_OK=0
  export ICEM_TPU_NO_PALLAS=1
  echo "!! spatial kernel tests failed; continuing with ICEM_TPU_NO_PALLAS=1"
fi

echo "== humanoid_standup blitz, full horizon, chunked fused path (r4 crash row)"
CONFIGS=humanoid_standup/i-cem-blitz timeout 10800 python scripts/quality_table.py \
  2>>results/quality_r05b.err || echo "!! standup blitz failed"

echo "== spatial bench refresh: pop 504 + 4096, now through the Pallas kernel"
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

echo "== bench.py headline + sharded refresh"
timeout 1800 python bench.py | tee results/BENCH_r05_tpu.json
BENCH_SHARDED=1 timeout 1800 python bench.py | tee results/BENCH_SHARDED_r05b.json

echo "== queue complete ($(date -u))"
