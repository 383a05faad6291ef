#!/bin/bash
# Round-4 TPU measurement queue. Run by scripts/tpu_watch.sh when the axon
# tunnel is reachable; safe to run manually. ONE job at a time (single host
# core). Each job is individually timeout-bounded and failures don't abort
# the rest — the watcher marks the queue done only if every REQUIRED job
# (bench, sharded bench) succeeded.
cd "$(dirname "$0")/.."
mkdir -p results
fail=0

echo "== [1/5] bench (single-chip headline -> results/BENCH_watch_r04.json)"
if timeout 2400 python bench.py | tee results/BENCH_watch_r04.json; then :; else
  echo "!! bench failed"; fail=1
fi

echo "== [2/5] sharded bench (P1 path -> results/BENCH_SHARDED_r04.json)"
if BENCH_SHARDED=1 timeout 2400 python bench.py | tee results/BENCH_SHARDED_r04.json; then :; else
  echo "!! sharded bench failed"; fail=1
fi

echo "== [3/5] pallas kernel tests on device"
ICEM_TESTS_TPU=1 timeout 2400 python -m pytest tests/test_pallas_rollout.py -q \
  2>&1 | tee results/PALLAS_TESTS_r04.log || echo "!! pallas tests failed (non-required)"

echo "== [4/5] verify drive on TPU (pendulum swing-up)"
timeout 2400 python - <<'EOF' 2>&1 | tee results/TPU_VERIFY_r04.log || echo "!! verify drive failed (non-required)"
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
print("TPU verify drive OK")
EOF

echo "== [5/5] spatial 3D bench (if built this round)"
if [ -e scripts/bench_spatial.py ]; then
  timeout 2400 python scripts/bench_spatial.py | tee results/BENCH_SPATIAL_r04.json \
    || echo "!! spatial bench failed (non-required)"
else
  echo "   scripts/bench_spatial.py not present yet; skipping"
fi

exit $fail
