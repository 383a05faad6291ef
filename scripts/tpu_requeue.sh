#!/bin/bash
# TPU-blocked measurement queue for when the axon tunnel returns.
# (It went down ~18:45 UTC Aug 17 mid-round-3; see results/ROUND3_NOTES.md.)
# Run ONE at a time — jobs share the single host core for the host side.
set -e
cd "$(dirname "$0")/.."

echo "== tunnel probe"
timeout 60 python -c "import jax; print(jax.devices())"

echo "== bench (single-chip headline)"
timeout 1800 python bench.py | tee results/BENCH_tunnel_check.json

echo "== bench sharded (1-device tax re-measure, VERDICT r2 item 4)"
BENCH_SHARDED=1 timeout 1800 python bench.py | tee results/BENCH_SHARDED_r03.json

echo "== pallas kernel tests"
ICEM_TESTS_TPU=1 timeout 1800 python -m pytest tests/test_pallas_rollout.py -q

echo "== verify drive on TPU (pendulum swing-up)"
timeout 1800 python - <<'EOF'
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

echo "== queued full-protocol TPU quality reruns (run manually, hours each):"
echo "   ICEM_ROUND=3 CONFIGS=humanoid_standup/i-cem-best python scripts/quality_table.py"
echo "   ICEM_ROUND=3 ICEM_QUALITY_FULL=1 CONFIGS=planet/cheetah_run python scripts/quality_table.py"
echo "   ICEM_ROUND=3 ICEM_QUALITY_FULL=1 CONFIGS=planet/reacher_easy python scripts/quality_table.py"
