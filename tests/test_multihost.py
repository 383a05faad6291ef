"""Multi-host bootstrap CI dryrun (num_processes=1, subprocess-isolated:
jax.distributed.initialize must precede backend init, which pytest's own
JAX usage has long passed)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROG = r"""
import os, sys
sys.path.insert(0, os.environ["ICEM_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from icem_tpu.parallel.multihost import maybe_initialize_distributed, process_zero
assert maybe_initialize_distributed(), "bootstrap declined to initialize"
assert jax.process_count() == 1 and jax.process_index() == 0
assert process_zero()
assert len(jax.devices()) == 4, jax.devices()

# a sharded plan over the post-initialize global mesh must still execute
import numpy as np, jax.numpy as jnp
from icem_tpu.controllers import icem as ic
from icem_tpu.envs.classic import PointMass
from icem_tpu.parallel.plan import make_pop_mesh, plan_step_sharded

env = PointMass(goal=(0.0, 0.0))
def predict_fn(ms, obs, act):
    ns, no, rew, _ = env.step(ms, act)
    return ns, no, rew
cfg = ic.ICemConfig(horizon=4, num_simulated_trajectories=8, opt_iterations=2,
                    elites_size=2, action_dim=2,
                    action_low=(-1.0, -1.0), action_high=(1.0, 1.0))
state = jnp.array([0.3, -0.3, 0.0, 0.0])
ps = ic.init_state(cfg, env.obs_dim, jax.random.key(0))
res = jax.jit(lambda p, o, m: plan_step_sharded(
    cfg, predict_fn, env.cost_fn, make_pop_mesh(), p, o, m))(
        ps, env.observation(state), state)
assert np.isfinite(float(res.expected_cost))
print("MULTIHOST_DRYRUN_OK")
"""


def test_multihost_bootstrap_single_process_dryrun():
    env = dict(os.environ)
    env.update({
        "ICEM_REPO": REPO,
        "ICEM_MULTIHOST": "1",
        "ICEM_COORDINATOR": f"localhost:{9400 + os.getpid() % 500}",
        "ICEM_NUM_PROCESSES": "1",
        "ICEM_PROCESS_ID": "0",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    out = subprocess.run([sys.executable, "-c", _PROG], env=env,
                         capture_output=True, text=True, timeout=420)
    assert "MULTIHOST_DRYRUN_OK" in out.stdout, \
        f"stdout:\n{out.stdout}\nstderr:\n{out.stderr[-2000:]}"
