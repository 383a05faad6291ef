"""Multi-host bootstrap CI dryrun (num_processes=1, subprocess-isolated:
jax.distributed.initialize must precede backend init, which pytest's own
JAX usage has long passed)."""

import os
import subprocess
import sys

import pytest

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


def _run_dryrun(n_processes):
    """Launch __graft_entry__.dryrun_multichip(8, n_processes=...) in a clean
    subprocess (jax.distributed.initialize must precede backend init) and
    return the DRYRUN_ACTION_BITS fingerprint of the two planned actions."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "ICEM_MULTIHOST", "ICEM_COORDINATOR",
                        "ICEM_NUM_PROCESSES", "ICEM_PROCESS_ID",
                        "ICEM_DRYRUN_WORKER", "ICEM_DRYRUN_PROCESSES")}
    env["JAX_PLATFORMS"] = "cpu"
    prog = (f"import __graft_entry__ as g; "
            f"g.dryrun_multichip(8, n_processes={n_processes})")
    out = subprocess.run([sys.executable, "-c", prog], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, \
        f"stdout:\n{out.stdout}\nstderr:\n{out.stderr[-3000:]}"
    bits = [l.split()[1] for l in out.stdout.splitlines()
            if l.startswith("DRYRUN_ACTION_BITS")]
    assert bits, f"no action fingerprint in stdout:\n{out.stdout}"
    return bits[-1]


@pytest.mark.slow
def test_two_process_gloo_plan_matches_single_process():
    """The REAL multi-process path (SURVEY §5.8 DCN analog): two coordinated
    OS processes (4+4 CPU devices, gloo collectives) must plan actions
    bitwise-identical to the 1-process 8-device run. Replaces the reference's
    worker-pool scatter/gather (icem/models/gt_par_model.py:66-94)."""
    single = _run_dryrun(1)
    two = _run_dryrun(2)
    assert two == single, (
        f"2-process gloo plan diverged from single-process plan:\n"
        f"  1proc: {single}\n  2proc: {two}")
