"""Every shipped settings file must construct end-to-end: resolve the
inheritance DAG, build env + forward model + controllers through the
factories, and evaluate the env's cost function on the env's own
observation/action shapes.

Regression for the round-2 find that settings/hopper shipped with an env
default (excluded root position) incompatible with its own cost_fn — a
config that crashed on first use. Construction is cheap (jit is lazy), so
this covers all configs in seconds.
"""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.envs import env_from_string
from icem_tpu.main import get_controllers
from icem_tpu.models import forward_model_from_string
from icem_tpu.runtime.config import resolve_settings
from icem_tpu.runtime.seeding import Seeding

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    c for c in glob.glob(os.path.join(REPO, "settings", "*", "*.json"))
    if "/defaults/" not in c and not c.endswith("/defaults.json"))
IDS = [os.path.relpath(c, os.path.join(REPO, "settings"))[:-5] for c in CONFIGS]


@pytest.mark.parametrize("path", CONFIGS, ids=IDS)
def test_shipped_config_constructs_and_cost_evaluates(path):
    Seeding.set_seed(0)
    params = resolve_settings(path)
    env = env_from_string(params.env, **params.get("env_params", {}))
    fm = None
    if params.get("forward_model", "none") != "none":
        fm = forward_model_from_string(params.forward_model)(
            env=env, **params.get("forward_model_params", {}))
    initial, main = get_controllers(params, env, fm)
    assert main is not None

    obs = jnp.zeros((4, env.obs_dim))
    act = jnp.zeros((4, env.action_dim))
    costs = env.cost_fn(obs, act, obs)
    assert costs.shape == (4,)
    assert np.all(np.isfinite(np.asarray(costs)))

    # controller horizon/action dims must be consistent with the env
    cfg = getattr(main, "cfg", None)
    if cfg is not None:
        assert cfg.action_dim == env.action_dim
