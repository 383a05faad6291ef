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


@pytest.mark.parametrize("path", CONFIGS, ids=IDS)
def test_learned_model_configs_get_training_data(path):
    """Regression for the round-2 pendulum-ensemble collapse: the inheritance
    quirk (deeper ancestor wins) let i-cem-blitz's append_data=false /
    initial_number_of_rollouts=0 silently clobber learned_default_env's
    values, so the model trained on ONLY the newest 2 episodes and drifted.
    Every config with a trainable forward model must (a) accumulate data and
    (b) schedule initial exploration episodes with a real initial controller."""
    params = resolve_settings(path)
    name = params.get("forward_model", "none")
    if name == "none":
        return
    from icem_tpu.models import forward_model_from_string
    cls = forward_model_from_string(name)
    if not getattr(cls, "needs_training", False):
        return
    assert params.get("append_data", False), \
        f"{path}: trainable model but append_data is falsy (buffer replaced)"
    assert params.get("initial_controller") not in (None, "none", "null"), \
        f"{path}: trainable model but no initial exploration controller"
    assert params.get("initial_number_of_rollouts", 0) > 0, \
        f"{path}: trainable model but zero initial exploration rollouts"
