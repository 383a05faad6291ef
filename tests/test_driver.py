"""Experiment-driver tests: full loop, checkpoint/resume, elastic restart.

Covers icem_tpu/main.py against the reference main-loop semantics
(icem/main.py:82-243): iterate {collect -> log -> buffer -> train model ->
eval -> solve metric -> checkpoint}, resume from the _latest symlink,
elastic-restart window.
"""

import json
import os

import numpy as np
import pytest

from icem_tpu.main import run
from icem_tpu.runtime.config import resolve_settings


def _pendulum_params(model_dir, **over):
    base = {
        "env": "ContinuousPendulum",
        "env_params": {},
        "forward_model": "GroundTruthModel",
        "forward_model_params": {},
        "controller": "mpc-icem",
        "controller_params": {
            "horizon": 8,
            "num_simulated_trajectories": 16,
            "action_sampler_params": {"opt_iterations": 2, "noise_beta": 2.0},
        },
        "rollout_params": {"task_horizon": 10, "use_env_states": True,
                           "fuse_on_device": True},
        "number_of_rollouts": 1,
        "training_iterations": 2,
        "evaluation_rollouts": 1,
        "seed": 3,
        "model_dir": model_dir,
        "checkpoints": {"load": False, "save": True, "save_every_n_iter": 1},
    }
    base.update(over)
    return resolve_settings(base)


def test_run_full_loop_and_metrics(tmp_path):
    info = run(_pendulum_params(str(tmp_path / "run1"),
                                avg_return_required_to_solve=-1e9))
    assert info["step"] == [0, 1]
    for key in ("train_mean_return", "train_mean_avg_reward",
                "eval_mean_return", "required_iterations_to_solve"):
        assert key in info, key
    # trivially-solvable threshold -> solved at iteration 0
    assert info["required_iterations_to_solve"][-1] == 0
    # settings snapshot written (helpers.py:206-209 analog)
    assert os.path.exists(tmp_path / "run1" / "settings.json")


def test_checkpoint_resume_continues_iteration(tmp_path):
    md = str(tmp_path / "run2")
    run(_pendulum_params(md, training_iterations=2))
    assert os.path.islink(os.path.join(md, "checkpoints_latest"))

    # resume: auto-load should continue at iteration 2, not restart at 0
    params = _pendulum_params(md, training_iterations=4)
    params = resolve_settings({**params.get_pickleable(),
                               "checkpoints": {"load": "auto", "save": True,
                                               "save_every_n_iter": 1}})
    info = run(params)
    assert info["step"] == [0, 1, 2, 3]  # full history restored + extended


@pytest.mark.slow
def test_elastic_restart_window(tmp_path):
    """restart_every_n_iter caps the iterations per launch
    (main.py:165-170, initialization.py:61-64)."""
    md = str(tmp_path / "run3")
    params = _pendulum_params(md, training_iterations=5)
    params = resolve_settings({**params.get_pickleable(),
                               "checkpoints": {"load": "auto", "save": True,
                                               "save_every_n_iter": 1,
                                               "restart_every_n_iter": 2}})
    info = run(params)
    assert info["step"] == [0, 1]  # stopped at the window
    info = run(params)             # relaunch resumes and runs 2 more
    assert info["step"] == [0, 1, 2, 3]


def test_learned_model_training_loop(tmp_path):
    params = _pendulum_params(
        str(tmp_path / "run4"),
        forward_model="EnsembleModel",
        forward_model_params={"ensemble_size": 2, "hidden": [32],
                              "epochs": 1, "batch_size": 32},
        initial_controller="random",
        initial_number_of_rollouts=2,
        append_data=True,
        training_iterations=2,
        evaluation_rollouts=0,
        rollout_params={"task_horizon": 10, "use_env_states": False,
                        "fuse_on_device": False},
    )
    info = run(params)
    # initial iteration + 2 training iterations
    assert len(info["step"]) == 3
    assert np.isfinite(info["train_mean_return"][-1])


def test_sharded_planner_reachable_from_settings(tmp_path):
    """controller_params.sharded wires multi-chip planning into the product
    surface: the driver-built controller plans over the full 8-device mesh
    and the fused episode path runs through it end-to-end (VERDICT r1 #1)."""
    from icem_tpu.main import get_controllers
    from icem_tpu.envs import env_from_string
    from icem_tpu.models import forward_model_from_string

    params = _pendulum_params(str(tmp_path / "run_sharded"))
    params = resolve_settings({**params.get_pickleable(),
                               "controller_params": {
                                   **params.controller_params.get_pickleable(),
                                   "sharded": True},
                               "forward_model": "ParallelGroundTruthModel",
                               "forward_model_params": {"num_parallel": 8}})
    env = env_from_string(params.env)
    fm = forward_model_from_string(params.forward_model)(
        env=env, **params.forward_model_params)
    _, ctrl = get_controllers(params, env, fm)
    assert ctrl._mesh is not None and ctrl._mesh.devices.size == 8, \
        "settings did not produce a mesh-wide sharded planner"

    info = run(params)
    assert info["step"] == [0, 1]
    assert np.all(np.isfinite(info["train_mean_return"]))


def test_shipped_defaults_resolve_sharded_auto():
    """The shipped controller defaults opt into sharded='auto', so a
    config-driven run on a multi-chip host plans over every chip."""
    import os
    root = os.path.join(os.path.dirname(__file__), "..", "settings")
    for f in ("pendulum/i-cem-blitz.json", "halfcheetah_running/cem-std.json"):
        params = resolve_settings(os.path.join(root, f))
        assert params.controller_params.get("sharded") == "auto", f
