"""Controller-family tests: MpcCemStd, MpcRandom, RndController, factory.

Covers the reference behaviors beyond MpcICem (mpc.py:86-327,
controllers/random.py:4-23).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.controllers import controller_from_string
from icem_tpu.controllers.cem_std import (
    CemStdConfig, MpcCemStd, truncated_normal, _bounds, init_state, plan_step,
)
from icem_tpu.controllers.random import (
    MpcRandom, RndController, sample_held_action_sequences,
)
from icem_tpu.envs.classic import ContinuousPendulum, PointMass
from icem_tpu.models.ground_truth import GroundTruthModel
from icem_tpu.runtime.seeding import Seeding


def test_factory_resolves_all_controllers():
    for name in ("mpc-icem", "mpc-cem-std", "mpc-random", "random", "open-loop"):
        assert controller_from_string(name) is not None
    with pytest.raises(ImportError):
        controller_from_string("nope")


def test_truncated_normal_respects_bounds():
    """cem-std samples must stay inside the truncation interval
    (reference: truncnorm.rvs, mpc.py:188-198)."""
    mean = jnp.zeros((5, 2)) + 0.3
    std = jnp.ones((5, 2)) * 2.0
    lower = (jnp.full((5, 2), -1.0) - mean) / std
    upper = (jnp.full((5, 2), 1.0) - mean) / std
    s = truncated_normal(jax.random.key(0), lower, upper, mean, std, (512, 5, 2))
    assert float(jnp.min(s)) >= -1.0 - 1e-5
    assert float(jnp.max(s)) <= 1.0 + 1e-5
    # distribution actually spreads (not degenerate)
    assert float(jnp.std(s)) > 0.3


def test_cem_std_levine_bounds_clamp_std():
    """bounds_like_levine: std clamped to half distance-to-bounds
    (mpc.py:290-296)."""
    cfg = CemStdConfig(horizon=4, num_simulated_trajectories=16,
                       action_dim=1, action_low=(-1.0,), action_high=(1.0,),
                       bounds_like_levine=True, init_std=5.0)
    mean = jnp.full((4, 1), 0.8)
    std = jnp.full((4, 1), 5.0)
    lower, upper, std2 = _bounds(cfg, mean, std)
    # distance to the nearer bound from 0.8 is 0.2 -> std <= 0.1... (min of
    # (m-lo)/2=0.9, (hi-m)/2=0.1)
    assert float(jnp.max(std2)) <= 0.1 + 1e-6


@pytest.mark.parametrize("levine", [False, True])
def test_cem_std_controls_point_mass(levine):
    Seeding.set_seed(0)
    env = PointMass(goal=(0.2, -0.1))
    ctrl = MpcCemStd(env=env, forward_model=GroundTruthModel(env=env),
                     horizon=12, num_simulated_trajectories=64, seed=4,
                     action_sampler_params=dict(opt_iterations=3,
                                                bounds_like_levine=levine))
    state = jnp.array([-0.3, 0.3, 0.0, 0.0], jnp.float32)
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    step = jax.jit(env.step)
    for _ in range(50):
        a = ctrl.get_action(obs, state)
        state, obs, _, _ = step(state, jnp.asarray(a))
    dist = float(np.linalg.norm(np.asarray(obs[:2]) - np.array([0.2, -0.1])))
    assert dist < 0.08, f"cem-std (levine={levine}) ended {dist} from goal"


def test_cem_std_mean_reset_vs_shift():
    """shift_means=False zeroes the mean at step end (mpc.py:239-245)."""
    cfg = CemStdConfig(horizon=4, num_simulated_trajectories=8,
                       action_dim=1, action_low=(-1.0,), action_high=(1.0,),
                       shift_means=False)

    def predict(ms, obs, act):
        ns = ms + act[0]
        return ns, ns[None], -(ns ** 2)

    cost = lambda o, a, n: n[..., 0] ** 2
    ps = init_state(cfg, jax.random.key(0))
    res = plan_step(cfg, predict, cost, ps, jnp.array([3.0]), jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(res.state.mean), 0.0)


def test_held_action_sequences_blocks():
    """MpcRandom: actions held constant for action_change_frequency steps
    (mpc.py:95-108)."""
    low = jnp.array([-1.0, -1.0])
    high = jnp.array([1.0, 1.0])
    s = sample_held_action_sequences(jax.random.key(1), low, high,
                                     num_traj=6, horizon=10, change_every=3)
    assert s.shape == (6, 10, 2)
    sa = np.asarray(s)
    for t0 in (0, 3, 6):
        block = sa[:, t0: t0 + 3]
        assert np.all(block == block[:, :1])  # constant within a block
    assert not np.all(sa[:, 0] == sa[:, 3])   # changes across blocks


def test_mpc_random_picks_argmin_rollout():
    Seeding.set_seed(1)
    env = PointMass(goal=(0.0, 0.0))
    ctrl = MpcRandom(env=env, forward_model=GroundTruthModel(env=env),
                     horizon=10, num_simulated_trajectories=256, seed=7)
    state = jnp.array([0.5, 0.0, 0.0, 0.0], jnp.float32)
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    a = ctrl.get_action(obs, state)
    # with 256 random sequences, the best should push left toward the goal
    assert a[0] < 0.0


def test_rnd_controller_action_change_frequency():
    env = ContinuousPendulum()
    ctrl = RndController(env=env, action_change_frequency=4, seed=2)
    ctrl.beginning_of_rollout(observation=jnp.zeros(3))
    acts = [ctrl.get_action(np.zeros(3)) for _ in range(8)]
    first = np.array(acts[:4])
    second = np.array(acts[4:])
    assert np.all(first == first[0])
    assert np.all(second == second[0])
    assert not np.allclose(first[0], second[0])


def test_controller_save_load_resume_fidelity(tmp_path):
    """Mid-episode checkpoint restores the planner exactly: the restored
    controller's next action equals the original's (reference mpc.py:75-83 /
    initialization.py:142-162 resume guarantee), covering distribution state,
    elite memory, and the PRNG key."""
    import os
    import jax.numpy as jnp
    from icem_tpu.controllers.cem_std import MpcCemStd
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.envs.classic import ContinuousPendulum
    from icem_tpu.models.ground_truth import GroundTruthModel

    env = ContinuousPendulum()
    state = jnp.array([np.pi * 0.8, 0.0])
    obs = env.observation(state)

    for cls, extra in ((MpcICem, {}),
                       (MpcCemStd, {"action_sampler_params": {"shift_means": True}})):
        def build():
            return cls(env=env, forward_model=GroundTruthModel(env=env),
                       horizon=6, num_simulated_trajectories=8, seed=21, **extra)

        ctrl = build()
        ctrl.beginning_of_rollout(observation=obs, state=state)
        for _ in range(3):  # advance mid-episode: elite memory + shifted mean live
            ctrl.get_action(np.asarray(obs), state)

        path = os.path.join(tmp_path, f"ctrl_{cls.__name__}")
        ctrl.save(path)
        a_orig = ctrl.get_action(np.asarray(obs), state)

        restored = build()
        restored.load(path)
        a_restored = restored.get_action(np.asarray(obs), state)
        np.testing.assert_array_equal(a_orig, a_restored,
                                      err_msg=f"{cls.__name__} resume drifted")


def test_driver_checkpoint_round_trips_controller_state(tmp_path):
    """CheckpointManager.store_controller now writes real payloads and
    load_controller restores them (was a stub in round 1)."""
    import os
    import jax.numpy as jnp
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.envs.classic import ContinuousPendulum
    from icem_tpu.models.ground_truth import GroundTruthModel
    from icem_tpu.runtime.checkpoint import CheckpointManager

    env = ContinuousPendulum()
    ctrl = MpcICem(env=env, forward_model=GroundTruthModel(env=env),
                   horizon=6, num_simulated_trajectories=8, seed=5)
    state = jnp.array([np.pi, 0.0])
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    ctrl.get_action(np.asarray(obs), state)

    cpm = CheckpointManager(model_dir=str(tmp_path), save=True)
    cpm.update_checkpoint_dir(0)
    cpm.store_controller(ctrl)
    cpm.finalized_checkpoint()
    assert os.path.getsize(os.path.join(tmp_path, "checkpoints_000",
                                        "controller")) > 0

    ctrl2 = MpcICem(env=env, forward_model=GroundTruthModel(env=env),
                    horizon=6, num_simulated_trajectories=8, seed=5)
    cpm2 = CheckpointManager(model_dir=str(tmp_path), load=True)
    cpm2.load_controller(ctrl2)
    assert ctrl2.was_reset
    np.testing.assert_array_equal(np.asarray(ctrl2._pstate.mean),
                                  np.asarray(ctrl._pstate.mean))


def test_consistency_check_on_all_mpc_controllers(capsys):
    """check_model_consistency lives on the shared MPC base in the reference
    (mpc.py:39-47) — cem-std and mpc-random must flag a drifted GT model
    exactly like mpc-icem does."""
    env = ContinuousPendulum()
    state = jnp.array([np.pi, 0.0])
    obs = env.observation(state)

    for cls, kwargs in ((MpcCemStd, {}), (MpcRandom, {})):
        ctrl = cls(env=env, forward_model=GroundTruthModel(env=env),
                   horizon=5, num_simulated_trajectories=8, seed=2,
                   verbose=True, **kwargs)
        ctrl.beginning_of_rollout(observation=obs, state=state)
        ctrl.get_action(np.asarray(obs), state)
        # zero drift on the honest state
        assert ctrl.check_model_consistency(ctrl._model_state) == 0.0
        capsys.readouterr()
        # drifted env state must warn
        diff = ctrl.check_model_consistency(ctrl._model_state + 1.0)
        assert diff is not None and diff > 1e-5
        assert "differs from env" in capsys.readouterr().out, cls.__name__


def test_cem_std_rejects_population_decay():
    """factor_decrease_num is an iCEM knob; vanilla CEM has no decay and a
    typo'd config must fail loudly rather than degrade silently."""
    env = ContinuousPendulum()
    with pytest.raises(ValueError, match="factor_decrease_num"):
        MpcCemStd(env=env, forward_model=GroundTruthModel(env=env),
                  horizon=5, num_simulated_trajectories=8,
                  factor_decrease_num=1.25)
