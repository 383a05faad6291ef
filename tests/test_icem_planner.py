"""iCEM planner tests: mechanism unit tests + end-to-end control quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.controllers.icem import (
    ICemConfig, MpcICem, init_state, plan_step, sample_action_sequences,
)
from icem_tpu.envs.classic import ContinuousPendulum, PointMass
from icem_tpu.models.ground_truth import GroundTruthModel
from icem_tpu.runtime.seeding import Seeding


def make_cfg(**kw):
    defaults = dict(horizon=10, num_simulated_trajectories=40,
                    factor_decrease_num=1.25, opt_iterations=3,
                    action_dim=2, action_low=(-1.0, -1.0), action_high=(1.0, 1.0))
    defaults.update(kw)
    return ICemConfig(**defaults)


def test_population_decay_schedule():
    # reference formula icem.py:126-127 with N=40, gamma=1.25, K=10:
    # 40 -> max(20, 32) -> max(20, 25); total evals 97*h (icem.py:38-43)
    cfg = make_cfg(horizon=30)
    assert cfg.population_schedule == (40, 32, 25)
    assert cfg.model_evals_per_timestep == 97 * 30
    assert cfg.num_elites == 10
    assert cfg.elites_kept == 3


def test_num_elites_floor_and_cap():
    cfg = make_cfg(num_simulated_trajectories=6, elites_size=10)
    assert cfg.num_elites == 3  # min(10, 6//2)
    cfg = make_cfg(num_simulated_trajectories=2, elites_size=10)
    assert cfg.num_elites == 2  # floor of 2 (icem.py:237-240)


def test_samples_respect_bounds():
    cfg = make_cfg(noise_beta=2.5, init_std=3.0)  # huge std forces clipping
    mean = jnp.zeros((cfg.horizon, cfg.action_dim))
    std = 3.0 * jnp.ones((cfg.horizon, cfg.action_dim))
    s = sample_action_sequences(cfg, jax.random.key(0), mean, std, 256)
    assert s.shape == (256, cfg.horizon, cfg.action_dim)
    assert float(jnp.max(s)) <= 1.0 and float(jnp.min(s)) >= -1.0
    # clipping must actually bind with std=3
    assert float(jnp.mean((jnp.abs(s) > 0.999))) > 0.1


def test_white_noise_branch():
    cfg = make_cfg(noise_beta=0.0)
    mean = jnp.zeros((cfg.horizon, cfg.action_dim))
    std = 0.3 * jnp.ones_like(mean)
    s = sample_action_sequences(cfg, jax.random.key(1), mean, std, 4096)
    assert abs(float(jnp.std(s)) - 0.3) < 0.02


class _LinearEnv:
    """1-d analytic dynamics x' = x + a with quadratic cost: the optimum of a
    single CEM iteration is computable, used to check refit mechanics."""

    def step(self, state, action):
        ns = state + action[0]
        return ns, ns[None], -(ns**2), jnp.float32(0.0)


def test_plan_step_mechanics_and_elite_memory():
    cfg = make_cfg(horizon=5, action_dim=1, action_low=(-1.0,), action_high=(1.0,),
                   num_simulated_trajectories=30, elites_size=6, opt_iterations=2)
    env = _LinearEnv()

    def predict_fn(ms, obs, act):
        ns, no, rew, _ = env.step(ms, act)
        return ns, no, rew

    def cost_fn(obs, act, next_obs):
        return next_obs[..., 0] ** 2  # drive x to 0

    ps = init_state(cfg, obs_dim=1, key=jax.random.key(0))
    assert not bool(ps.have_elites)
    x0 = jnp.asarray(3.0)

    res = plan_step(cfg, predict_fn, cost_fn, ps, jnp.array([3.0]), x0)
    assert bool(res.state.have_elites)
    # elites sorted ascending by cost
    ec = np.asarray(res.state.elite_costs)
    assert np.all(np.diff(ec) >= 0)
    assert np.all(np.isfinite(ec))
    # from x0=3 with actions in [-1,1] the planner should push hard negative
    assert float(res.action[0]) < -0.5
    # std is reset to init after the step (icem.py:175)
    np.testing.assert_allclose(np.asarray(res.state.std), 0.5, rtol=1e-6)

    # second step should reuse elites without error and stay finite
    res2 = plan_step(cfg, predict_fn, cost_fn, res.state, jnp.array([2.0]), jnp.asarray(2.0))
    assert np.isfinite(float(res2.expected_cost))


def test_jit_plan_step_compiles_once_and_runs():
    cfg = make_cfg(horizon=8, action_dim=1, action_low=(-2.0,), action_high=(2.0,))
    env = ContinuousPendulum()

    def predict_fn(ms, obs, act):
        ns, no, rew, _ = env.step(ms, act)
        return ns, no, rew

    planner = jax.jit(lambda ps, obs, ms: plan_step(cfg, predict_fn, env.cost_fn, ps, obs, ms))
    ps = init_state(cfg, obs_dim=3, key=jax.random.key(0))
    state = env.init_state(jax.random.key(1))
    obs = env.observation(state)
    res = planner(ps, obs, state)
    assert res.action.shape == (1,)
    assert np.isfinite(float(res.expected_cost))


@pytest.mark.slow
def test_icem_solves_pendulum_swingup():
    Seeding.set_seed(7)
    env = ContinuousPendulum()
    model = GroundTruthModel(env=env)
    ctrl = MpcICem(
        env=env, forward_model=model, horizon=20, num_simulated_trajectories=40,
        factor_decrease_num=1.25,
        cost_along_trajectory="sum",
        action_sampler_params=dict(alpha=0.1, elites_size=10, opt_iterations=3,
                                   init_std=0.5, noise_beta=2.0,
                                   use_mean_actions=True, keep_previous_elites=True,
                                   shift_elites_over_time=True,
                                   fraction_elites_reused=0.3),
        seed=3,
    )
    key = jax.random.key(0)
    # start hanging down for a real swing-up
    state = jnp.array([np.pi, 0.0], jnp.float32)
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state, mode="train")
    step = jax.jit(env.step)
    costs = []
    for t in range(120):
        a = ctrl.get_action(obs, state)
        state, obs, reward, _ = step(state, jnp.asarray(a))
        costs.append(-float(reward))
    # must be upright and stabilized at the end
    final_costs = np.mean(costs[-20:])
    assert final_costs < 0.1, f"pendulum not stabilized, tail cost {final_costs}"


@pytest.mark.slow
def test_icem_point_mass_reaches_goal():
    Seeding.set_seed(11)
    env = PointMass(goal=(0.1, -0.2))
    model = GroundTruthModel(env=env)
    ctrl = MpcICem(env=env, forward_model=model, horizon=15,
                   num_simulated_trajectories=32,
                   action_sampler_params=dict(noise_beta=1.0), seed=5)
    state = jnp.array([-0.3, 0.3, 0.0, 0.0], jnp.float32)
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    step = jax.jit(env.step)
    for t in range(60):
        a = ctrl.get_action(obs, state)
        state, obs, _, _ = step(state, jnp.asarray(a))
    dist = float(np.linalg.norm(np.asarray(obs[:2]) - np.array([0.1, -0.2])))
    assert dist < 0.05, f"point mass ended {dist} from goal"


def test_consistency_and_plan_divergence_diagnostics(capsys):
    """check_model_consistency (mpc.py:39-47) + plan-replay divergence
    (abstract_controller.py:93-128) equivalents."""
    from icem_tpu.controllers.icem import MpcICem

    env = ContinuousPendulum()
    ctrl = MpcICem(env=env, forward_model=GroundTruthModel(env=env),
                      horizon=8, num_simulated_trajectories=16, seed=3,
                      verbose=True, do_visualize_plan=True,
                      action_sampler_params=dict(opt_iterations=2))
    state = jnp.array([jnp.pi, 0.0])
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    ctrl.get_action(obs, state)
    a = ctrl.get_action(obs, state)

    # GT model on a pure env: zero drift, zero plan divergence
    assert ctrl.check_model_consistency(ctrl._model_state) == 0.0
    ms = ctrl.forward_model.got_actual_observation_and_env_state(
        observation=obs, env_state=state, model_state=None)
    res = ctrl._plan(ctrl._pstate, obs, ms)
    div = ctrl.visualize_plan(obs, state, res)
    assert div is not None and div < 1e-4

    # a corrupted model state must be flagged
    bad = ctrl._model_state + 1.0
    diff = ctrl.check_model_consistency(bad)
    assert diff is not None and diff > 1e-5
    assert "differs from env" in capsys.readouterr().out


def test_open_loop_policy_replay():
    """OpenLoopPolicy replay semantics (abstract_controller.py:153-184)."""
    from icem_tpu.controllers.open_loop import OpenLoopPolicy
    seq = np.arange(24, dtype=np.float32).reshape(4, 3, 2)  # [p=4, h=3, d=2]
    pol = OpenLoopPolicy(seq)
    pol.beginning_of_rollout(observation=None)
    np.testing.assert_array_equal(pol.get_action(), seq[:, 0, :])
    np.testing.assert_array_equal(pol.get_action(), seq[:, 1, :])
    sub = pol.get_parallel_policy_copy([1, 3])
    assert sub.population == 2
    np.testing.assert_array_equal(sub.action_sequences, seq[[1, 3]])
    # single-plan replay saturates at the last action
    single = OpenLoopPolicy(seq[0])
    single.beginning_of_rollout(observation=None)
    for _ in range(3):
        a = single.get_action()
    assert a.shape == (2,)
    np.testing.assert_array_equal(single.get_action(), seq[0, -1, :])


def test_top_k_ascending_stable_ties_and_nan_last():
    """Elite selection contract: (a) exactly-tied costs (sparse-cost envs)
    select in stable argsort order — lax.top_k's documented lower-index-first
    tie rule; (b) non-finite costs rank last instead of poisoning the refit."""
    import jax
    import numpy as np
    from icem_tpu.controllers.icem import top_k_ascending

    rng = np.random.default_rng(0)
    # dense integer ties, the Fetch sparse-cost regime
    costs = rng.integers(0, 4, 500).astype(np.float32)
    idx = np.asarray(top_k_ascending(jax.numpy.asarray(costs), 12))
    ref = np.argsort(costs, kind="stable")[:12]
    np.testing.assert_array_equal(idx, ref)

    # NaN / inf / -inf must all be deselected while finite rows remain
    costs = np.array([np.nan, 2.0, -np.inf, 1.0, np.inf, 0.5], np.float32)
    idx = np.asarray(top_k_ascending(jax.numpy.asarray(costs), 3))
    np.testing.assert_array_equal(idx, [5, 3, 1])


def test_visualize_plan_all_mode_reports_first_divergence(capsys):
    """mode 'all' replays the plan through env AND model and prints the
    first step where they diverge > 0.01 with both observation vectors
    (reference abstract_controller.py:118-124)."""
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.envs.classic import ContinuousPendulum
    from icem_tpu.models.ground_truth import GroundTruthModel
    import jax.numpy as jnp
    import numpy as np

    env = ContinuousPendulum()
    ctrl = MpcICem(env=env, forward_model=GroundTruthModel(env=env),
                   horizon=8, num_simulated_trajectories=16, seed=3,
                   do_visualize_plan="all",
                   action_sampler_params=dict(opt_iterations=2))
    state = jnp.array([jnp.pi, 0.0])
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    ctrl.get_action(np.asarray(obs), state)

    # consistent env/model: no report, ~zero max divergence
    ms = ctrl.forward_model.got_actual_observation_and_env_state(
        observation=obs, env_state=state, model_state=None)
    res = ctrl._plan(ctrl._pstate, obs, ms)
    ctrl._model_state = ms
    div = ctrl.visualize_plan(obs, state, res)
    assert div is not None and div < 1e-4
    assert "does not match" not in capsys.readouterr().out

    # env started from a perturbed state: diverges immediately, report shows
    # the first offending index and both vectors
    div = ctrl.visualize_plan(obs, state + 0.2, res)
    out = capsys.readouterr().out
    assert div > 0.01
    assert "does not match mental model at 0" in out
    assert "orig: " in out and "simu: " in out


@pytest.mark.slow
def test_visualize_plan_record_mode_writes_gif(tmp_path):
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.envs import env_from_string
    from icem_tpu.models.ground_truth import GroundTruthModel
    import jax
    import numpy as np
    import os

    # a planar-engine env: render_frame draws the kinematic skeleton
    env = env_from_string("Hopper", exclude_current_positions_from_observation=False)
    ctrl = MpcICem(env=env, forward_model=GroundTruthModel(env=env),
                   horizon=4, num_simulated_trajectories=8, seed=4,
                   do_visualize_plan="record",
                   action_sampler_params=dict(opt_iterations=2))
    ctrl.plan_video_dir = str(tmp_path)
    state = env.init_state(jax.random.key(0))
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    ctrl.get_action(np.asarray(obs), state)
    gifs = [f for f in os.listdir(tmp_path) if f.endswith(".gif")]
    assert gifs, "record mode wrote no plan-replay GIF"


def test_cem_loop_scan_matches_unrolled_without_decay():
    """cem_loop='scan' pads decayed iterations with masked rows; with
    factor_decrease_num=1 there IS no decay, every shape matches the
    unrolled loop's and the PRNG streams align -> the two compilation
    strategies must produce bit-identical plans on a deterministic model."""
    env = ContinuousPendulum()
    model = GroundTruthModel(env=env)
    results = {}
    for mode in ("unrolled", "scan"):
        cfg = ICemConfig(horizon=8, num_simulated_trajectories=16,
                         factor_decrease_num=1.0, elites_size=4,
                         opt_iterations=3, noise_beta=1.0, cem_loop=mode,
                         action_dim=1,
                         action_low=tuple(np.asarray(env.action_space.low)),
                         action_high=tuple(np.asarray(env.action_space.high)))
        pstate = init_state(cfg, env.obs_dim, jax.random.key(7))
        state = jnp.array([np.pi, 0.0])
        obs = env.observation(state)
        ms = model.got_actual_observation_and_env_state(
            observation=obs, env_state=state, model_state=None)
        step = jax.jit(partial_plan(cfg, model, env))
        acts, costs = [], []
        for _ in range(4):
            res = step(pstate, obs, ms)
            pstate = res.state
            acts.append(np.asarray(res.action))
            costs.append(float(res.expected_cost))
        results[mode] = (np.array(acts), np.array(costs))
    np.testing.assert_array_equal(results["unrolled"][0], results["scan"][0])
    np.testing.assert_array_equal(results["unrolled"][1], results["scan"][1])


def partial_plan(cfg, model, env):
    import functools
    return functools.partial(plan_step, cfg, model.predict_fn, env.cost_fn)


@pytest.mark.slow
def test_cem_loop_scan_controls_point_mass_with_decay():
    """Control quality of the masked single-shape loop under real population
    decay: the point mass must still reach its goal."""
    Seeding.set_seed(21)
    env = PointMass(goal=(0.1, -0.2))
    model = GroundTruthModel(env=env)
    ctrl = MpcICem(env=env, forward_model=model, horizon=15,
                   num_simulated_trajectories=32, factor_decrease_num=1.3,
                   cem_loop="scan",
                   action_sampler_params=dict(noise_beta=1.0), seed=5)
    state = jnp.array([-0.3, 0.3, 0.0, 0.0], jnp.float32)
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    step = jax.jit(env.step)
    for t in range(60):
        a = ctrl.get_action(obs, state)
        state, obs, _, _ = step(state, jnp.asarray(a))
    dist = float(np.linalg.norm(np.asarray(obs[:2]) - np.array([0.1, -0.2])))
    assert dist < 0.05, f"point mass ended {dist} from goal"
