"""Multi-device sharding tests on the CPU-simulated 8-device mesh.

The centerpiece is the EXACT equivalence test: plan_step_sharded is compared
against a single-device emulation that reproduces its spec (fold_in key
streams, candidate union, mean-row-on-device-0, have_elites masking) but
performs a direct GLOBAL top-k over all candidates with no shard_map and no
local pre-selection. Exact agreement proves simultaneously that
- the per-device PRNG streams reproduce deterministically under shard_map,
- local top-k + all_gather + replicated top-k selects the same elites as a
  global top-k (the k_local >= K argument in parallel/plan.py:13-17),
- the add-mean candidate lands on device 0 only,
- elite-memory masking before the first refit matches.
This is the guard that check_vma=False (parallel/plan.py) would otherwise
leave open.
"""

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.controllers import icem as ic
from icem_tpu.envs.classic import ContinuousPendulum, PointMass
from icem_tpu.models.base import rollout_open_loop, trajectory_cost
from icem_tpu.parallel.plan import (cem_plan_step_sharded, make_pop_mesh,
                                    plan_step_sharded, resolve_mesh)


def _setup(env, horizon=10, N=32):
    def predict_fn(ms, obs, act):
        ns, no, rew, _ = env.step(ms, act)
        return ns, no, rew

    cfg = ic.ICemConfig(
        horizon=horizon, num_simulated_trajectories=N,
        action_dim=env.action_dim,
        action_low=tuple(np.asarray(env.action_space.low).tolist()),
        action_high=tuple(np.asarray(env.action_space.high).tolist()),
        noise_beta=1.0,
    )
    return cfg, predict_fn


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


# --------------------------------------------------------------------------- #
# exact single-device emulation of plan_step_sharded's spec
# --------------------------------------------------------------------------- #
def emulate_plan_step_sharded(cfg, predict_fn, cost_fn, n_dev, pstate, obs,
                              model_state):
    """The mathematical spec of plan_step_sharded with no mesh: same key
    threading and candidate union, direct global selection."""
    K = cfg.num_elites
    E = cfg.elites_kept
    last_iter = cfg.opt_iterations - 1
    mean, std = pstate.mean, pstate.std
    key = pstate.key
    have_elites = pstate.have_elites
    elite_actions, elite_costs = pstate.elite_actions, pstate.elite_costs
    elite_last_obs = pstate.elite_last_obs

    best_action_seq = jnp.zeros((cfg.horizon, cfg.action_dim))
    best_cost = jnp.inf
    best_last_obs = jnp.zeros_like(obs)

    for i, n_i in enumerate(cfg.population_schedule):
        key, k_it, k_shift = jax.random.split(key, 3)
        n_local = -(-n_i // n_dev)
        use_mean_row = cfg.use_mean_actions and i == last_iter

        cand_a, cand_c, cand_o, cand_valid = [], [], [], []
        for d in range(n_dev):  # the union every device's shard contributes
            k = jax.random.fold_in(k_it, d)
            fresh = ic.sample_action_sequences(cfg, k, mean, std, n_local)
            if use_mean_row and d == 0:
                fresh = fresh.at[0].set(mean)
            traj = rollout_open_loop(predict_fn, model_state, obs, fresh)
            costs = trajectory_cost(cost_fn, traj, cfg.cost_along_trajectory,
                                    cfg.use_env_reward_as_cost)
            cand_a.append(fresh)
            cand_c.append(costs)
            cand_o.append(traj.next_observations[-1])
            cand_valid.append(jnp.ones(n_local, bool))

        if i == 0 and cfg.shift_elites_over_time and E > 0:
            last_step = ic.sample_action_sequences(cfg, k_shift, mean, std, E)[:, -1:, :]
            shifted = jnp.concatenate([elite_actions[:E, 1:, :], last_step], axis=1)
            straj = rollout_open_loop(predict_fn, model_state, obs, shifted)
            scosts = trajectory_cost(cost_fn, straj, cfg.cost_along_trajectory,
                                     cfg.use_env_reward_as_cost)
            cand_a.append(shifted)
            cand_c.append(scosts)
            cand_o.append(straj.next_observations[-1])
            cand_valid.append(jnp.broadcast_to(have_elites, (E,)))

        if i > 0 and cfg.keep_previous_elites and E > 0:
            cand_a.append(elite_actions[:E])
            cand_c.append(elite_costs[:E])
            cand_o.append(elite_last_obs[:E])
            cand_valid.append(jnp.ones(E, bool))

        cand_a = jnp.concatenate(cand_a, axis=0)
        cand_c = jnp.concatenate(cand_c, axis=0)
        cand_o = jnp.concatenate(cand_o, axis=0)
        cand_valid = jnp.concatenate(cand_valid, axis=0)
        cand_c = jnp.where(cand_valid & jnp.isfinite(cand_c), cand_c, jnp.inf)

        best_idx = jnp.argmin(cand_c)
        best_action_seq = jnp.take(cand_a, best_idx, axis=0)
        best_cost = cand_c[best_idx]
        best_last_obs = jnp.take(cand_o, best_idx, axis=0)

        mean, std, elite_actions, elite_costs, elite_last_obs = ic._refit(
            cfg, mean, std, cand_a, cand_c, cand_o)
        have_elites = jnp.asarray(True)

    executed = best_action_seq[0]
    mean = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
    std = ic.init_std(cfg)
    state = ic.ICemState(mean=mean, std=std, elite_actions=elite_actions,
                         elite_costs=elite_costs, elite_last_obs=elite_last_obs,
                         have_elites=have_elites, key=key)
    return ic.PlanResult(action=executed, state=state, expected_cost=best_cost,
                         best_actions=best_action_seq, best_last_obs=best_last_obs)


def test_sharded_exactly_matches_emulation_over_two_steps():
    """plan_step_sharded's decisions equal the no-mesh spec: identical elite
    sets/order, refit, executed action, and expected cost — step 1 (no elite
    memory, masking branch) AND step 2 (shift/keep elite branches live)."""
    env = PointMass(goal=(0.15, -0.1))
    cfg, predict_fn = _setup(env, horizon=8, N=24)
    mesh = make_pop_mesh()
    n_dev = mesh.devices.size

    state = jnp.array([0.25, -0.35, 0.0, 0.0])
    obs = env.observation(state)
    ps0 = ic.init_state(cfg, env.obs_dim, jax.random.key(7))

    sharded = jax.jit(lambda p, o, m: plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, m))
    res_s1 = sharded(ps0, obs, state)
    res_e1 = emulate_plan_step_sharded(cfg, predict_fn, env.cost_fn, n_dev,
                                       ps0, obs, state)

    def assert_match(rs, re, step):
        np.testing.assert_allclose(np.asarray(rs.action), np.asarray(re.action),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"step {step}: executed action")
        np.testing.assert_allclose(float(rs.expected_cost), float(re.expected_cost),
                                   rtol=1e-5, err_msg=f"step {step}: cost")
        np.testing.assert_allclose(np.asarray(rs.state.elite_costs),
                                   np.asarray(re.state.elite_costs),
                                   rtol=1e-5, err_msg=f"step {step}: elite costs")
        np.testing.assert_allclose(np.asarray(rs.state.elite_actions),
                                   np.asarray(re.state.elite_actions),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"step {step}: elite actions")
        np.testing.assert_allclose(np.asarray(rs.state.mean),
                                   np.asarray(re.state.mean),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"step {step}: refit mean")
        np.testing.assert_allclose(np.asarray(rs.best_actions),
                                   np.asarray(re.best_actions),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"step {step}: best plan")

    assert_match(res_s1, res_e1, 1)

    # second step from the (identical) updated state: elite shift + keep paths
    res_s2 = sharded(res_s1.state, obs, state)
    res_e2 = emulate_plan_step_sharded(cfg, predict_fn, env.cost_fn, n_dev,
                                       res_e1.state, obs, state)
    assert_match(res_s2, res_e2, 2)


def test_sharded_uses_cross_device_collectives():
    """The compiled sharded plan actually spans the mesh: its HLO contains a
    cross-device collective (the elite all-gather) over >1 device."""
    env = PointMass(goal=(0.0, 0.0))
    cfg, predict_fn = _setup(env, horizon=4, N=16)
    mesh = make_pop_mesh()
    state = jnp.array([0.3, -0.3, 0.0, 0.0])
    obs = env.observation(state)
    ps = ic.init_state(cfg, env.obs_dim, jax.random.key(0))

    lowered = jax.jit(lambda p, o, m: plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, m)).lower(ps, obs, state)
    hlo = lowered.compile().as_text()
    assert "all-gather" in hlo or "all-to-all" in hlo or "collective" in hlo, \
        "no cross-device collective in the compiled sharded plan"


def test_sharded_plan_step_runs_and_improves():
    env = PointMass(goal=(0.0, 0.0))
    cfg, predict_fn = _setup(env)
    mesh = make_pop_mesh()

    state = jnp.array([0.3, -0.3, 0.0, 0.0])
    obs = env.observation(state)
    ps = ic.init_state(cfg, env.obs_dim, jax.random.key(0))

    step_fn = jax.jit(lambda p, o, m: plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, m))
    res = step_fn(ps, obs, state)
    assert res.action.shape == (2,)
    assert np.isfinite(float(res.expected_cost))
    assert bool(res.state.have_elites)
    # elites sorted and finite
    ec = np.asarray(res.state.elite_costs)
    assert np.all(np.isfinite(ec)) and np.all(np.diff(ec) >= 0)
    # a second step reuses elite memory without shape errors
    res2 = step_fn(res.state, obs, state)
    assert np.isfinite(float(res2.expected_cost))


def test_sharded_episode_control_quality():
    """Full sharded-planner episode drives pendulum near upright."""
    env = ContinuousPendulum()
    cfg, predict_fn = _setup(env, horizon=20, N=40)
    mesh = make_pop_mesh()

    plan = jax.jit(lambda p, o, m: plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, m))
    step = jax.jit(env.step)

    state = jnp.array([np.pi * 0.9, 0.0])
    obs = env.observation(state)
    ps = ic.init_state(cfg, env.obs_dim, jax.random.key(3))
    costs = []
    for _ in range(70):
        res = plan(ps, obs, state)
        ps = res.state
        state, obs, r, _ = step(state, res.action)
        costs.append(-float(r))
    assert np.mean(costs[-10:]) < 0.5, f"tail cost {np.mean(costs[-10:])}"


# --------------------------------------------------------------------------- #
# sharded vanilla CEM
# --------------------------------------------------------------------------- #
def test_cem_sharded_plan_runs_and_steers():
    from icem_tpu.controllers.cem_std import CemStdConfig
    from icem_tpu.controllers.cem_std import init_state as cem_init

    env = PointMass(goal=(0.2, 0.1))

    def predict_fn(ms, obs, act):
        ns, no, rew, _ = env.step(ms, act)
        return ns, no, rew

    cfg = CemStdConfig(horizon=12, num_simulated_trajectories=48,
                       action_dim=env.action_dim,
                       action_low=tuple(np.asarray(env.action_space.low).tolist()),
                       action_high=tuple(np.asarray(env.action_space.high).tolist()))
    mesh = make_pop_mesh()
    state = jnp.array([-0.3, -0.3, 0.0, 0.0])
    obs = env.observation(state)
    ps = cem_init(cfg, jax.random.key(5))

    plan = jax.jit(lambda p, o, m: cem_plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, m))
    res = plan(ps, obs, state)
    a = np.asarray(res.action)
    assert np.isfinite(float(res.expected_cost))
    assert a[0] > 0 and a[1] > 0, f"action {a} not goal-directed"
    res2 = plan(res.state, obs, state)
    assert np.isfinite(float(res2.expected_cost))


# --------------------------------------------------------------------------- #
# product surface: controllers build the sharded plan from config
# --------------------------------------------------------------------------- #
def test_resolve_mesh_semantics():
    assert resolve_mesh(False) is None
    m = resolve_mesh(True)
    assert m is not None and m.devices.size == 8
    m = resolve_mesh("auto")
    assert m is not None and m.devices.size == 8
    # num_parallel caps the mesh width (ParallelGroundTruthModel hint)
    m = resolve_mesh(True, num_parallel=4)
    assert m.devices.size == 4
    assert resolve_mesh("auto", num_parallel=1) is None


def test_mpc_icem_sharded_controller_end_to_end():
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.models.ground_truth import GroundTruthModel

    env = ContinuousPendulum()
    ctrl = MpcICem(env=env, forward_model=GroundTruthModel(env=env),
                   horizon=15, num_simulated_trajectories=32,
                   action_sampler_params={"opt_iterations": 2, "noise_beta": 2.0},
                   sharded=True, seed=11)
    assert ctrl._mesh is not None and ctrl._mesh.devices.size == 8

    state = jnp.array([np.pi * 0.9, 0.0])
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    step = jax.jit(env.step)
    rew = []
    for _ in range(60):
        a = ctrl.get_action(np.asarray(obs), state)
        state, obs, r, _ = step(state, jnp.asarray(a))
        rew.append(float(r))
    assert np.mean(rew[-10:]) > -0.5, f"tail reward {np.mean(rew[-10:])}"


def test_mpc_cem_std_sharded_controller_steps():
    from icem_tpu.controllers.cem_std import MpcCemStd
    from icem_tpu.models.ground_truth import GroundTruthModel

    env = PointMass(goal=(0.2, 0.1))
    ctrl = MpcCemStd(env=env, forward_model=GroundTruthModel(env=env),
                     horizon=10, num_simulated_trajectories=32,
                     action_sampler_params={"opt_iterations": 2},
                     sharded=True, seed=12)
    assert ctrl._mesh is not None and ctrl._mesh.devices.size == 8
    state = jnp.array([-0.3, -0.3, 0.0, 0.0])
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=state)
    a = ctrl.get_action(np.asarray(obs), state)
    assert a.shape == (2,) and np.all(np.isfinite(a))


def test_mpc_icem_sharded_with_learned_model():
    """Learned-model weights thread through the sharded plan as replicated
    runtime args (config-reachable: the ensemble configs inherit
    sharded='auto', so a multi-chip host runs exactly this path)."""
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.models.ensemble import EnsembleModel

    env = ContinuousPendulum()
    fm = EnsembleModel(env=env, ensemble_size=2, hidden=[16], epochs=1,
                       batch_size=32, seed=0)
    ctrl = MpcICem(env=env, forward_model=fm, horizon=6,
                   num_simulated_trajectories=16,
                   action_sampler_params={"opt_iterations": 2},
                   sharded=True, seed=4)
    assert ctrl._mesh is not None and ctrl._mesh.devices.size == 8

    state = jnp.array([np.pi, 0.0])
    obs = env.observation(state)
    ctrl.beginning_of_rollout(observation=obs, state=None)  # learned: no env state
    a = ctrl.get_action(np.asarray(obs), None)
    assert a.shape == (1,) and np.all(np.isfinite(a))
    # after (re)training, the NEW params flow through the jitted sharded plan
    from icem_tpu.runtime.buffer import Rollout, RolloutBuffer
    rng = np.random.default_rng(0)
    o = rng.normal(size=(64, 3)).astype(np.float32)
    buf = RolloutBuffer(rollouts=[Rollout(data=dict(
        observations=o, next_observations=o + 0.01,
        actions=rng.normal(size=(64, 1)).astype(np.float32),
        rewards=np.zeros(64, np.float32), dones=np.zeros(64, np.float32)))])
    fm.train(buf)
    a2 = ctrl.get_action(np.asarray(obs), None)
    assert np.all(np.isfinite(a2))


def test_check_vma_workaround_still_needed(monkeypatch):
    """Canary for parallel.plan.CHECK_VMA (the check_vma=False workaround).

    Reproduces the jax 0.9 varying-axis typing gap on the REAL product path:
    a sharded plan over a physics-engine env whose mass_matrix uses
    jacfwd(grad(.)) — the constant AD basis seeds concatenate with varying fk
    tangents and check_vma=True fails to type the program. If this test ever
    FAILS because no error is raised, upstream fixed the inference: flip
    plan.CHECK_VMA's default to True and delete this canary.
    """
    import pytest

    from icem_tpu.envs import env_from_string
    from icem_tpu.parallel import plan as plan_mod

    env = env_from_string("Reacher")
    cfg, predict_fn = _setup(env, horizon=3, N=16)
    mesh = make_pop_mesh()
    state, obs = env.reset_with_mode(jax.random.key(0), "train")
    ps = ic.init_state(cfg, env.obs_dim, jax.random.key(1))

    monkeypatch.setattr(plan_mod, "CHECK_VMA", True)
    with pytest.raises(Exception, match="(?i)vma|varying|manual axes"):
        jax.jit(lambda p, o, m: plan_step_sharded(
            cfg, predict_fn, env.cost_fn, mesh, p, o, m))(ps, obs, state)
