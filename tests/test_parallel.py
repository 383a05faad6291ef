"""Multi-device sharding tests on the CPU-simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.controllers import icem as ic
from icem_tpu.envs.classic import ContinuousPendulum, PointMass
from icem_tpu.parallel.plan import make_pop_mesh, plan_step_sharded


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


def test_sharded_plan_step_runs_and_improves():
    env = PointMass(goal=(0.0, 0.0))
    cfg, predict_fn = _setup(env)
    mesh = make_pop_mesh()

    state = jnp.array([0.3, -0.3, 0.0, 0.0])
    obs = env.observation(state)
    ps = ic.init_state(cfg, env.obs_dim, jax.random.key(0))

    step_fn = jax.jit(lambda p, o, m: plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, m))
    action, ps2, cost = step_fn(ps, obs, state)
    assert action.shape == (2,)
    assert np.isfinite(float(cost))
    assert bool(ps2.have_elites)
    # elites sorted and finite
    ec = np.asarray(ps2.elite_costs)
    assert np.all(np.isfinite(ec)) and np.all(np.diff(ec) >= 0)
    # a second step reuses elite memory without shape errors
    action2, ps3, cost2 = step_fn(ps2, obs, state)
    assert np.isfinite(float(cost2))


def test_sharded_matches_single_device_statistics():
    """Sharded and single-device planners are different PRNG streams but must
    agree statistically: both should steer the point mass toward the goal."""
    env = PointMass(goal=(0.2, 0.1))
    cfg, predict_fn = _setup(env, horizon=15, N=64)
    mesh = make_pop_mesh()
    state = jnp.array([-0.3, -0.3, 0.0, 0.0])
    obs = env.observation(state)

    ps_s = ic.init_state(cfg, env.obs_dim, jax.random.key(1))
    a_sharded, _, c_sharded = jax.jit(lambda p, o, m: plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, m))(ps_s, obs, state)

    ps_1 = ic.init_state(cfg, env.obs_dim, jax.random.key(2))
    res = jax.jit(lambda p, o, m: ic.plan_step(
        cfg, predict_fn, env.cost_fn, p, o, m))(ps_1, obs, state)

    # both first actions should push up-right (toward the goal)
    for a in (np.asarray(a_sharded), np.asarray(res.action)):
        assert a[0] > 0 and a[1] > 0, f"action {a} not goal-directed"
    # costs in the same ballpark
    assert abs(float(c_sharded) - float(res.expected_cost)) < \
        0.5 * max(abs(float(res.expected_cost)), 1.0)


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
        action, ps, _ = plan(ps, obs, state)
        state, obs, r, _ = step(state, action)
        costs.append(-float(r))
    assert np.mean(costs[-10:]) < 0.5, f"tail cost {np.mean(costs[-10:])}"
