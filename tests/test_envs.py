"""Environment-zoo tests: shapes, finiteness, cost semantics, GT contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.envs import env_from_string
from icem_tpu.envs.base import DiscreteSpace

ALL_ENVS = [
    ("ContinuousPendulum", {}, 3, 1),
    ("ContinuousMountainCar", {}, 2, 1),
    ("DiscreteMountainCar", {}, 2, 1),
    ("DiscreteCartPole", {}, 4, 1),
    ("ContinuousLunarLander", {}, 8, 2),
    ("HalfCheetah", {"exclude_current_positions_from_observation": True}, 17, 6),
    ("HalfCheetah", {"exclude_current_positions_from_observation": False}, 18, 6),
    ("Hopper", {"exclude_current_positions_from_observation": False}, 12, 3),
    ("Ant", {"exclude_current_positions_from_observation": False}, 28, 8),
    ("PlanarAnt", {"exclude_current_positions_from_observation": False}, 16, 4),
    ("Reacher", {}, 11, 2),
    ("HumanoidStandup", {}, 46, 17),
    ("Humanoid", {}, 46, 17),
    ("Humanoid", {"exclude_current_positions_from_observation": True}, 44, 17),
    ("PlanarHumanoidStandup", {}, 26, 9),
    ("PlanarHumanoid", {}, 26, 9),
    ("FetchReach", {"sparse": False, "threshold": 0.05}, 13, 4),
    ("FetchPickAndPlace", {"sparse": True, "threshold": 0.05}, 28, 4),
    ("Door", {"shaped_reward": False}, 39, 28),
    ("Relocate", {}, 42, 30),
    ("cartpole", {"task_name": "swingup"}, 5, 1),
    ("reacher", {"task_name": "easy"}, 6, 2),
    ("restricted_reacher", {"task_name": "easy"}, 6, 2),
    ("point_mass", {"task_name": "easy"}, 4, 2),
    ("restricted_point_mass", {}, 4, 2),
    ("cheetah", {"task_name": "run", "penalise_flipping": True}, 18, 6),
    ("swimmer", {"task_name": "swimmer6"}, 25, 5),
]


@pytest.mark.parametrize("name,kwargs,obs_dim,act_dim",
                         ALL_ENVS, ids=[f"{n}-{i}" for i, (n, *_ ) in enumerate(ALL_ENVS)])
def test_env_contract(name, kwargs, obs_dim, act_dim):
    env = env_from_string(name, **kwargs)
    assert env.obs_dim == obs_dim
    assert env.action_dim == act_dim

    key = jax.random.key(0)
    state, obs = env.reset_with_mode(key, "train")
    assert obs.shape == (obs_dim,)
    assert np.all(np.isfinite(np.asarray(obs)))

    step = jax.jit(env.step)
    k = jax.random.key(1)
    for _ in range(5):
        k, k2 = jax.random.split(k)
        a = env.action_space.sample(k2)
        state, obs, reward, done = step(state, a)
    assert np.all(np.isfinite(np.asarray(obs))), name
    assert np.isfinite(float(reward))

    # batched cost over [T, B, dim] contract (misc/base_types.py:22-24)
    obs_b = jnp.broadcast_to(obs, (4, 7, obs_dim))
    act_b = jnp.zeros((4, 7, act_dim))
    costs = env.cost_fn(obs_b, act_b, obs_b)
    assert costs.shape == (4, 7)
    assert np.all(np.isfinite(np.asarray(costs)))


def test_state_from_observation_roundtrip():
    for name, kwargs in [
        ("ContinuousPendulum", {}),
        ("HalfCheetah", {"exclude_current_positions_from_observation": False}),
        ("Hopper", {"exclude_current_positions_from_observation": False}),
        ("Ant", {"exclude_current_positions_from_observation": False}),
        ("PlanarAnt", {"exclude_current_positions_from_observation": False}),
        ("cartpole", {"task_name": "swingup"}),
        ("HumanoidStandup", {}),
    ]:
        env = env_from_string(name, **kwargs)
        state, obs = env.reset_with_mode(jax.random.key(3), "train")
        state2 = env.state_from_observation(obs)
        obs2 = env.observation(state2)
        np.testing.assert_allclose(np.asarray(obs), np.asarray(obs2),
                                   atol=1e-5, err_msg=name)


def test_cheetah_cost_exact_formula():
    env = env_from_string("HalfCheetah",
                          exclude_current_positions_from_observation=False,
                          penalise_flipping=True)
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((32, 18)).astype(np.float32) * 2
    act = rng.standard_normal((32, 6)).astype(np.float32)
    got = np.asarray(env.cost_fn(jnp.array(obs), jnp.array(act), None))
    want = (10.0 * (obs[:, 2] > np.pi / 2) + 10.0 * (obs[:, 2] < -np.pi / 2)
            + 0.1 * np.sum(act**2, -1) - obs[:, 9])
    np.testing.assert_allclose(got, want, rtol=1e-5)
    with pytest.raises(ValueError):
        env.cost_fn(jnp.zeros((4, 13)), jnp.zeros((4, 6)), None)


def test_fetch_goal_interface():
    env = env_from_string("FetchPickAndPlace", sparse=True, threshold=0.05)
    state, obs = env.reset_with_mode(jax.random.key(0), "train")
    goal = env.goal_from_observation(obs[None])
    achieved = env.achieved_goal_from_observation(obs[None])
    assert goal.shape == (1, 3) and achieved.shape == (1, 3)
    # sparse cost is 0/1
    c = env.cost_fn(obs[None], jnp.zeros((1, 4)), obs[None])
    assert float(c[0]) in (0.0, 1.0)
    # overwrite_goal respects the relationship goal_from_obs(overwritten) == g
    g = jnp.array([[1.0, 2.0, 3.0]])
    new_obs = env.overwrite_goal(obs[None], g)
    np.testing.assert_allclose(np.asarray(env.goal_from_observation(new_obs)), g)
    # dense variant
    env_d = env_from_string("FetchPickAndPlace", sparse=False, threshold=0.05)
    c = env_d.cost_fn(obs[None], jnp.zeros((1, 4)), obs[None])
    assert float(c[0]) > 0


def test_door_cost_bonus_tiers():
    env = env_from_string("Door", shaped_reward=False, add_bonus_rewards=True)
    obs = np.zeros((4, 39), np.float32)
    obs[:, 28] = [0.0, 0.5, 1.2, 1.5]  # door_pos
    costs = np.asarray(env.cost_fn(jnp.array(obs), None, None))
    base = 0.1 * (obs[:, 28] - 1.57) ** 2 + 1e-5 * np.sum(obs[:, -30:] ** 2, -1)
    want = base - 2 * (obs[:, 28] > 0.2) - 8 * (obs[:, 28] > 1.0) - 10 * (obs[:, 28] > 1.35)
    np.testing.assert_allclose(costs, want, rtol=1e-5)


def test_relocate_lift_bonus():
    env = env_from_string("Relocate")
    obs = np.zeros((2, 42), np.float32)
    obs[0, -1] = 0.0   # on the table
    obs[1, -1] = 0.2   # lifted
    obs[:, 36:39] = 0.5  # obj far from target
    costs = np.asarray(env.cost_fn(jnp.array(obs), None, None))
    assert costs[1] < costs[0]  # lift bonus dominates at same distances


def test_discrete_space_embedding_roundtrip():
    sp = DiscreteSpace(3)
    idx = jnp.array([0, 1, 2])
    emb = sp.embed(idx)
    back = sp.index(emb[:, None])
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


@pytest.mark.parametrize("name,obs_dim,act_dim", [
    ("HumanoidStandup", 46, 17), ("PlanarHumanoidStandup", 26, 9)])
def test_humanoid_standup_cost_reads_height(name, obs_dim, act_dim):
    env = env_from_string(name)
    obs = np.zeros((3, obs_dim), np.float32)
    obs[:, 2] = [0.1, 0.5, 1.0]
    costs = np.asarray(env.cost_fn(jnp.array(obs),
                                   np.zeros((3, act_dim), np.float32), None))
    assert np.all(np.diff(costs) < 0)  # higher is cheaper
    np.testing.assert_allclose(costs, -obs[:, 2], rtol=1e-5)


@pytest.mark.parametrize("name,obs_dim,act_dim", [
    ("Ant", 28, 8), ("PlanarAnt", 16, 4)])
def test_ant_cost_exact_formula(name, obs_dim, act_dim):
    env = env_from_string(name, exclude_current_positions_from_observation=False)
    obs = jnp.zeros((3, obs_dim)).at[:, 2].set(jnp.array([0.57, 0.05, 1.5]))
    next_obs = obs.at[:, 0].add(jnp.array([0.1, 0.1, 0.1]))
    act = jnp.full((3, act_dim), 0.5)
    costs = np.asarray(env.cost_fn(obs, act, next_obs))
    x_vel = 0.1 / env.dt
    ctrl = 0.5 * act_dim * 0.25
    np.testing.assert_allclose(costs[0], -x_vel + ctrl, rtol=1e-5)      # healthy
    np.testing.assert_allclose(costs[1], -x_vel + 100.0 + ctrl, rtol=1e-5)  # too low
    np.testing.assert_allclose(costs[2], -x_vel + 100.0 + ctrl, rtol=1e-5)  # too high
    # excluded-positions obs must be rejected (mujoco.py:153-157 analog)
    env2 = env_from_string(name, exclude_current_positions_from_observation=True)
    with pytest.raises(AttributeError):
        env2.cost_fn(jnp.zeros((3, obs_dim - 2)), act, jnp.zeros((3, obs_dim - 2)))


def test_ant_stands_under_zero_action():
    env = env_from_string("PlanarAnt",
                          exclude_current_positions_from_observation=False)
    state, obs = env.reset_with_mode(jax.random.key(0), "train")
    step = jax.jit(env.step)
    for _ in range(20):
        state, obs, reward, done = step(state, jnp.zeros(4))
    z = float(obs[2])
    assert 0.2 < z < 1.0, f"ant fell or flew: z={z}"
    assert float(done) == 0.0


def test_filter_buffers_by_cost():
    """Env.filter_buffers_by_cost keeps lowest-cost trajectories
    (abstract_environments.py:36-47)."""
    from icem_tpu.envs.base import Env
    from icem_tpu.runtime.buffer import Rollout, RolloutBuffer

    def buf(costs):
        rollouts = [Rollout(data=dict(observations=np.full((2, 3), c),
                                      rewards=np.full(2, -c)))
                    for c in costs]
        return RolloutBuffer(rollouts=rollouts)

    buffers = [buf([3.0, 1.0, 2.0, 4.0])]
    costs = [dict(costs=np.array([3.0, 1.0, 2.0, 4.0]))]
    # fraction 1: untouched flat views
    out = Env.filter_buffers_by_cost(buffers, costs, 1)
    assert len(out[0]["rewards"]) == 8
    # keep best 50%: note the reference sizes by len(costs) (num of steps),
    # i.e. num = int(1 * 0.5) = 0 here — mirror with 4 steps
    buffers = buffers * 4
    costs = costs * 4
    out = Env.filter_buffers_by_cost(buffers, costs, 0.5)
    assert all(len(o["rewards"]) == 2 for o in out)  # 2 lowest-cost indices


def test_fpp_ee_pushes_free_object():
    """The gripper body displaces a free object it sweeps through — the
    MuJoCo-contact behavior that gives the reference's unshaped dense cost
    (robotics.py:150-164) a gradient. Without it, pick-and-place is
    unplannable (round-2 find: 0% success on the shipped fpp config)."""
    import jax
    import jax.numpy as jnp

    from icem_tpu.envs import env_from_string

    env = env_from_string("FetchPickAndPlace", sparse=False, threshold=0.05,
                          shaped_reward=False)
    state = env.init_state(jax.random.key(0))
    obj0 = state[4:7]
    step = jax.jit(env.step)
    s = state
    for _ in range(12):
        d = s[4:7] - s[:3]
        a = jnp.concatenate([10 * d / jnp.maximum(jnp.linalg.norm(d), 1e-6),
                             jnp.zeros(1)])
        s, _, _, _ = step(s, a)
    moved = float(jnp.linalg.norm(s[4:7] - obj0))
    assert moved > 0.05, f"EE sweep did not displace the object ({moved})"
    # object stays supported by the table
    assert float(s[6]) >= 0.425


@pytest.mark.slow
def test_fpp_icem_picks_and_places():
    """iCEM solves pick-and-place through the product cost (dense, unshaped,
    reference fpp config semantics) once pushing contact exists."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.envs import env_from_string
    from icem_tpu.models.ground_truth import GroundTruthModel

    env = env_from_string("FetchPickAndPlace", sparse=False, threshold=0.05,
                          shaped_reward=False)
    ctrl = MpcICem(env=env, forward_model=GroundTruthModel(env=env),
                   horizon=20, num_simulated_trajectories=64, seed=5,
                   action_sampler_params=dict(noise_beta=3.0))
    s = env.init_state(jax.random.key(2))
    obs = env.observation(s)
    d0 = float(jnp.linalg.norm(s[4:7] - s[11:14]))
    ctrl.beginning_of_rollout(observation=obs, state=s)
    step = jax.jit(env.step)
    for _ in range(50):
        a = ctrl.get_action(np.asarray(obs), s)
        s, obs, _, _ = step(s, jnp.asarray(a))
    d1 = float(jnp.linalg.norm(s[4:7] - s[11:14]))
    assert d1 < 0.05, f"box->goal distance {d0:.3f} -> {d1:.3f}, not solved"


def test_action_repeat_composes_raw_steps():
    """action_repeat: one control step == N raw physics steps under the held
    action with rewards summed (the PlaNet protocol for the h=12 configs)."""
    import jax
    from icem_tpu.envs.dm_suite import CartPoleSuite

    raw = CartPoleSuite()
    rep = CartPoleSuite(action_repeat=4)
    key = jax.random.key(3)
    s0 = raw.init_state(key)
    a = jnp.array([0.7])

    s, total = s0, 0.0
    for _ in range(4):
        s, obs, r, _ = raw.step(s, a)
        total += float(r)
    s_rep, obs_rep, r_rep, _ = rep.step(s0, a)
    np.testing.assert_allclose(np.asarray(s_rep), np.asarray(s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(obs_rep), np.asarray(obs), rtol=1e-6)
    np.testing.assert_allclose(float(r_rep), total, rtol=1e-5)

    # batched path composes identically (no double-repeat through the
    # vmap fallback)
    states = jnp.stack([s0, s0 + 0.01])
    acts = jnp.stack([a, -a])
    s_b, o_b, r_b, _ = rep.step_batched(states, acts)
    s_ref, o_ref, r_ref, _ = jax.vmap(rep.step)(states, acts)
    np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r_b), np.asarray(r_ref), rtol=1e-6)

    # effective control rate reflects the repeat
    assert rep.get_fps() == pytest.approx(raw.get_fps() / 4)

    # a GT model built on a repeated env advances exactly like reality
    from icem_tpu.models.ground_truth import GroundTruthModel
    gm = GroundTruthModel(env=rep)
    ms, o2, r2 = gm.predict_fn(s0, rep.observation(s0), a)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(s_rep), rtol=1e-6)
    np.testing.assert_allclose(float(r2), float(r_rep), rtol=1e-6)


def test_action_repeat_planar_env_rollout_consistent():
    """Planar envs with action repeat must take the generic scan (the
    whole-horizon fast path bypasses the repeat wrapper) and still produce
    repeat-consistent rollouts."""
    import jax
    from icem_tpu.envs.dm_suite import HalfCheetahSuite
    from icem_tpu.models.base import rollout_open_loop
    from icem_tpu.models.ground_truth import GroundTruthModel

    rep = HalfCheetahSuite(action_repeat=2)
    assert rep.rollout_batched(jnp.zeros((128, 2 * rep.model.ndof)),
                               jnp.zeros((128, 3, rep.action_dim))) is None
    gm = GroundTruthModel(env=rep)
    s0 = rep.init_state(jax.random.key(0))
    obs0 = rep.observation(s0)
    actions = jax.random.uniform(jax.random.key(1), (3, 4, rep.action_dim),
                                 minval=-1, maxval=1)
    traj = rollout_open_loop(gm.predict_fn, s0, obs0, actions)
    # manual composition of raw steps
    s = s0
    for t in range(4):
        for _ in range(2):
            s, obs, r, _ = rep._raw_step(s, actions[0, t])
        np.testing.assert_allclose(np.asarray(traj.next_observations[t, 0]),
                                   np.asarray(obs), rtol=2e-4, atol=2e-5)
