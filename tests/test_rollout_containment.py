"""Physics blow-up containment: host and fused episode paths must truncate
identically.

The reference skips the rest of an episode when MuJoCo raises
(icem/misc/rollout_utils.py:189-194). Our host path truncates on a
non-finite next observation (runtime/rollout.py _sample); the fused
on-device path cannot break out of a scan, so it must fold the blow-up
into the done mask: the blown transition itself is invalid (the host
breaks BEFORE appending it), its reward is zeroed even when the raw
reward is NaN, and every later step is frozen to the last finite state.

Round-4 regression this guards: ``rew * keep`` with ``rew = NaN`` and
``keep = 0`` is still NaN — the fused path leaked NaN returns into the
quality table (QUALITY_r04 humanoid/i-cem-blitz seed 1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.base import BoxSpace, Env
from icem_tpu.runtime.rollout import RolloutManager
from icem_tpu.runtime.seeding import Seeding


class ExplodingEnv(Env):
    """1-D integrator whose observation (and reward) go NaN at a fixed step.

    State = [t, x]; blows up deterministically when t reaches ``blow_at`` so
    both execution paths face the identical event.
    """

    name = "exploding"

    def __init__(self, blow_at: int = 4, **kwargs):
        self.observation_space = BoxSpace(np.full(1, -np.inf), np.full(1, np.inf))
        self.action_space = BoxSpace(np.full(1, -1.0), np.full(1, 1.0))
        super().__init__(**kwargs)
        self.blow_at = int(blow_at)

    def init_state(self, key, mode: str = "train"):
        return jnp.zeros(2, jnp.float32)

    def observation(self, state):
        return state[..., 1:2]

    def step(self, state, action):
        t, x = state[0], state[1]
        x2 = x + 0.1 * action[0]
        # NaN injection: the blow-up happens ON the step that moves t to
        # blow_at (i.e. the (blow_at)-th call counting from 1)
        bad = t + 1.0 >= self.blow_at
        x2 = jnp.where(bad, jnp.nan, x2)
        next_state = jnp.stack([t + 1.0, x2])
        reward = jnp.where(bad, jnp.nan, 1.0)
        return next_state, self.observation(next_state), reward, jnp.float32(0.0)

    def cost_fn(self, observation, action, next_obs):
        return jnp.sum(next_obs**2, axis=-1)


class _ZeroPolicy:
    """Minimal functional controller: constant zero action on both paths."""

    def functional_plan(self):
        def plan(ps, ob, env_state, model_params):
            return jnp.zeros(1, jnp.float32), ps
        return plan

    def init_plan_state(self, obs_dim, key):
        return jnp.zeros(())

    def get_action(self, obs, state, mode="train"):
        return np.zeros(1, np.float32)


def _run_both_paths(blow_at, horizon=10):
    Seeding.set_seed(0)
    env = ExplodingEnv(blow_at=blow_at)
    host = RolloutManager(env, {"task_horizon": horizon, "fuse_on_device": False})
    fused = RolloutManager(env, {"task_horizon": horizon, "fuse_on_device": True})
    r_host = host.sample(_ZeroPolicy(), no_rollouts=1)[0]
    r_fused = fused.sample(_ZeroPolicy(), no_rollouts=1)[0]
    return r_host, r_fused


def test_blowup_truncates_identically_on_both_paths():
    r_host, r_fused = _run_both_paths(blow_at=4)
    # host appends transitions for steps whose next_obs is finite, then
    # breaks: 3 transitions when the 4th step blows
    assert len(r_host) == 3
    assert len(r_fused) == len(r_host)
    for key in ("observations", "next_observations", "actions", "rewards"):
        np.testing.assert_allclose(
            np.asarray(r_fused[key]), np.asarray(r_host[key]), atol=1e-6,
            err_msg=key)
        assert np.all(np.isfinite(np.asarray(r_fused[key]))), key


def test_blowup_on_first_step_yields_empty_rollout_both_paths():
    r_host, r_fused = _run_both_paths(blow_at=1)
    assert len(r_host) == 0
    assert len(r_fused) == 0


def test_fused_return_is_finite_even_with_nan_reward():
    """NaN reward on the blown step must be zeroed, not multiplied by 0."""
    _, r_fused = _run_both_paths(blow_at=4)
    total = float(np.asarray(r_fused["rewards"]).sum())
    assert np.isfinite(total)
    assert total == 3.0  # one unit reward per surviving step


def test_chunked_fused_episodes_match_unchunked_bitwise():
    """Chunking the fused episode scan (the bounded-program-size path for
    the big spatial envs) is pure program slicing: same keys, same per-step
    math, so every recorded array must be BIT-identical to the whole-horizon
    program — including when the blow-up truncation lands mid-chunk and the
    last chunk overruns the horizon (11 steps in 3x4-step chunks)."""
    for blow_at in (4, 99):  # truncating and non-truncating episodes
        Seeding.set_seed(0)
        env = ExplodingEnv(blow_at=blow_at)
        whole = RolloutManager(env, {"task_horizon": 11, "fuse_on_device": True})
        Seeding.set_seed(0)
        chunked = RolloutManager(env, {"task_horizon": 11, "fuse_on_device": True})
        r_whole = whole.sample(_ZeroPolicy(), no_rollouts=3)
        r_chunk = chunked.sample_on_device(_ZeroPolicy(), no_rollouts=3, chunk=4)
        for rw, rc in zip(r_whole, r_chunk):
            assert len(rw) == len(rc)
            for key in ("observations", "next_observations", "actions",
                        "rewards", "dones"):
                np.testing.assert_array_equal(np.asarray(rw[key]),
                                              np.asarray(rc[key]), err_msg=key)


def test_auto_chunk_triggers_above_fused_step_limit():
    """fuse_on_device='auto' must CHUNK (not unfuse) when the workload
    exceeds the env's fused-program budget, and produce the same rollouts."""

    class BudgetedEnv(ExplodingEnv):
        fused_episode_step_limit = 10  # 2 episodes x 9 steps = 18 > 10

    Seeding.set_seed(0)
    env = BudgetedEnv(blow_at=99)
    rm = RolloutManager(env, {"task_horizon": 9, "fuse_on_device": "auto"})
    rollouts = rm.sample(_ZeroPolicy(), no_rollouts=2)
    # the auto path resolved to chunked fusion: the fused cache holds a
    # chunk-keyed entry (cache key ends with the chunk size), not a host loop
    assert rm._fused_cache, "auto path did not fuse"
    (key, _), = rm._fused_cache.items()
    assert key[-1] == 5  # ceil(9 / ceil(18/10)) = 5-step chunks
    Seeding.set_seed(0)
    ref = RolloutManager(env, {"task_horizon": 9, "fuse_on_device": True})
    r_ref = ref.sample(_ZeroPolicy(), no_rollouts=2)
    for rw, rc in zip(r_ref, rollouts):
        np.testing.assert_array_equal(np.asarray(rw["observations"]),
                                      np.asarray(rc["observations"]))
        assert len(rw) == len(rc) == 9


def test_fused_batch_mixes_blown_and_clean_episodes():
    """A blown episode inside a vmapped batch must not poison its peers."""
    Seeding.set_seed(0)

    class MixedEnv(ExplodingEnv):
        # episodes whose init key lands x0 > 0 blow at step 2, others never
        def init_state(self, key, mode="train"):
            x0 = jax.random.uniform(key, (), jnp.float32, -1.0, 1.0)
            return jnp.stack([jnp.where(x0 > 0, 0.0, -1e6), x0])

    env = MixedEnv(blow_at=2)
    rm = RolloutManager(env, {"task_horizon": 6, "fuse_on_device": True})
    rollouts = rm.sample(_ZeroPolicy(), no_rollouts=8)
    lengths = sorted(len(r) for r in rollouts)
    assert set(lengths) <= {1, 6}
    assert 6 in lengths and 1 in lengths  # both kinds occurred
    for r in rollouts:
        assert np.all(np.isfinite(np.asarray(r["rewards"])))


def test_rnd_controller_fuses_with_hold_frequency():
    """RndController bootstrap rollouts ride the fused path (no per-step
    device round-trips) with action_change_frequency hold semantics."""
    from icem_tpu.controllers.random import RndController

    Seeding.set_seed(0)
    env = ExplodingEnv(blow_at=10**9)  # benign integrator
    rm = RolloutManager(env, {"task_horizon": 12, "fuse_on_device": True})
    ctrl = RndController(env=env, action_change_frequency=3)
    rollouts = rm.sample(ctrl, no_rollouts=4)

    assert ctrl._current is None, "host get_action path was used"
    assert rm._fused_cache, "fused path was not taken"
    acts = np.stack([np.asarray(r["actions"]) for r in rollouts])  # [4,12,1]
    assert acts.shape == (4, 12, 1)
    assert np.all(acts >= -1.0) and np.all(acts <= 1.0)
    # held for exactly 3 steps, then redrawn
    for blk in range(4):
        seg = acts[:, 3 * blk:3 * blk + 3]
        assert np.all(seg == seg[:, :1]), "action not held across the block"
    boundaries = acts[:, ::3, 0]  # one value per hold block
    assert np.all(np.abs(np.diff(boundaries, axis=1)) > 1e-9), \
        "action never redrawn at block boundary"
    # episodes are mutually independent draws
    assert np.all(np.abs(boundaries[0] - boundaries[1]) > 1e-9)
