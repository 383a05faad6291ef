"""Environment abstraction: pure-JAX dynamics over explicit state pytrees.

Re-designs the reference's OO env layer (icem/misc/base_types.py:12-39,
icem/environments/abstract_environments.py) TPU-first:

- an env exposes pure functions ``init_state / observation / step / cost_fn``
  over an explicit device-resident state array, so populations of trajectories
  batch with ``vmap`` and shard with ``shard_map`` for free — the reference
  instead cloned host env objects into worker processes
  (icem/models/gt_par_model.py) and stepped a C physics engine serially,
- the state array IS the ground-truth state: ``get_GT_state/set_GT_state/
  simulate`` (abstract_environments.py:140-178) collapse into value passing,
- cost/reward/success functions are vectorized over arbitrary leading batch
  dims, matching the reference's batched cost contract
  (misc/base_types.py:22-24).

Every env here supports the full GroundTruthSupportEnv contract by
construction; envs that can reconstruct state from an observation set
``supports_state_from_obs``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BoxSpace:
    """Continuous action/observation bounds (gym.spaces.Box equivalent)."""

    low: np.ndarray
    high: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "low", np.asarray(self.low, np.float32))
        object.__setattr__(self, "high", np.asarray(self.high, np.float32))

    @property
    def shape(self):
        return self.low.shape

    @property
    def dim(self) -> int:
        return int(np.prod(self.low.shape))

    def sample(self, key):
        return jax.random.uniform(
            key, self.shape, jnp.float32, jnp.asarray(self.low), jnp.asarray(self.high)
        )

    def clip(self, x):
        return jnp.clip(x, jnp.asarray(self.low), jnp.asarray(self.high))


@dataclass(frozen=True)
class DiscreteSpace:
    """Discrete action set exposed through a continuous embedding.

    The reference reshapes discrete spaces so planners can treat them as
    1-d boxes (abstract_environments.py:50-70); we embed n choices in
    [-1, 1] and envs round back to an index inside ``step``.
    """

    n: int

    @property
    def low(self):
        return np.array([-1.0], np.float32)

    @property
    def high(self):
        return np.array([1.0], np.float32)

    @property
    def shape(self):
        return (1,)

    @property
    def dim(self) -> int:
        return 1

    def sample(self, key):
        idx = jax.random.randint(key, (1,), 0, self.n)
        return self.embed(idx)

    def embed(self, index):
        """index in [0, n) -> continuous embedding in [-1, 1]."""
        return (index.astype(jnp.float32) + 0.5) * 2.0 / self.n - 1.0

    def index(self, action):
        """continuous action in [-1, 1] -> nearest index in [0, n)."""
        idx = jnp.floor((action[..., 0] + 1.0) * 0.5 * self.n)
        return jnp.clip(idx, 0, self.n - 1).astype(jnp.int32)

    def clip(self, x):
        return jnp.clip(x, -1.0, 1.0)


class Env:
    """Pure-functional environment.

    State is an explicit jnp array (or small pytree); every method except the
    constructor is traceable. Methods accepting observations are vectorized
    over leading batch dimensions.
    """

    name: str = "env"
    supports_state_from_obs: bool = True
    # masked-L2 default-cost parameters (abstract_environments.py:14-17)
    goal_state: Optional[np.ndarray] = None
    goal_mask: Optional[np.ndarray] = None
    dt: float = 0.05

    observation_space: BoxSpace
    action_space: BoxSpace

    def __init__(self, *, name: Optional[str] = None, action_repeat: int = 1,
                 **kwargs):
        if name is not None:
            self.name = name
        self.init_kwargs = dict(kwargs)
        # action repeat: one control step = N physics steps under the SAME
        # action, rewards summed (the PlaNet protocol the reference's h=12
        # experiments assume, README.md:23-29 — dm_control tasks are
        # unplannable at raw control frequency with a 12-step horizon).
        # Implemented by instance-level wrapping so every consumer — host
        # episode loop, fused episodes, GT forward models, plan replay —
        # sees the macro step; the raw single-step stays reachable as
        # ``_raw_step`` for internal vmap plumbing.
        self.action_repeat = int(action_repeat)
        if self.action_repeat < 1:
            raise ValueError(f"action_repeat must be >= 1, got {action_repeat}")
        self._raw_step = type(self).step.__get__(self)
        self._raw_step_batched = type(self).step_batched.__get__(self)
        if self.action_repeat > 1:
            self.init_kwargs["action_repeat"] = self.action_repeat
            n = self.action_repeat

            # once a substep reports done, later substeps must not accrue
            # reward or advance state (mirrors the fused episode keep-mask);
            # otherwise pairing action_repeat with a terminating env would
            # leak post-termination reward past the terminal state.
            def repeated(state, action):
                state, obs, reward, done = self._raw_step(state, action)
                for _ in range(n - 1):
                    new_state, new_obs, r, d = self._raw_step(state, action)
                    alive = 1.0 - done
                    state = state + alive * (new_state - state)
                    obs = obs + alive * (new_obs - obs)
                    reward = reward + alive * r
                    done = jnp.maximum(done, d)
                return state, obs, reward, done

            def repeated_batched(states, actions):
                states, obs, rewards, dones = self._raw_step_batched(
                    states, actions)
                for _ in range(n - 1):
                    new_states, new_obs, r, d = self._raw_step_batched(
                        states, actions)
                    alive = 1.0 - dones
                    states = states + alive[..., None] * (new_states - states)
                    obs = obs + alive[..., None] * (new_obs - obs)
                    rewards = rewards + alive * r
                    dones = jnp.maximum(dones, d)
                return states, obs, rewards, dones

            self.step = repeated
            self.step_batched = repeated_batched

    # -- core dynamics ----------------------------------------------------
    def init_state(self, key, mode: str = "train"):
        """Initial ground-truth state for a fresh episode."""
        raise NotImplementedError

    def observation(self, state):
        """Observation as a pure function of state."""
        raise NotImplementedError

    def step(self, state, action):
        """One control step: (state, action) -> (next_state, obs, reward, done).

        ``done`` is a float32 flag (0/1); planners ignore it, the episode
        loop uses it for termination masking.
        """
        raise NotImplementedError

    def step_batched(self, states, actions):
        """Population step over leading batch axes; envs with a faster
        population-native path override this (see envs/planar_base.py).
        Vmaps the RAW step — action repeat is layered on top by the
        constructor's instance wrapper."""
        return jax.vmap(self._raw_step)(states, actions)

    # -- costs ------------------------------------------------------------
    def cost_fn(self, observation, action, next_obs):
        """Default: masked L2 distance to goal_state (abstract_environments.py:14-17)."""
        if self.goal_state is None:
            raise NotImplementedError(f"{self.name} defines no goal_state; override cost_fn")
        diff = (observation - jnp.asarray(self.goal_state, jnp.float32)) * jnp.asarray(
            self.goal_mask, jnp.float32
        )
        return jnp.linalg.norm(diff, axis=-1)

    def reward_fn(self, observation, action, next_obs):
        return -self.cost_fn(observation, action, next_obs)

    # -- ground-truth state support (abstract_environments.py:140-178) ----
    def state_from_observation(self, observation):
        """Reconstruct a dynamics state from an observation (GT-model entry)."""
        raise NotImplementedError(f"{self.name} cannot reconstruct state from observation")

    def simulate(self, state, action):
        """set_GT_state + step + get_GT_state collapsed into value passing.
        ``self.step`` here is the (possibly action-repeated) control step, so
        GT-model imagination and reality advance identically."""
        next_state, obs, reward, _ = self.step(state, action)
        return obs, next_state, reward

    @staticmethod
    def compute_state_difference(state1, state2):
        s1 = jnp.concatenate([jnp.ravel(x) for x in jax.tree_util.tree_leaves(state1)])
        s2 = jnp.concatenate([jnp.ravel(x) for x in jax.tree_util.tree_leaves(state2)])
        return jnp.max(jnp.abs(s1 - s2))

    # -- goal-space interface (no-ops unless overridden) -------------------
    def is_success(self, observation, action, next_obs):
        """Per-step success flag; None means the env has no success notion."""
        return None

    # -- rendering (host-side; never in the device hot path) ---------------
    def render_frame(self, state):
        """One RGB frame (uint8 [H,W,3]) of the given state, or None.

        Planar-engine envs render their kinematic skeleton by default;
        other envs may override or leave rendering unsupported.
        """
        model = getattr(self, "model", None)
        if model is not None and hasattr(model, "ndof"):
            from icem_tpu.envs.physics.render import render_planar
            q = np.asarray(state)[: model.ndof]
            return render_planar(model, q)
        return None

    @staticmethod
    def filter_buffers_by_cost(buffers, costs, filtered_fraction: float):
        """Keep the lowest-cost fraction of trajectories per buffer
        (reference: abstract_environments.py:36-47). ``buffers`` and
        ``costs`` are parallel lists (one entry per time step); each costs
        entry is a mapping with a 'costs' array."""
        if filtered_fraction == 1:
            return [buffer.flat for buffer in buffers]
        num = int(len(costs) * filtered_fraction)
        idxs = [np.argsort(np.asarray(c["costs"]))[:num] for c in costs]
        return [{k: np.asarray(v)[idx] for k, v in buffer.flat.items()}
                for buffer, idx in zip(buffers, idxs)]

    # -- misc --------------------------------------------------------------
    def get_fps(self) -> float:
        return 1.0 / (self.dt * self.action_repeat)

    def reset_with_mode(self, key, mode: str):
        state = self.init_state(key, mode)
        return state, self.observation(state)

    def seed(self, seed):  # host-API compatibility
        return seed

    def close(self):
        return None

    @property
    def obs_dim(self) -> int:
        return self.observation_space.dim

    @property
    def action_dim(self) -> int:
        return self.action_space.dim


class MaskedGoalSpaceEnv(Env):
    """Index-based goal extraction with sparse/dense thresholded cost.

    Mirrors MaskedGoalSpaceEnvironmentInterface
    (abstract_environments.py:97-137).
    """

    def __init__(self, *, goal_idx, achieved_goal_idx, sparse: bool, threshold: float = 0.1,
                 **kwargs):
        super().__init__(**kwargs)
        assert threshold >= 0
        self.goal_idx = np.asarray(goal_idx, np.int32)
        self.achieved_goal_idx = np.asarray(achieved_goal_idx, np.int32)
        self.sparse = bool(sparse)
        self.threshold = float(threshold)

    def goal_from_observation(self, observations):
        return jnp.take(observations, jnp.asarray(self.goal_idx), axis=-1)

    def achieved_goal_from_observation(self, observations):
        return jnp.take(observations, jnp.asarray(self.achieved_goal_idx), axis=-1)

    def overwrite_goal(self, observations, goals):
        return observations.at[..., jnp.asarray(self.goal_idx)].set(goals)

    def cost_fn(self, observation, action, next_obs):
        dist = jnp.linalg.norm(
            self.goal_from_observation(observation)
            - self.achieved_goal_from_observation(observation),
            axis=-1,
        )
        if self.sparse:
            return (dist > self.threshold).astype(jnp.float32)
        return dist

    def reward_fn(self, observation, action, next_obs):
        return -self.cost_fn(observation, action, next_obs)

    def is_success(self, observation, action, next_obs):
        dist = jnp.linalg.norm(
            self.goal_from_observation(next_obs)
            - self.achieved_goal_from_observation(next_obs),
            axis=-1,
        )
        return (dist <= self.threshold).astype(jnp.float32)
