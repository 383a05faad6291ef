"""Random controllers.

- RndController: model-free random policy with an action-change frequency
  (reference: icem/controllers/random.py:4-23)
- MpcRandom: MPC with uniform random action sequences held constant for
  ``action_change_frequency`` steps; simulates them through the forward model
  and executes the argmin-cost rollout's first action
  (reference: icem/controllers/mpc.py:86-138)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.models.base import rollout_open_loop, trajectory_cost


def sample_held_action_sequences(key, low, high, num_traj: int, horizon: int,
                                 change_every: int):
    """[p, h, d] uniform sequences where the action changes every
    ``change_every`` steps (mpc.py:95-108 semantics)."""
    d = low.shape[-1]
    n_blocks = -(-horizon // change_every)
    blocks = jax.random.uniform(key, (num_traj, n_blocks, d), jnp.float32,
                                minval=low, maxval=high)
    held = jnp.repeat(blocks, change_every, axis=1)[:, :horizon]
    return held


class RndController:
    """Model-free uniform-random policy (random.py:4-23)."""

    needs_training = False
    needs_data = False
    has_state = False
    needs_forward_model = False

    def __init__(self, *, env, action_change_frequency: int = 1,
                 seed: Optional[int] = None, **kwargs):
        self.env = env
        self.action_change_frequency = int(action_change_frequency)
        from icem_tpu.runtime.seeding import Seeding
        self._key = jax.random.key(seed) if seed is not None \
            else Seeding.next_key("controller/rnd")
        self._counter = 0
        self._current = None

    def get_action(self, obs, state=None, mode="train"):
        if self._current is None or self._counter >= self.action_change_frequency:
            self._key, k = jax.random.split(self._key)
            self._current = np.asarray(self.env.action_space.sample(k))
            self._counter = 0
        self._counter += 1
        return self._current

    def beginning_of_rollout(self, *, observation, state=None, mode="train"):
        self._counter = 0
        self._current = None

    def end_of_rollout(self, total_time, total_return, mode):
        pass

    # -- functional interface for fused on-device episodes ------------------
    # Random bootstrap rollouts are the one policy the learned-model loops
    # run FIRST — without this, sample() fell back to the host episode loop
    # (task_horizon device round-trips per episode; the r4/r5 TPU-tunnel
    # crash class). Plan state carries (key, steps-since-redraw, held
    # action) so action_change_frequency > 1 keeps its hold semantics.
    def init_plan_state(self, obs_dim: int, key):
        # counter starts saturated so step 0 draws a fresh action
        return (key, jnp.int32(self.action_change_frequency),
                jnp.zeros(self.env.action_space.dim, jnp.float32))

    def functional_plan(self):
        env = self.env
        freq = self.action_change_frequency

        def plan(ps, obs, env_state, model_params=None):
            key, count, current = ps
            key, k = jax.random.split(key)
            redraw = count >= freq
            action = jnp.where(redraw, env.action_space.sample(k), current)
            count = jnp.where(redraw, jnp.int32(1), count + 1)
            return action, (key, count, action)

        return plan

    @property
    def live_model_params(self):
        return None  # model-free

    def train(self, buffer):
        return {}

    def save(self, path):
        """Persist the PRNG key + held-action state (resume-fidelity
        equivalent of the reference's pickled controller attrs)."""
        import pickle
        from icem_tpu.runtime.checkpoint import pack_pytree
        state = {"key": pack_pytree(self._key), "counter": self._counter,
                 "current": self._current}
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        import os
        import pickle
        from icem_tpu.runtime.checkpoint import unpack_pytree
        if not os.path.exists(path):
            return
        with open(path, "rb") as f:
            state = pickle.load(f)
        self._key = unpack_pytree(state["key"])
        self._counter = int(state["counter"])
        self._current = state["current"]


from icem_tpu.controllers.mpc_common import ModelConsistencyMixin


class MpcRandom(ModelConsistencyMixin):
    """Random-shooting MPC (mpc.py:86-138)."""

    needs_training = False
    needs_data = False
    has_state = True
    needs_forward_model = True

    def __init__(self, *, env, forward_model, horizon=30,
                 num_simulated_trajectories=40, cost_along_trajectory="sum",
                 use_env_reward_as_cost=False, action_sampler_params=None,
                 factor_decrease_num=1, verbose=False, do_visualize_plan=False,
                 seed: Optional[int] = None, **kwargs):
        if num_simulated_trajectories < 2:
            raise ValueError("At least two trajectories needed!")
        asp = dict(action_sampler_params or {})
        from icem_tpu.controllers.icem import _validate_sampler_params
        _validate_sampler_params(asp, ("action_change_frequency",))
        self.env = env
        self.forward_model = forward_model
        self.horizon = int(horizon)
        self.num_sim_traj = int(num_simulated_trajectories)
        self.cost_along_trajectory = cost_along_trajectory
        self.use_env_reward_as_cost = bool(use_env_reward_as_cost)
        self.action_change_frequency = int(asp.get("action_change_frequency", 1))
        if self.action_change_frequency >= self.horizon:
            raise ValueError("action_change_frequency must be < horizon")  # mpc.py:92
        self._seed = seed
        self.verbose = bool(verbose)
        self._key = None
        self._model_state = None

        low = jnp.asarray(env.action_space.low, jnp.float32)
        high = jnp.asarray(env.action_space.high, jnp.float32)

        def _plan(key, obs, model_state):
            key, k = jax.random.split(key)
            actions = sample_held_action_sequences(
                k, low, high, self.num_sim_traj, self.horizon,
                self.action_change_frequency)
            traj = rollout_open_loop(forward_model.predict_fn, model_state, obs, actions)
            costs = trajectory_cost(env.cost_fn, traj, cost_along_trajectory,
                                    self.use_env_reward_as_cost)
            # non-finite costs rank last (see icem.top_k_ascending)
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
            best = jnp.argmin(costs)
            return actions[best, 0], costs[best], key

        self._plan = jax.jit(_plan)
        self._advance = jax.jit(forward_model.predict_fn)
        self.last_expected_cost = None

    @property
    def model_evals_per_timestep(self):
        return self.num_sim_traj * self.horizon

    def beginning_of_rollout(self, *, observation, state=None, mode="train"):
        from icem_tpu.runtime.seeding import Seeding
        self._key = jax.random.key(self._seed) if self._seed is not None \
            else Seeding.next_key("controller/mpc-random")
        self._model_state = self.forward_model.got_actual_observation_and_env_state(
            observation=observation, env_state=state, model_state=None)

    def end_of_rollout(self, total_time, total_return, mode):
        pass

    def get_action(self, obs, state=None, mode="train"):
        if self._key is None:
            raise AttributeError("beginning_of_rollout() needs to be called before")
        obs = jnp.asarray(obs, jnp.float32)
        if self.verbose:
            self.check_model_consistency(state)
        self._model_state = self.forward_model.got_actual_observation_and_env_state(
            observation=obs, env_state=state, model_state=self._model_state)
        action, cost, self._key = self._plan(self._key, obs, self._model_state)
        self.last_expected_cost = cost
        if self._model_state is not None:
            self._model_state, _, _ = self._advance(self._model_state, obs, action)
        return np.asarray(action)

    # -- functional interface for fused on-device episodes ------------------
    def init_plan_state(self, obs_dim: int, key):
        return key

    def functional_plan(self):
        plan_impl = self._plan
        init_model_state = self.forward_model.init_model_state

        def plan(key, obs, env_state, model_params=None):
            model_state = init_model_state(obs, env_state)
            action, _, key2 = plan_impl(key, obs, model_state)
            return action, key2

        return plan

    @property
    def live_model_params(self):
        return None  # GT-model only

    def train(self, buffer):
        return {}

    def save(self, path):
        """Persist the PRNG key + synced model state (see MpcICem.save)."""
        import pickle
        from icem_tpu.runtime.checkpoint import pack_pytree
        state = {
            "key": pack_pytree(self._key) if self._key is not None else None,
            "model_state": pack_pytree(self._model_state)
            if self._model_state is not None else None,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        import os
        import pickle
        from icem_tpu.runtime.checkpoint import unpack_pytree
        if not os.path.exists(path):
            return
        with open(path, "rb") as f:
            state = pickle.load(f)
        if state.get("key") is not None:
            self._key = unpack_pytree(state["key"])
        if state.get("model_state") is not None:
            self._model_state = unpack_pytree(state["model_state"])
