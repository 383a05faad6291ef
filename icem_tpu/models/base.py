"""Forward-model abstraction: batched one-step predictors + scan rollouts.

Re-designs the reference ForwardModel API (icem/misc/base_types.py:62-118,
icem/models/abstract_models.py). The reference's ``predict_n_steps`` is a
host-side Python loop over ``policy.get_action`` -> ``predict`` building
per-trajectory Rollouts; here it is one ``lax.scan`` over the horizon with
the population batched by ``vmap`` — the whole p x h rollout is a single
fused XLA program and stays time-major on device (no per-trajectory
transposes in the hot path).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class TrajectoryBatch(NamedTuple):
    """A batch of simulated trajectories, time-major on device.

    observations:      [h, p, obs_dim]  obs BEFORE each step
    next_observations: [h, p, obs_dim]  obs AFTER each step
    actions:           [h, p, act_dim]
    rewards:           [h, p]
    final_model_state: pytree with leading population axis
    """

    observations: jnp.ndarray
    next_observations: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    final_model_state: Any


# A one-step predictor: (model_state, obs, action) -> (model_state, next_obs, reward)
PredictFn = Callable[[Any, jnp.ndarray, jnp.ndarray], tuple]


def broadcast_model_state(model_state, population: int):
    """Replicate a single model state across a population axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (population,) + jnp.shape(x)), model_state
    )


def rollout_open_loop(predict_fn: PredictFn, model_state, obs, actions) -> TrajectoryBatch:
    """Roll a population of open-loop action sequences through a model.

    Equivalent of ForwardModel.predict_n_steps with an OpenLoopPolicy
    (reference: controllers/mpc.py:56-67 + models/gt_model.py:76-102), as a
    single scan-over-horizon of a vmapped one-step predictor.

    model_state: pytree, either unbatched (broadcast to p) or with leading p.
    obs: [obs_dim] or [p, obs_dim] start observation(s).
    actions: [p, h, act_dim] action sequences.
    """
    p, h = actions.shape[0], actions.shape[1]
    # batching follows obs: an unbatched [obs_dim] start means the model
    # state is unbatched too (never infer from state leaf shapes — a state of
    # dimension == p would be misread as already batched)
    if obs.ndim == 1:
        obs = jnp.broadcast_to(obs, (p,) + obs.shape)
        model_state = broadcast_model_state(model_state, p)

    # whole-horizon fast path (planar GT envs): the physics carry stays in
    # its VPU-native layout across the scan; falls through when the shape or
    # model doesn't qualify (decided statically at trace time)
    whole = getattr(predict_fn, "rollout", None)
    if whole is not None:
        out = whole(model_state, actions)
        if out is not None:
            obs_seq, next_obs_seq, actions_tm, rewards, final_ms = out
            return TrajectoryBatch(
                observations=obs_seq, next_observations=next_obs_seq,
                actions=actions_tm, rewards=rewards, final_model_state=final_ms)

    # population-native predictors (e.g. the planar-engine fast path with the
    # population on the VPU lanes) ride along as a ``.batched`` attribute
    step = getattr(predict_fn, "batched", None) or jax.vmap(predict_fn)
    actions_tm = jnp.swapaxes(actions, 0, 1)  # [h, p, d] time-major

    def body(carry, a_t):
        ms, ob = carry
        ms2, ob2, rew = step(ms, ob, a_t)
        return (ms2, ob2), (ob, ob2, rew)

    (final_ms, _), (obs_seq, next_obs_seq, rew_seq) = jax.lax.scan(
        body, (model_state, obs), actions_tm
    )
    return TrajectoryBatch(
        observations=obs_seq,
        next_observations=next_obs_seq,
        actions=actions_tm,
        rewards=rew_seq,
        final_model_state=final_ms,
    )


def trajectory_cost(cost_fn, traj: TrajectoryBatch, mode: str = "sum",
                    use_env_reward_as_cost: bool = False) -> jnp.ndarray:
    """Per-trajectory scalar cost (reference: abstract_controller.py:74-91).

    mode: 'sum' | 'best' (min over time) | 'final'.
    Returns [p].
    """
    if use_env_reward_as_cost:
        costs_path = -traj.rewards  # [h, p]
    else:
        costs_path = cost_fn(traj.observations, traj.actions, traj.next_observations)
    if mode == "sum":
        return jnp.sum(costs_path, axis=0)
    if mode == "best":
        return jnp.min(costs_path, axis=0)
    if mode == "final":
        return costs_path[-1]
    raise NotImplementedError(f"unknown cost_along_trajectory mode {mode!r}")


class ForwardModel:
    """Host-level forward-model interface (mirrors misc/base_types.py:62-118).

    Subclasses expose the functional core as ``predict_fn`` (traceable,
    unbatched — callers vmap) plus lifecycle hooks for the driver.

    LEARNED models additionally expose:
    - ``params``: the live weight pytree (replaced by ``train``), and
    - ``apply_fn(params, model_state, obs, action)``: the pure core with the
      weights as an explicit first argument.
    Controllers detect ``apply_fn`` and pass ``self.params`` into their
    jitted plan every call, so training takes effect without retracing and
    the weights stay unbatched (SPMD-replicated) under the population vmap.
    """

    supports_stochastic = False
    needs_training = False
    params = None          # learned models: live weight pytree
    apply_fn = None        # learned models: (params, ms, obs, act) -> (ms', obs', rew)
    version = 0            # bumped by train()/load(); params-generation counter

    def __init__(self, *, env, **kwargs):
        self.env = env

    # -- functional core ---------------------------------------------------
    def predict_fn(self, model_state, obs, action):
        """(model_state, obs, action) -> (next_model_state, next_obs, reward)."""
        raise NotImplementedError

    def init_model_state(self, observation, env_state=None):
        """Model state given a fresh observation (and env GT state if known)."""
        raise NotImplementedError

    # -- reference-API compatibility ----------------------------------------
    def got_actual_observation_and_env_state(self, *, observation, env_state=None,
                                             model_state=None):
        """Sync the model to reality at the start of each planning step
        (reference: models/gt_model.py:46-51)."""
        return self.init_model_state(observation, env_state)

    def reset(self, observation):
        return self.init_model_state(observation, None)

    def predict(self, *, observations, states, actions):
        ms, obs, rew = self.predict_fn(states, observations, actions)
        return obs, ms, rew

    def predict_n_steps(self, *, start_observations, start_states, actions):
        """Batched open-loop rollout; actions [p, h, d]."""
        return rollout_open_loop(self.predict_fn, start_states, start_observations, actions)

    def train(self, buffer):
        """No-op for untrainable models (gt_model has no train)."""
        return {}

    def save(self, path):
        return None

    def load(self, path):
        return None
