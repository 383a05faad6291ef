"""Vanilla CEM baseline (MpcCemStd) — the algorithm iCEM improves on.

Re-implements the reference MpcCemStd (icem/controllers/mpc.py:142-327):

- TRUNCATED-normal sampling (vs iCEM's clip-at-bounds): either exact
  action-space truncation, or Levine-style bounds (std clamped to half the
  distance to the bounds, truncation at +-2 sigma) (mpc.py:188-198, 290-301)
- no colored noise, no population decay, no elite reuse
- options: execute_best_elite (else execute the mean's first action),
  shift_means (else zero-reset the mean each step), bounds_like_levine
  (mpc.py:234-248, 303-312)
- same top-k refit with alpha momentum as iCEM

The truncated-normal draw is on-device via inverse-CDF over a uniform sample
(erfinv), which is exact and fully vectorized — the reference calls
scipy.stats.truncnorm.rvs on the host.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.controllers.icem import _validate_sampler_params, top_k_ascending
from icem_tpu.models.base import rollout_open_loop, trajectory_cost


def truncated_normal(key, lower, upper, loc, scale, shape):
    """Sample N(loc, scale^2) truncated to [loc + lower*scale, loc + upper*scale].

    lower/upper are in standard-deviation units (scipy truncnorm convention,
    matching mpc.py:196-198). Exact inverse-CDF sampling.
    """
    a = jax.scipy.stats.norm.cdf(lower)
    b = jax.scipy.stats.norm.cdf(upper)
    u = jax.random.uniform(key, shape, minval=1e-6, maxval=1.0 - 1e-6)
    z = jax.scipy.stats.norm.ppf(a + u * (b - a))
    # numeric safety at extreme truncation
    z = jnp.clip(z, lower, upper)
    return loc + z * scale


@dataclass(frozen=True)
class CemStdConfig:
    horizon: int = 30
    num_simulated_trajectories: int = 40
    opt_iterations: int = 3
    cost_along_trajectory: str = "sum"
    use_env_reward_as_cost: bool = False
    alpha: float = 0.1
    elites_size: int = 10
    init_std: float = 0.5
    execute_best_elite: bool = True
    shift_means: bool = True
    bounds_like_levine: bool = False
    action_dim: int = 1
    action_low: tuple = (-1.0,)
    action_high: tuple = (1.0,)

    def __post_init__(self):
        if self.num_simulated_trajectories < 2:
            raise ValueError("At least two trajectories needed!")

    @property
    def num_elites(self) -> int:
        return max(2, min(self.elites_size, self.num_simulated_trajectories // 2))

    @property
    def model_evals_per_timestep(self) -> int:
        """mpc.py:167: N * opt_iter * horizon (no decay in vanilla CEM)."""
        return self.num_simulated_trajectories * self.opt_iterations * self.horizon

    @property
    def low(self):
        return jnp.asarray(self.action_low, jnp.float32)

    @property
    def high(self):
        return jnp.asarray(self.action_high, jnp.float32)


class CemStdState(NamedTuple):
    mean: jnp.ndarray  # [h, d]
    std: jnp.ndarray   # [h, d]
    key: jax.Array


class CemPlanResult(NamedTuple):
    action: jnp.ndarray
    state: "CemStdState"
    expected_cost: jnp.ndarray
    best_actions: jnp.ndarray
    best_last_obs: jnp.ndarray


def _init_mean(cfg: CemStdConfig):
    return jnp.zeros((cfg.horizon, cfg.action_dim)) + (cfg.high + cfg.low) / 2.0


def _init_std(cfg: CemStdConfig):
    return jnp.ones((cfg.horizon, cfg.action_dim)) * (cfg.high - cfg.low) / 2.0 * cfg.init_std


def _bounds(cfg: CemStdConfig, mean, std):
    """Truncation bounds + (possibly clamped) std (mpc.py:290-301)."""
    if cfg.bounds_like_levine:
        lb_dist, ub_dist = mean - cfg.low, cfg.high - mean
        std = jnp.maximum(1e-8, jnp.minimum(jnp.minimum(lb_dist / 2, ub_dist / 2), std))
        return jnp.float32(-2.0), jnp.float32(2.0), std
    lower = (cfg.low - mean) / (std + 1e-8)
    upper = (cfg.high - mean) / (std + 1e-8)
    return lower, upper, std


def init_state(cfg: CemStdConfig, key) -> CemStdState:
    return CemStdState(mean=_init_mean(cfg), std=_init_std(cfg), key=key)


def plan_step(cfg: CemStdConfig, predict_fn, cost_fn, pstate: CemStdState, obs,
              model_state, model_params=None) -> CemPlanResult:
    """One env step of vanilla-CEM planning (mpc.py:200-263).

    With ``model_params``, predict_fn takes (params, ms, obs, act) — see
    icem.plan_step for the learned-model threading rationale."""
    if model_params is not None:
        predict_fn = partial(predict_fn, model_params)
    mean, std, key = pstate
    N = cfg.num_simulated_trajectories

    best_actions = jnp.zeros((cfg.horizon, cfg.action_dim))
    best_cost = jnp.inf
    best_last_obs = jnp.zeros_like(obs)

    for _ in range(cfg.opt_iterations):
        key, k = jax.random.split(key)
        lower, upper, std = _bounds(cfg, mean, std)
        actions = truncated_normal(k, lower, upper, mean, std,
                                   (N, cfg.horizon, cfg.action_dim))

        traj = rollout_open_loop(predict_fn, model_state, obs, actions)
        costs = trajectory_cost(cost_fn, traj, cfg.cost_along_trajectory,
                                cfg.use_env_reward_as_cost)
        # non-finite costs rank last (see icem.top_k_ascending)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        best_idx = jnp.argmin(costs)
        best_actions = jnp.take(actions, best_idx, axis=0)
        best_cost = costs[best_idx]
        best_last_obs = jnp.take(traj.next_observations[-1], best_idx, axis=0)

        elite_idx = top_k_ascending(costs, cfg.num_elites)
        elites = jnp.take(actions, elite_idx, axis=0)
        mean = (1 - cfg.alpha) * jnp.mean(elites, axis=0) + cfg.alpha * mean
        std = (1 - cfg.alpha) * jnp.std(elites, axis=0) + cfg.alpha * std

    executed = best_actions[0] if cfg.execute_best_elite else mean[0]

    if cfg.shift_means:
        # compute_new_mean: zero for levine, preserve-last otherwise (mpc.py:265-269)
        last = jnp.zeros_like(mean[-1:]) if cfg.bounds_like_levine else mean[-1:]
        mean = jnp.concatenate([mean[1:], last], axis=0)
    else:
        mean = _init_mean(cfg) * 0.0  # zeros, matching mpc.py:245

    std = _init_std(cfg)
    return CemPlanResult(action=executed, state=CemStdState(mean, std, key),
                         expected_cost=best_cost, best_actions=best_actions,
                         best_last_obs=best_last_obs)


from icem_tpu.controllers.mpc_common import ModelConsistencyMixin


class MpcCemStd(ModelConsistencyMixin):
    """Host-side wrapper with the reference Controller API (mpc.py:142-327)."""

    needs_training = False
    needs_data = False
    has_state = True
    needs_forward_model = True

    def __init__(self, *, env, forward_model, action_sampler_params=None,
                 horizon=30, num_simulated_trajectories=40, factor_decrease_num=1,
                 cost_along_trajectory="sum", use_env_reward_as_cost=False,
                 verbose=False, do_visualize_plan=False, seed: Optional[int] = None,
                 sharded=False, **kwargs):
        if float(factor_decrease_num) != 1.0:
            # vanilla CEM has no population decay; a non-1 value here is a
            # config meant for mpc-icem that would otherwise degrade silently
            raise ValueError(
                f"factor_decrease_num={factor_decrease_num} has no effect on "
                f"mpc-cem-std (no population decay) — use mpc-icem, or drop "
                f"the key")
        asp = dict(action_sampler_params or {})
        _validate_sampler_params(asp, ("alpha", "elites_size", "opt_iterations",
                                       "init_std", "execute_best_elite",
                                       "shift_means", "bounds_like_levine"))
        self.env = env
        self.forward_model = forward_model
        self.cfg = CemStdConfig(
            horizon=horizon,
            num_simulated_trajectories=num_simulated_trajectories,
            cost_along_trajectory=cost_along_trajectory,
            use_env_reward_as_cost=use_env_reward_as_cost,
            action_dim=env.action_space.dim,
            action_low=tuple(np.asarray(env.action_space.low).ravel().tolist()),
            action_high=tuple(np.asarray(env.action_space.high).ravel().tolist()),
            alpha=asp.get("alpha", 0.1),
            elites_size=asp.get("elites_size", 10),
            opt_iterations=asp.get("opt_iterations", 3),
            init_std=asp.get("init_std", 0.5),
            execute_best_elite=asp.get("execute_best_elite", True),
            shift_means=asp.get("shift_means", True),
            bounds_like_levine=asp.get("bounds_like_levine", False),
        )
        self.verbose = verbose
        self._seed = seed
        self._pstate = None
        self._model_state = None
        self.was_reset = False
        self.last_expected_cost = None
        self._core_fn = getattr(forward_model, "apply_fn", None) \
            or forward_model.predict_fn
        self._has_params = getattr(forward_model, "apply_fn", None) is not None
        # config-selectable multi-chip planning (see MpcICem.__init__)
        from icem_tpu.parallel.plan import cem_plan_step_sharded, resolve_mesh
        self._mesh = resolve_mesh(
            sharded, getattr(forward_model, "num_parallel", 0) or 0)
        if self._mesh is not None:
            self._plan_impl = partial(cem_plan_step_sharded, self.cfg,
                                      self._core_fn, env.cost_fn, self._mesh)
        else:
            self._plan_impl = partial(plan_step, self.cfg, self._core_fn,
                                      env.cost_fn)
        self._plan = jax.jit(self._plan_impl)
        self._advance = jax.jit(self._core_fn)

    @property
    def model_evals_per_timestep(self):
        return self.cfg.model_evals_per_timestep

    def beginning_of_rollout(self, *, observation, state=None, mode="train"):
        from icem_tpu.runtime.seeding import Seeding

        key = jax.random.key(self._seed) if self._seed is not None \
            else Seeding.next_key("controller/cem-std")
        self._pstate = init_state(self.cfg, key)
        self._model_state = self.forward_model.got_actual_observation_and_env_state(
            observation=observation, env_state=state, model_state=None)
        self.was_reset = True

    def end_of_rollout(self, total_time, total_return, mode):
        pass

    def get_action(self, obs, state=None, mode="train"):
        if not self.was_reset:
            raise AttributeError("beginning_of_rollout() needs to be called before")
        obs = jnp.asarray(obs, jnp.float32)
        if self.verbose:
            self.check_model_consistency(state)
        self._model_state = self.forward_model.got_actual_observation_and_env_state(
            observation=obs, env_state=state, model_state=self._model_state)
        if self._has_params:
            result = self._plan(self._pstate, obs, self._model_state,
                                self.forward_model.params)
        else:
            result = self._plan(self._pstate, obs, self._model_state)
        self._pstate = result.state
        self.last_expected_cost = result.expected_cost
        if self._model_state is not None:
            if self._has_params:
                self._model_state, _, _ = self._advance(
                    self.forward_model.params, self._model_state, obs, result.action)
            else:
                self._model_state, _, _ = self._advance(
                    self._model_state, obs, result.action)
        return np.asarray(result.action)

    # -- functional interface for fused on-device episodes ------------------
    def init_plan_state(self, obs_dim: int, key) -> CemStdState:
        return init_state(self.cfg, key)

    def functional_plan(self):
        """See MpcICem.functional_plan: learned weights are the runtime
        ``model_params`` argument, not a closure capture."""
        plan_impl = self._plan_impl
        init_model_state = self.forward_model.init_model_state
        has_params = self._has_params

        def plan(pstate, obs, env_state, model_params=None):
            model_state = init_model_state(obs, env_state)
            res = plan_impl(pstate, obs, model_state,
                            model_params if has_params else None)
            return res.action, res.state

        return plan

    @property
    def live_model_params(self):
        return self.forward_model.params if self._has_params else None

    def train(self, buffer):
        return {}

    def save(self, path):
        """Planner-state serialization; see MpcICem.save (notably preserves
        the shift_means mid-episode mean, the resume-fidelity case the
        reference guarantees via pickled controller attrs, mpc.py:75-83)."""
        import pickle
        from dataclasses import asdict
        from icem_tpu.runtime.checkpoint import pack_pytree

        state = {
            "cfg": asdict(self.cfg),
            "was_reset": self.was_reset,
            "pstate": pack_pytree(self._pstate) if self._pstate is not None else None,
            "model_state": pack_pytree(self._model_state)
            if self._model_state is not None else None,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load(self, path):
        import os
        import pickle
        from dataclasses import asdict
        from icem_tpu.runtime.checkpoint import unpack_pytree

        if not os.path.exists(path):
            return
        with open(path, "rb") as f:
            state = pickle.load(f)
        if state.get("cfg") != asdict(self.cfg):
            print(f"{type(self).__name__}.load: checkpoint was written with a "
                  f"different controller config; restoring state anyway")
        self.was_reset = bool(state.get("was_reset", False))
        if state.get("pstate") is not None:
            self._pstate = unpack_pytree(state["pstate"])
        if state.get("model_state") is not None:
            self._model_state = unpack_pytree(state["model_state"])
