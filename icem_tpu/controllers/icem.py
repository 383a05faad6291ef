"""iCEM — improved Cross-Entropy Method planner, TPU-native.

Re-implements the full algorithm of the reference MpcICem
(icem/controllers/icem.py, spec'd in SURVEY.md §2.2.1) as a single jittable
``plan_step`` over an explicit planner-state pytree:

- colored-noise (1/f^beta) action sampling on device (icem.py:61-82)
- population decay: n_i = max(2*elites_size, int(n_{i-1} / gamma))
  (icem.py:126-127) — the schedule is static given the config, so the CEM
  loop is UNROLLED in Python with exact per-iteration shapes (no padding
  waste, one compiled program)
- shift-elites-over-time at iteration 0: elites' actions shifted one step
  with a freshly sampled last action, re-simulated (icem.py:91-104, 131-137)
- keep-previous-elites at i>0: the top fraction re-enters the candidate set
  with its already-computed cost — NOT re-simulated (icem.py:143-145)
- add mean as a candidate in the last iteration (icem.py:84-89)
- clip-at-bounds sampling (no truncated normal) (icem.py:79)
- top-k elite refit with alpha-momentum on mean and std (icem.py:194-211)
- execute the best seen action of the final iteration, then shift the mean
  one step and reset std (icem.py:163-175)

Design notes (TPU):
- the whole planning step — sampling FFTs, h-step rollouts over the
  population (vmapped), cost reduction, top-k, refit — compiles to ONE XLA
  program; there are no host round-trips mid-step, which is what makes the
  reference's real-time budget reachable at 1000x its population sizes.
- the first plan step of an episode has no elites yet; elite buffers are
  fixed-shape with a ``have_elites`` flag and masked with +inf cost, so one
  compiled program serves every step.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.models.base import rollout_open_loop, trajectory_cost
from icem_tpu.ops.colored_noise import sample_colored_action_noise


@dataclass(frozen=True)
class ICemConfig:
    """Static iCEM hyperparameters.

    Field names/defaults follow the reference's controller_params +
    action_sampler_params (icem.py:213-233, settings/defaults/i-cem-blitz.json).
    """

    horizon: int = 30
    num_simulated_trajectories: int = 40
    factor_decrease_num: float = 1.25
    cost_along_trajectory: str = "sum"
    use_env_reward_as_cost: bool = False
    # action_sampler_params
    alpha: float = 0.1
    elites_size: int = 10
    opt_iterations: int = 3
    init_std: float = 0.5
    use_mean_actions: bool = True
    keep_previous_elites: bool = True
    shift_elites_over_time: bool = True
    fraction_elites_reused: float = 0.3
    noise_beta: float = 1.0
    # action space
    action_dim: int = 1
    action_low: tuple = (-1.0,)
    action_high: tuple = (1.0,)
    # execute_best_elite is implicit in iCEM (always executes best, icem.py:163)
    # CEM-loop compilation strategy:
    # - "unrolled": one traced rollout per CEM iteration at the exact decayed
    #   population shape — no wasted simulation, but program size (and compile
    #   time) scales with opt_iterations x rollout size
    # - "scan": ONE lax.scan body at the iteration-0 population shape; decayed
    #   iterations mask their dead rows out of top-k/argmin/refit (SURVEY §7's
    #   prescribed padding). Simulates ~sum(n_0 - n_i) extra rows per step but
    #   the rollout is traced ONCE — the choice for compile-bound configs
    #   (long horizons, big obs, fused 1000-step episodes)
    cem_loop: str = "unrolled"

    def __post_init__(self):
        if self.num_simulated_trajectories < 2:
            raise ValueError("At least two trajectories needed!")  # mpc.py:30-31
        if self.cem_loop not in ("unrolled", "scan"):
            raise ValueError(f"cem_loop must be 'unrolled' or 'scan', "
                             f"got {self.cem_loop!r}")

    # ---- derived static quantities (reference: icem.py:235-247, 38-43) ----
    @property
    def num_elites(self) -> int:
        ne = min(self.elites_size, self.num_simulated_trajectories // 2)
        return max(ne, 2)

    @property
    def elites_kept(self) -> int:
        """Rows of elite memory reused per step (icem.py:99, :145)."""
        return int(self.num_elites * self.fraction_elites_reused)

    @property
    def population_schedule(self) -> tuple:
        """Fresh-sample count per CEM iteration (icem.py:124-127)."""
        sizes = []
        n = self.num_simulated_trajectories
        for i in range(self.opt_iterations):
            if i > 0:
                n = max(self.elites_size * 2, int(n / self.factor_decrease_num))
            sizes.append(n)
        return tuple(sizes)

    @property
    def model_evals_per_timestep(self) -> int:
        """Budget accounting (icem.py:38-43)."""
        return sum(
            max(self.elites_size * 2,
                int(self.num_simulated_trajectories / self.factor_decrease_num**i))
            for i in range(self.opt_iterations)
        ) * self.horizon

    @property
    def low(self):
        return jnp.asarray(self.action_low, jnp.float32)

    @property
    def high(self):
        return jnp.asarray(self.action_high, jnp.float32)


class ICemState(NamedTuple):
    """Device-resident planner state (replaces MpcICem attributes +
    RolloutBuffer elite storage, icem.py:31-36)."""

    mean: jnp.ndarray           # [h, d]
    std: jnp.ndarray            # [h, d]
    elite_actions: jnp.ndarray  # [K, h, d] sorted ascending by cost
    elite_costs: jnp.ndarray    # [K]
    elite_last_obs: jnp.ndarray  # [K, obs_dim] final predicted obs per elite
    have_elites: jnp.ndarray    # bool scalar — False until first update
    key: jax.Array              # PRNG key


class PlanResult(NamedTuple):
    action: jnp.ndarray          # [d] executed action (best trajectory's first)
    state: ICemState             # planner state after the step
    expected_cost: jnp.ndarray   # min cost of the final iteration (icem.py:177)
    best_actions: jnp.ndarray    # [h, d] full best plan (for visualization)
    best_last_obs: jnp.ndarray   # [obs_dim] best plan's final predicted obs


def init_mean(cfg: ICemConfig) -> jnp.ndarray:
    """Center of the action space (icem.py:48-52)."""
    return jnp.zeros((cfg.horizon, cfg.action_dim)) + (cfg.high + cfg.low) / 2.0


def init_std(cfg: ICemConfig) -> jnp.ndarray:
    """init_std * half action range (icem.py:54-59)."""
    return jnp.ones((cfg.horizon, cfg.action_dim)) * (cfg.high - cfg.low) / 2.0 * cfg.init_std


def init_state(cfg: ICemConfig, obs_dim: int, key) -> ICemState:
    """Fresh planner state at beginning_of_rollout (icem.py:31-36)."""
    K = cfg.num_elites
    return ICemState(
        mean=init_mean(cfg),
        std=init_std(cfg),
        elite_actions=jnp.zeros((K, cfg.horizon, cfg.action_dim)),
        elite_costs=jnp.full((K,), jnp.inf),
        elite_last_obs=jnp.zeros((K, obs_dim)),
        have_elites=jnp.asarray(False),
        key=key,
    )


def sample_action_sequences(cfg: ICemConfig, key, mean, std, num_traj: int):
    """Colored-noise (or white) sampling, scaled/shifted and clipped to
    bounds (icem.py:61-82)."""
    if cfg.noise_beta > 0:
        noise = sample_colored_action_noise(
            key, cfg.noise_beta, num_traj, cfg.horizon, cfg.action_dim
        )
    else:
        noise = jax.random.normal(key, (num_traj, cfg.horizon, cfg.action_dim))
    return jnp.clip(noise * std + mean, cfg.low, cfg.high)


def top_k_ascending(costs, k: int):
    """Indices of the k smallest costs, ascending, with stable tie-breaking.

    Two deliberate deviations from a naive ``lax.top_k(-costs, k)``:

    - non-finite costs (diverged learned-model rollouts, physics blow-ups
      during imagination) are sanitized to +inf so they rank LAST — XLA's
      top_k total order would otherwise rank NaN above every number and a
      single blown-up trajectory would become the #1 elite and poison the
      mean/std refit for the rest of the episode (np.argsort sorts NaN last,
      so this matches the reference's icem.py:199 behavior). This INCLUDES
      -inf: an exactly -inf cost is itself a divergence artifact (a reward
      overflow in imagination), not a "infinitely good" trajectory — no env
      cost function in this framework or the reference can legitimately
      produce it, and executing such a plan would chase a blown-up model
      state. Intentional deviation from the reference's argsort (which would
      rank -inf first);
    - ties break by LOWER index (stable), which sparse-cost envs (e.g. Fetch
      with ``sparse: true``) hit constantly with exactly-tied integer costs;
      a lexicographic (cost, index) sort pins the elite ordering to the
      candidate order, matching a stable argsort.

    ``lax.top_k`` documents "if two elements are equal, the lower-index
    element appears first" — ties in ``-costs`` are ties in ``costs``, so the
    selection IS the stable-argsort prefix, at top-k cost (far cheaper than a
    full sort of tens of thousands of candidates). Verified against
    ``np.argsort(kind='stable')`` including dense integer ties in
    tests/test_icem_planner.py.
    """
    costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
    _, idx = jax.lax.top_k(-costs, k)
    return idx


def _refit(cfg: ICemConfig, mean, std, cand_actions, cand_costs, cand_last_obs):
    """Elite selection + alpha-momentum distribution update (icem.py:194-211).

    Returns (mean, std, elite_actions, elite_costs, elite_last_obs).
    """
    K = cfg.num_elites
    elite_idx = top_k_ascending(cand_costs, K)
    elite_actions = jnp.take(cand_actions, elite_idx, axis=0)
    elite_costs = jnp.take(cand_costs, elite_idx, axis=0)
    elite_last_obs = jnp.take(cand_last_obs, elite_idx, axis=0)

    new_mean = jnp.mean(elite_actions, axis=0)
    new_std = jnp.std(elite_actions, axis=0)
    mean = (1.0 - cfg.alpha) * new_mean + cfg.alpha * mean
    std = (1.0 - cfg.alpha) * new_std + cfg.alpha * std
    return mean, std, elite_actions, elite_costs, elite_last_obs


def plan_step(cfg: ICemConfig, predict_fn, cost_fn, pstate: ICemState, obs,
              model_state, model_params=None) -> PlanResult:
    """One environment step of iCEM planning (icem.py:106-189), fully traceable.

    predict_fn: (model_state, obs, action) -> (model_state, obs, reward),
                unbatched (vmapped internally over the population). If
                ``model_params`` is given, predict_fn must instead take
                (model_params, model_state, obs, action) — learned models
                thread their weights through here as a runtime argument so a
                jitted plan always sees the LATEST training state (a closure
                capture would be frozen into the compiled program), and the
                weights stay unbatched under the population vmap.
    cost_fn:    batched (obs, act, next_obs) -> cost, reference contract.
    obs:        [obs_dim] current observation.
    model_state: forward-model state synced to reality (got_actual_...).
    """
    if model_params is not None:
        predict_fn = partial(predict_fn, model_params)
    if cfg.cem_loop == "scan":
        return _plan_step_scan(cfg, predict_fn, cost_fn, pstate, obs, model_state)
    mean, std = pstate.mean, pstate.std
    key = pstate.key
    have_elites = pstate.have_elites
    elite_actions, elite_costs = pstate.elite_actions, pstate.elite_costs
    elite_last_obs = pstate.elite_last_obs

    E = cfg.elites_kept
    last_iter = cfg.opt_iterations - 1
    best_action_seq = jnp.zeros((cfg.horizon, cfg.action_dim))
    best_cost = jnp.inf
    best_last_obs = jnp.zeros_like(obs)

    for i, n_i in enumerate(cfg.population_schedule):
        key, k_sample, k_shift = jax.random.split(key, 3)

        fresh = sample_action_sequences(cfg, k_sample, mean, std, n_i)
        if cfg.use_mean_actions and i == last_iter:
            fresh = fresh.at[0].set(mean)  # icem.py:84-89

        # -- assemble simulation set -------------------------------------
        if i == 0 and cfg.shift_elites_over_time and E > 0:
            # elites' actions shifted one step + fresh last action
            # (icem.py:91-104); masked out until elites exist
            last_step = sample_action_sequences(cfg, k_shift, mean, std, E)[:, -1:, :]
            shifted = jnp.concatenate([elite_actions[:E, 1:, :], last_step], axis=1)
            sim_actions = jnp.concatenate([fresh, shifted], axis=0)
            sim_valid = jnp.concatenate(
                [jnp.ones(n_i, bool), jnp.broadcast_to(have_elites, (E,))]
            )
        else:
            sim_actions = fresh
            sim_valid = jnp.ones(n_i, bool)

        # -- simulate (the hot block: scan over h, vmap over population) --
        traj = rollout_open_loop(predict_fn, model_state, obs, sim_actions)
        sim_costs = trajectory_cost(cost_fn, traj, cfg.cost_along_trajectory,
                                    cfg.use_env_reward_as_cost)
        sim_last_obs = traj.next_observations[-1]  # [p, obs_dim]

        # -- candidates: fresh(+shifted) plus kept elites (cost reuse) ----
        if i > 0 and cfg.keep_previous_elites and E > 0:
            cand_actions = jnp.concatenate([sim_actions, elite_actions[:E]], axis=0)
            cand_costs = jnp.concatenate([sim_costs, elite_costs[:E]], axis=0)
            cand_last_obs = jnp.concatenate([sim_last_obs, elite_last_obs[:E]], axis=0)
            cand_valid = jnp.concatenate([sim_valid, jnp.ones(E, bool)])
        else:
            cand_actions, cand_costs = sim_actions, sim_costs
            cand_last_obs, cand_valid = sim_last_obs, sim_valid

        # invalid rows AND non-finite costs rank last (argmin would otherwise
        # pick a NaN trajectory; see top_k_ascending)
        cand_costs = jnp.where(cand_valid & jnp.isfinite(cand_costs),
                               cand_costs, jnp.inf)

        best_idx = jnp.argmin(cand_costs)  # icem.py:149
        best_action_seq = jnp.take(cand_actions, best_idx, axis=0)
        best_cost = cand_costs[best_idx]
        best_last_obs = jnp.take(cand_last_obs, best_idx, axis=0)

        mean, std, elite_actions, elite_costs, elite_last_obs = _refit(
            cfg, mean, std, cand_actions, cand_costs, cand_last_obs
        )
        have_elites = jnp.asarray(True)

    # execute the best trajectory's FIRST action, not the mean (icem.py:163)
    executed = best_action_seq[0]

    # shift mean one step, preserving the last entry (icem.py:165-172, 191-192)
    mean = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
    # reset std (icem.py:175)
    std = init_std(cfg)

    new_state = ICemState(
        mean=mean, std=std,
        elite_actions=elite_actions, elite_costs=elite_costs,
        elite_last_obs=elite_last_obs, have_elites=have_elites, key=key,
    )
    return PlanResult(
        action=executed, state=new_state, expected_cost=best_cost,
        best_actions=best_action_seq, best_last_obs=best_last_obs,
    )


def _plan_step_scan(cfg: ICemConfig, predict_fn, cost_fn, pstate: ICemState,
                    obs, model_state) -> PlanResult:
    """``plan_step`` with the CEM loop as ONE ``lax.scan`` body at a single
    padded population shape (``cfg.cem_loop == "scan"``).

    Algorithmically identical to the unrolled loop — decay (icem.py:126-127)
    becomes a per-iteration validity mask instead of a smaller array:

    - every iteration samples n_0 fresh rows; rows >= n_i are INVALID
      (masked to +inf before argmin/top-k, so they can never become the
      executed best or an elite — n_i >= 2*elites_size >= num_elites
      guarantees enough valid rows),
    - the E tail rows hold the shifted elites at i==0 (re-simulated, as the
      reference does, icem.py:131-137) and the KEPT elites at i>0; kept
      elites' candidate costs are overwritten with their stored elite costs,
      preserving the reference's cost-reuse semantics (icem.py:143-145) even
      though the rows also pass through the (deterministic-model) simulator
      as padding.

    The per-iteration PRNG draws differ from the unrolled path (fixed-shape
    sampling), so the two modes are statistically equivalent planners, not
    bit-identical ones.
    """
    E = cfg.elites_kept
    I = cfg.opt_iterations
    schedule = cfg.population_schedule
    n0 = schedule[0]
    use_tail = E > 0 and (cfg.shift_elites_over_time or cfg.keep_previous_elites)

    # per-iteration control inputs (host constants -> scan xs)
    n_valid = jnp.asarray(schedule, jnp.int32)
    is_first = jnp.arange(I) == 0
    is_last = jnp.arange(I) == I - 1

    fresh_arange = jnp.arange(n0)

    def cem_iter(carry, xs):
        mean, std, e_a, e_c, e_o, have, key = carry
        n_i, first, last = xs
        key, k_sample, k_shift = jax.random.split(key, 3)

        fresh = sample_action_sequences(cfg, k_sample, mean, std, n0)
        if cfg.use_mean_actions:
            row0 = jnp.where(last, mean, fresh[0])  # icem.py:84-89
            fresh = fresh.at[0].set(row0)
        fresh_valid = fresh_arange < n_i

        if use_tail:
            # tail rows: shifted elites (i==0) / kept elites (i>0)
            last_step = sample_action_sequences(cfg, k_shift, mean, std, E)[:, -1:, :]
            shifted = jnp.concatenate([e_a[:E, 1:, :], last_step], axis=1)
            tail_actions = jnp.where(first, shifted, e_a[:E])
            sim_actions = jnp.concatenate([fresh, tail_actions], axis=0)
        else:
            sim_actions = fresh

        traj = rollout_open_loop(predict_fn, model_state, obs, sim_actions)
        sim_costs = trajectory_cost(cost_fn, traj, cfg.cost_along_trajectory,
                                    cfg.use_env_reward_as_cost)
        sim_last_obs = traj.next_observations[-1]

        if use_tail:
            # cost reuse at i>0: stored elite costs, not the re-simulated ones
            tail_c = jnp.where(first, sim_costs[n0:], e_c[:E])
            tail_o = jnp.where(first, sim_last_obs[n0:], e_o[:E])
            cand_costs = jnp.concatenate([sim_costs[:n0], tail_c])
            cand_last_obs = jnp.concatenate([sim_last_obs[:n0], tail_o])
            # which mechanism feeds the tail is a static config property; its
            # validity additionally requires elites to exist (i==0 of the
            # first-ever plan step has none)
            tail_on = jnp.where(first, cfg.shift_elites_over_time,
                                cfg.keep_previous_elites)
            tail_valid = jnp.broadcast_to(tail_on & have, (E,))
            cand_valid = jnp.concatenate([fresh_valid, tail_valid])
        else:
            cand_costs, cand_last_obs = sim_costs, sim_last_obs
            cand_valid = fresh_valid
        cand_actions = sim_actions

        cand_costs = jnp.where(cand_valid & jnp.isfinite(cand_costs),
                               cand_costs, jnp.inf)

        best_idx = jnp.argmin(cand_costs)
        mean, std, e_a, e_c, e_o = _refit(
            cfg, mean, std, cand_actions, cand_costs, cand_last_obs)
        have = jnp.asarray(True)
        ys = (jnp.take(cand_actions, best_idx, axis=0), cand_costs[best_idx],
              jnp.take(cand_last_obs, best_idx, axis=0))
        return (mean, std, e_a, e_c, e_o, have, key), ys

    carry0 = (pstate.mean, pstate.std, pstate.elite_actions, pstate.elite_costs,
              pstate.elite_last_obs, pstate.have_elites, pstate.key)
    (mean, std, e_a, e_c, e_o, have, key), (best_a, best_c, best_o) = \
        jax.lax.scan(cem_iter, carry0, (n_valid, is_first, is_last))

    # execute the FINAL iteration's best (icem.py:163), shift mean, reset std
    executed = best_a[-1][0]
    mean = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
    std = init_std(cfg)

    new_state = ICemState(mean=mean, std=std, elite_actions=e_a, elite_costs=e_c,
                          elite_last_obs=e_o, have_elites=have, key=key)
    return PlanResult(action=executed, state=new_state, expected_cost=best_c[-1],
                      best_actions=best_a[-1], best_last_obs=best_o[-1])


_ICEM_SAMPLER_KEYS = (
    "alpha", "elites_size", "opt_iterations", "init_std", "use_mean_actions",
    "keep_previous_elites", "shift_elites_over_time", "fraction_elites_reused",
    "noise_beta",
)


def _validate_sampler_params(asp: dict, allowed: tuple):
    """Reject unknown action_sampler_params keys loudly: the reference's
    keyword-only parser raises TypeError on typos (icem.py:213-233); silently
    running defaults instead would corrupt experiments."""
    unknown = set(asp) - set(allowed)
    if unknown:
        raise TypeError(
            f"unknown action_sampler_params {sorted(unknown)}; valid: {sorted(allowed)}")


from icem_tpu.controllers.mpc_common import ModelConsistencyMixin


class MpcICem(ModelConsistencyMixin):
    """Host-side controller wrapper with the reference Controller API
    (get_action / beginning_of_rollout / end_of_rollout; base_types.py:42-59,
    abstract_controller.py:43-58). Holds the jitted plan_step + state."""

    needs_training = False
    needs_data = False
    has_state = True
    needs_forward_model = True

    def __init__(self, *, env, forward_model, action_sampler_params=None,
                 horizon=30, num_simulated_trajectories=40, factor_decrease_num=1.25,
                 cost_along_trajectory="sum", use_env_reward_as_cost=False,
                 verbose=False, do_visualize_plan=False, seed: Optional[int] = None,
                 sharded=False, cem_loop="auto", **kwargs):
        asp = dict(action_sampler_params or {})
        _validate_sampler_params(asp, _ICEM_SAMPLER_KEYS)
        if cem_loop == "auto":
            # spatial (3D) envs have a large per-step program: unrolling the
            # CEM iterations multiplies it by opt_iterations, which is most
            # of the 3D compile tax (r4: 544 s cold). The single-shape
            # scanned loop traces the rollout body once; planar envs keep
            # the unrolled loop, whose shrinking populations do less work.
            from icem_tpu.envs.spatial_base import SpatialEnv
            cem_loop = "scan" if isinstance(env, SpatialEnv) else "unrolled"
        self.env = env
        self.forward_model = forward_model
        self.cfg = ICemConfig(
            horizon=horizon,
            num_simulated_trajectories=num_simulated_trajectories,
            factor_decrease_num=factor_decrease_num,
            cost_along_trajectory=cost_along_trajectory,
            use_env_reward_as_cost=use_env_reward_as_cost,
            cem_loop=cem_loop,
            action_dim=env.action_space.dim,
            action_low=tuple(np.asarray(env.action_space.low).ravel().tolist()),
            action_high=tuple(np.asarray(env.action_space.high).ravel().tolist()),
            **{k: asp[k] for k in _ICEM_SAMPLER_KEYS if k in asp},
        )
        self.verbose = verbose
        self.do_visualize_plan = do_visualize_plan
        self._seed = seed
        self._pstate: Optional[ICemState] = None
        self._model_state = None
        self.was_reset = False
        self.last_expected_cost = None
        self._replay = None

        # learned models expose (params, ms, obs, act) as apply_fn + a live
        # .params attribute; params enter the jitted plan as a runtime arg so
        # retraining takes effect without retracing (see plan_step docstring)
        self._core_fn = getattr(forward_model, "apply_fn", None) \
            or forward_model.predict_fn
        self._has_params = getattr(forward_model, "apply_fn", None) is not None
        # multi-chip planning is config-selectable (controller_params.sharded:
        # false | true | "auto") — the TPU equivalent of the reference's
        # ParallelGroundTruthModel worker count (gt_par_model.py:20-39), whose
        # num_parallel caps the mesh width for config parity
        from icem_tpu.parallel.plan import plan_step_sharded, resolve_mesh
        self._mesh = resolve_mesh(
            sharded, getattr(forward_model, "num_parallel", 0) or 0)
        if self._mesh is not None:
            if self.cfg.cem_loop == "scan":
                # the sharded planner has its own loop structure; its compile
                # cost is bounded by the local shard, so run it unrolled
                print("MpcICem: cem_loop='scan' is single-device only; the "
                      "sharded planner runs its unrolled loop")
            self._plan_impl = partial(plan_step_sharded, self.cfg,
                                      self._core_fn, env.cost_fn, self._mesh)
        else:
            self._plan_impl = partial(plan_step, self.cfg, self._core_fn,
                                      env.cost_fn)
        self._plan = jax.jit(self._plan_impl)
        # jitted one-step model advance for stateful models (icem.py:186-188);
        # eager execution here would dispatch hundreds of tiny kernels per step
        self._advance = jax.jit(self._core_fn)

    @property
    def model_evals_per_timestep(self):
        return self.cfg.model_evals_per_timestep

    def beginning_of_rollout(self, *, observation, state=None, mode="train"):
        from icem_tpu.runtime.seeding import Seeding

        key = jax.random.key(self._seed) if self._seed is not None \
            else Seeding.next_key("controller/icem")
        self._pstate = init_state(self.cfg, int(np.asarray(observation).shape[-1]), key)
        self._model_state = self.forward_model.got_actual_observation_and_env_state(
            observation=observation, env_state=state, model_state=None)
        self.was_reset = True
        if self.verbose:
            print(f"iCEM using {self.cfg.model_evals_per_timestep} evaluations per step "
                  f"and {self.cfg.model_evals_per_timestep / self.cfg.horizon} "
                  f"trajectories per step")

    def end_of_rollout(self, total_time, total_return, mode):
        pass

    def visualize_plan(self, obs, env_state, result: PlanResult):
        """Plan-replay divergence report (abstract_controller.py:93-128).

        Modes (``do_visualize_plan``):
        - True / "last": replay the chosen plan in the real env and report
          when the FINAL observation misses the model's prediction by > 0.01
          (abstract_controller.py mode "last"). Returns that norm.
        - "all": replay the whole plan through BOTH the real env and the
          forward model, print the FIRST step where they diverge > 0.01 with
          both observation vectors (abstract_controller.py:118-124). Returns
          the max per-step divergence.
        - "record": "all" + write the env replay as a GIF through
          VideoRecorder (the TPU-native stand-in for the reference's live
          per-step env.render(), abstract_controller.py:125-126).
        """
        if env_state is None:
            return None
        mode = self.do_visualize_plan or "last"
        if mode is True:
            mode = "last"

        if self._replay is None:
            env_step = self.env.step
            predict = self._core_fn
            has_params = self._has_params

            def replay(s0, ms0, ob0, actions, params=None):
                p = partial(predict, params) if has_params else predict

                def env_body(s, a):
                    s2, o2, _, _ = env_step(s, a)
                    return s2, (s2, o2)

                _, (env_states, env_obs) = jax.lax.scan(env_body, s0, actions)

                def model_body(carry, a):
                    ms, ob = carry
                    ms2, ob2, _ = p(ms, ob, a)
                    return (ms2, ob2), ob2

                _, model_obs = jax.lax.scan(model_body, (ms0, ob0), actions)
                return env_states, env_obs, model_obs

            self._replay = jax.jit(replay)

        params = self.forward_model.params if self._has_params else None
        if self._has_params:
            env_states, env_obs, model_obs = self._replay(
                env_state, self._model_state, obs, result.best_actions, params)
        else:
            env_states, env_obs, model_obs = self._replay(
                env_state, self._model_state, obs, result.best_actions)

        if mode == "last":
            div = float(jnp.linalg.norm(env_obs[-1] - result.best_last_obs))
            if div > 0.01:
                print(f"plan divergence at horizon end: |env - model| = {div:.5f}")
            return div

        env_obs = np.asarray(env_obs)
        model_obs = np.asarray(model_obs)
        per_step = np.linalg.norm(env_obs - model_obs, axis=-1)
        bad = np.nonzero(per_step > 0.01)[0]
        if bad.size:
            i = int(bad[0])
            # the reference's exact report shape (abstract_controller.py:120-124)
            print(f"simulation for visualization does not match mental model at {i}: ")
            print("orig: ", model_obs[i])
            print("simu: ", env_obs[i])

        if mode == "record" and hasattr(self.env, "render_frame"):
            from icem_tpu.runtime.video import VideoRecorder
            self._plan_video_counter = getattr(self, "_plan_video_counter", 0) + 1
            rec = VideoRecorder(getattr(self, "plan_video_dir", "videos"),
                                f"plan_{self._plan_video_counter:04d}",
                                fps=self.env.get_fps())
            states = [jax.tree_util.tree_map(lambda x: x[t], env_states)
                      for t in range(len(env_obs))]
            for s in states:
                frame = self.env.render_frame(s)
                if frame is not None:
                    rec.append(frame)
            path = rec.close()
            if path:
                print(f"recorded plan replay: {path}")
        return float(per_step.max()) if len(per_step) else 0.0

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
        if self.do_visualize_plan:
            self.visualize_plan(obs, state, result)
        # advance stateful models by the executed action (icem.py:186-188)
        if self._model_state is not None:
            if self._has_params:
                self._model_state, _, _ = self._advance(
                    self.forward_model.params, self._model_state, obs, result.action)
            else:
                self._model_state, _, _ = self._advance(
                    self._model_state, obs, result.action)
        return np.asarray(result.action)

    # -- functional interface for fused on-device episodes ------------------
    def init_plan_state(self, obs_dim: int, key) -> ICemState:
        return init_state(self.cfg, int(obs_dim), key)

    def functional_plan(self):
        """(pstate, obs, env_state, model_params=None) -> (action, pstate'),
        fully traceable — lets the episode loop fuse planner + env into one
        scan (mesh-aware: a sharded controller fuses sharded episodes, the
        shard_map composes under the episode vmap). Learned-model weights
        enter as the runtime ``model_params`` argument, so ONE compiled fused
        episode serves every training iteration (closure capture would bake
        the weights in as constants and force a re-compile per train())."""
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
        """Current learned-model weights to feed ``functional_plan`` (None
        for ground-truth models)."""
        return self.forward_model.params if self._has_params else None

    def train(self, buffer):
        return {}

    def save(self, path):
        """Serialize the live planner state (reference controllers pickle
        their attrs, mpc.py:75-83 / initialization.py:142-162) so a resumed
        run reproduces the NEXT action exactly: distribution mean/std, elite
        memory, PRNG key, and the synced model state."""
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
        saved_cfg = state.get("cfg") or {}
        cfg = asdict(self.cfg)
        # fields that determine pstate array shapes: restoring across a
        # change here would hand the jitted plan a shape-mismatched pytree
        # and crash later with an opaque XLA error far from the cause
        shape_fields = ("horizon", "action_dim", "elites_size",
                        "num_simulated_trajectories", "fraction_elites_reused")
        shape_mismatch = any(saved_cfg.get(f) != cfg[f] for f in shape_fields)
        if saved_cfg != cfg:
            if shape_mismatch:
                print(f"{type(self).__name__}.load: checkpoint planner shapes "
                      f"differ ({ {f: (saved_cfg.get(f), cfg[f]) for f in shape_fields if saved_cfg.get(f) != cfg[f]} }); "
                      f"keeping fresh planner state")
            else:
                print(f"{type(self).__name__}.load: checkpoint was written with a "
                      f"different controller config; restoring state anyway")
        self.was_reset = bool(state.get("was_reset", False))
        if state.get("pstate") is not None and not shape_mismatch:
            self._pstate = unpack_pytree(state["pstate"])
        if state.get("model_state") is not None:
            self._model_state = unpack_pytree(state["model_state"])
