"""Multi-chip iCEM: population sharded over a device mesh.

The reference's only scale-out mechanism is a pool of worker processes fed
population chunks over pipes (icem/models/gt_par_model.py:66-94; SURVEY.md
§2.6 P1). The TPU-native equivalent: ``shard_map`` over a
``jax.sharding.Mesh`` with a single "pop" axis —

- every device samples ITS OWN population shard (PRNG key folded with the
  mesh axis index, so shards are independent streams and the result is
  independent of the device count's layout),
- rollouts and per-trajectory costs are entirely local (zero communication
  during simulation — the embarrassingly parallel hot loop); the shifted
  elites of iteration 0 are sliced across the mesh and re-simulated inside
  each device's batch rather than replicated,
- elite selection is a LOCAL top-k followed by ONE ``all_gather`` of a
  packed (action-sequence ‖ cost ‖ final-obs) candidate buffer —
  K*(h*d+obs+1) floats per device per CEM iteration, the only collective in
  the program — then a replicated global top-k. The global argmin is
  necessarily inside some device's local top-k, so execute-best semantics
  are exact.
- elite memory / distribution refit stay replicated (tiny state).

Fresh-sample counts are rounded UP to a multiple of the mesh size, so the
sharded planner samples at least as many trajectories as the reference
schedule (never fewer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from icem_tpu.controllers.icem import (ICemConfig, ICemState, PlanResult,
                                        _refit, init_std, top_k_ascending)
from icem_tpu.controllers.icem import sample_action_sequences
from icem_tpu.models.base import rollout_open_loop, trajectory_cost


# shard_map's varying-axis typing (check_vma) cannot yet type the constant
# AD basis seeds jacfwd creates inside the physics engine: mass_matrix's
# identity tangents concatenate with varying fk tangents and jax 0.9.0 fails
# with "Primitive concatenate requires varying manual axes to match"; JAX's
# own error text prescribes check_vma=False as the workaround. Flip via
# ICEM_SHARD_CHECK_VMA=1 to probe newer jax releases —
# tests/test_parallel.py::test_check_vma_workaround_still_needed is the
# canary that fails (xpass) once upstream fixes the inference and this
# constant can be retired. The semantic risk the check would cover is
# instead guarded by the exact single-device emulation tests in
# tests/test_parallel.py (injected noise, bitwise decision equality).
import os as _os
CHECK_VMA = _os.environ.get("ICEM_SHARD_CHECK_VMA", "") == "1"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def make_pop_mesh(devices=None, axis_name: str = "pop") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis_name,))


def resolve_mesh(sharded, num_parallel: int = 0, axis_name: str = "pop"):
    """Decide the planning mesh from the config-level ``sharded`` option.

    - ``False``: None — single-device planning.
    - ``True``: mesh over all visible devices (capped by ``num_parallel``).
    - ``"auto"``: mesh iff more than one device is visible — the config-
      reachable replacement for the reference's process-count knob
      (gt_par_model.py:20-39, settings ``forward_model_params.num_parallel``).

    ``num_parallel`` > 0 (the ParallelGroundTruthModel hint) caps the mesh
    width for config parity with the reference's worker count.
    """
    if not sharded:
        return None
    devices = jax.devices()
    if num_parallel and num_parallel > 0:
        devices = devices[: max(1, min(int(num_parallel), len(devices)))]
    if sharded == "auto" and len(devices) <= 1:
        return None
    return make_pop_mesh(devices, axis_name)


def plan_step_sharded(cfg: ICemConfig, predict_fn, cost_fn, mesh: Mesh,
                      pstate: ICemState, obs, model_state, model_params=None,
                      axis_name: str = "pop"):
    """One iCEM planning step with the population sharded over ``mesh``.

    Same algorithm as controllers.icem.plan_step (see its docstring for the
    reference mapping); differs only in how the population is laid out.
    With ``model_params``, predict_fn takes (params, ms, obs, act) — the
    learned-model weights stay replicated across the mesh (see
    controllers.icem.plan_step). Returns a PlanResult (same contract as
    plan_step, so controllers can swap the two transparently).
    """
    if model_params is not None:
        predict_fn = partial(predict_fn, model_params)
    n_dev = mesh.devices.size
    K = cfg.num_elites
    E = cfg.elites_kept
    last_iter = cfg.opt_iterations - 1
    h, d = cfg.horizon, cfg.action_dim
    obs_dim = int(obs.shape[-1])

    mean, std = pstate.mean, pstate.std
    key = pstate.key
    have_elites = pstate.have_elites
    elite_actions, elite_costs = pstate.elite_actions, pstate.elite_costs
    elite_last_obs = pstate.elite_last_obs

    # shifted elites at i==0 are SHARDED across the mesh like the fresh
    # samples: each device simulates its e_local-row slice alongside its
    # fresh shard (one rollout kernel, no replicated re-simulation), with
    # padding rows masked invalid
    e_local = _cdiv(E, n_dev) if (cfg.shift_elites_over_time and E > 0) else 0

    def local_find(key_it, mean_, std_, obs_, model_state_, shifted_, valid_,
                   n_local, with_shifted, use_mean_row):
        """Runs on each device: sample local shard (+ this device's shifted-
        elite slice), simulate, local top-k, pack into ONE gather buffer.
        Executed under shard_map with replicated ins."""
        idx = jax.lax.axis_index(axis_name)
        k = jax.random.fold_in(key_it, idx)
        # replicated inputs must be explicitly marked varying before entering
        # the scan carry (shard_map varying-axis typing)
        to_varying = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
        obs_ = to_varying(obs_)
        mean_, std_ = to_varying(mean_), to_varying(std_)
        model_state_ = jax.tree_util.tree_map(to_varying, model_state_)
        fresh = sample_action_sequences(cfg, k, mean_, std_, n_local)
        if use_mean_row:
            # add-mean candidate on device 0 only (icem.py:84-89)
            row0 = jnp.where(idx == 0, mean_, fresh[0])
            fresh = fresh.at[0].set(row0)
        valid = jnp.ones(n_local, bool)
        if with_shifted:
            sl = jax.lax.dynamic_slice_in_dim(
                to_varying(shifted_), idx * e_local, e_local, axis=0)
            vl = jax.lax.dynamic_slice_in_dim(
                to_varying(valid_), idx * e_local, e_local, axis=0)
            fresh = jnp.concatenate([fresh, sl], axis=0)
            valid = jnp.concatenate([valid, vl])
        traj = rollout_open_loop(predict_fn, model_state_, obs_, fresh)
        costs = trajectory_cost(cost_fn, traj, cfg.cost_along_trajectory,
                                cfg.use_env_reward_as_cost)
        costs = jnp.where(valid & jnp.isfinite(costs), costs, jnp.inf)
        k_local = min(K, fresh.shape[0])
        order = top_k_ascending(costs, k_local)
        # pack (actions, cost, final obs) into one [k_local, h*d+1+obs] row
        # block -> a SINGLE all-gather per CEM iteration instead of three
        packed = jnp.concatenate(
            [jnp.take(fresh, order, axis=0).reshape(k_local, h * d),
             jnp.take(costs, order, axis=0)[:, None],
             jnp.take(traj.next_observations[-1], order, axis=0)], axis=1)
        return packed

    def sharded_find(n_local, with_shifted, use_mean_row):
        # local top-k comes out SHARDED over pop ([n_dev * k_local, ...]
        # logically); XLA inserts the single all-gather where the replicated
        # global top-k below consumes it
        fn = partial(local_find, n_local=n_local, with_shifted=with_shifted,
                     use_mean_row=use_mean_row)
        # CHECK_VMA=False workaround: see the module-level note
        return shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(axis_name),
            check_vma=CHECK_VMA,
        )

    best_action_seq = jnp.zeros((h, d))
    best_cost = jnp.inf
    best_last_obs = jnp.zeros_like(obs)
    shifted_pad = jnp.zeros((max(e_local, 1) * n_dev, h, d))
    valid_pad = jnp.zeros(max(e_local, 1) * n_dev, bool)

    for i, n_i in enumerate(cfg.population_schedule):
        key, k_it, k_shift = jax.random.split(key, 3)
        n_local = _cdiv(n_i, n_dev)
        use_mean_row = cfg.use_mean_actions and i == last_iter
        with_shifted = e_local > 0 and i == 0

        if with_shifted:
            # elites' actions shifted one step + fresh last action
            # (icem.py:91-104), padded to the mesh width
            last_step = sample_action_sequences(cfg, k_shift, mean, std, E)[:, -1:, :]
            shifted = jnp.concatenate([elite_actions[:E, 1:, :], last_step], axis=1)
            shifted_pad = jnp.concatenate(
                [shifted, jnp.zeros((e_local * n_dev - E, h, d))], axis=0)
            valid_pad = (jnp.arange(e_local * n_dev) < E) & have_elites

        packed = sharded_find(n_local, with_shifted, use_mean_row)(
            k_it, mean, std, obs, model_state, shifted_pad, valid_pad)
        g_a = packed[:, : h * d].reshape(-1, h, d)
        g_c = packed[:, h * d]
        g_o = packed[:, h * d + 1:]

        if i > 0 and cfg.keep_previous_elites and E > 0:
            # kept elites re-enter with their STORED costs (cost reuse,
            # icem.py:143-145) — replicated append, nothing re-simulated
            cand_a = jnp.concatenate([g_a, elite_actions[:E]], axis=0)
            cand_c = jnp.concatenate([g_c, elite_costs[:E]], axis=0)
            cand_o = jnp.concatenate([g_o, elite_last_obs[:E]], axis=0)
        else:
            cand_a, cand_c, cand_o = g_a, g_c, g_o
        # invalid rows arrived as +inf from local_find; stored elite costs
        # can be non-finite only if they were inf already
        cand_c = jnp.where(jnp.isfinite(cand_c), cand_c, jnp.inf)

        best_idx = jnp.argmin(cand_c)
        best_action_seq = jnp.take(cand_a, best_idx, axis=0)
        best_cost = cand_c[best_idx]
        best_last_obs = jnp.take(cand_o, best_idx, axis=0)

        # single source of truth for elite selection + momentum refit
        mean, std, elite_actions, elite_costs, elite_last_obs = _refit(
            cfg, mean, std, cand_a, cand_c, cand_o)
        have_elites = jnp.asarray(True)

    executed = best_action_seq[0]
    mean = jnp.concatenate([mean[1:], mean[-1:]], axis=0)
    std = init_std(cfg)

    new_state = ICemState(mean=mean, std=std, elite_actions=elite_actions,
                          elite_costs=elite_costs, elite_last_obs=elite_last_obs,
                          have_elites=have_elites, key=key)
    return PlanResult(action=executed, state=new_state, expected_cost=best_cost,
                      best_actions=best_action_seq, best_last_obs=best_last_obs)


def cem_plan_step_sharded(cfg, predict_fn, cost_fn, mesh: Mesh, pstate, obs,
                          model_state, model_params=None,
                          axis_name: str = "pop"):
    """Vanilla-CEM planning step (controllers.cem_std.plan_step) with the
    population sharded over ``mesh``.

    Same layout as plan_step_sharded: every device draws and simulates its
    own truncated-normal shard (fold_in streams), selects a local top-k, and
    one all_gather feeds the replicated refit. k_local = num_elites per
    device >= the global elite count, so elite selection and the executed
    best action are exact. Returns a CemPlanResult.
    """
    from icem_tpu.controllers.cem_std import (CemPlanResult, CemStdState,
                                              _bounds, _init_mean, _init_std,
                                              truncated_normal)

    if model_params is not None:
        predict_fn = partial(predict_fn, model_params)
    n_dev = mesh.devices.size
    K = cfg.num_elites
    h, d = cfg.horizon, cfg.action_dim
    mean, std, key = pstate
    n_local = _cdiv(cfg.num_simulated_trajectories, n_dev)

    def local_find(key_it, mean_, std_, obs_, model_state_):
        idx = jax.lax.axis_index(axis_name)
        k = jax.random.fold_in(key_it, idx)
        to_varying = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
        obs_ = to_varying(obs_)
        mean_, std_ = to_varying(mean_), to_varying(std_)
        model_state_ = jax.tree_util.tree_map(to_varying, model_state_)
        lower, upper, std_c = _bounds(cfg, mean_, std_)
        actions = truncated_normal(k, lower, upper, mean_, std_c,
                                   (n_local, h, d))
        traj = rollout_open_loop(predict_fn, model_state_, obs_, actions)
        costs = trajectory_cost(cost_fn, traj, cfg.cost_along_trajectory,
                                cfg.use_env_reward_as_cost)
        k_local = min(K, n_local)
        order = top_k_ascending(costs, k_local)
        # one packed gather per iteration (see plan_step_sharded)
        return jnp.concatenate(
            [jnp.take(actions, order, axis=0).reshape(k_local, h * d),
             jnp.take(costs, order, axis=0)[:, None],
             jnp.take(traj.next_observations[-1], order, axis=0)], axis=1)

    # CHECK_VMA=False workaround: see the module-level note
    sharded_find = shard_map(
        local_find, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(axis_name),
        check_vma=CHECK_VMA,
    )

    best_actions = jnp.zeros((h, d))
    best_cost = jnp.inf
    best_last_obs = jnp.zeros_like(obs)

    for _ in range(cfg.opt_iterations):
        key, k_it = jax.random.split(key)
        # std clamping (levine bounds) must update the replicated std exactly
        # as the single-device path does (mpc.py:290-301)
        _, _, std = _bounds(cfg, mean, std)
        packed = sharded_find(k_it, mean, std, obs, model_state)
        cand_a = packed[:, : h * d].reshape(-1, h, d)
        cand_c = packed[:, h * d]
        cand_o = packed[:, h * d + 1:]
        cand_c = jnp.where(jnp.isfinite(cand_c), cand_c, jnp.inf)

        best_idx = jnp.argmin(cand_c)
        best_actions = jnp.take(cand_a, best_idx, axis=0)
        best_cost = cand_c[best_idx]
        best_last_obs = jnp.take(cand_o, best_idx, axis=0)

        elite_idx = top_k_ascending(cand_c, K)
        elites = jnp.take(cand_a, elite_idx, axis=0)
        mean = (1 - cfg.alpha) * jnp.mean(elites, axis=0) + cfg.alpha * mean
        std = (1 - cfg.alpha) * jnp.std(elites, axis=0) + cfg.alpha * std

    executed = best_actions[0] if cfg.execute_best_elite else mean[0]
    if cfg.shift_means:
        last = jnp.zeros_like(mean[-1:]) if cfg.bounds_like_levine else mean[-1:]
        mean = jnp.concatenate([mean[1:], last], axis=0)
    else:
        mean = _init_mean(cfg) * 0.0
    std = _init_std(cfg)
    return CemPlanResult(action=executed, state=CemStdState(mean, std, key),
                         expected_cost=best_cost, best_actions=best_actions,
                         best_last_obs=best_last_obs)
