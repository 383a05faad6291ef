"""Golden-mechanics parity: plan_step vs a NumPy transliteration of the
reference iCEM update algebra on IDENTICAL noise draws.

Seed-level parity with the reference is impossible across PRNGs (numpy
MT19937 vs JAX threefry), so this pins the stronger invariant: given the
same sampled noise tensors, every decision the planner makes — population
decay, elite shift/keep sets, cost reuse without re-simulation, argmin
choice, top-k selection, alpha-momentum refit, mean shift, std reset —
must match the reference algorithm (icem/controllers/icem.py:106-211,
spec SURVEY.md §2.2.1) exactly.

Mechanism: monkeypatch ``sample_action_sequences`` with a deterministic
queue of pre-drawn arrays and run plan_step EAGERLY (unjitted), then replay
the same arrays through the NumPy reference loop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import icem_tpu.controllers.icem as ic


class _NoiseQueue:
    """Deterministic replacement for sample_action_sequences: returns
    pre-drawn standard-normal noise scaled/shifted/clipped the same way."""

    def __init__(self, rng, cfg):
        self.rng = rng
        self.cfg = cfg
        self.draws = []  # record of raw noise tensors, in call order

    def __call__(self, cfg, key, mean, std, num_traj):
        noise = self.rng.standard_normal((num_traj, cfg.horizon, cfg.action_dim))
        self.draws.append(noise.copy())
        return jnp.clip(jnp.asarray(noise, jnp.float32) * std + mean,
                        cfg.low, cfg.high)


def _linear_predict(ms, obs, act):
    """x' = 0.9 x + a, obs = x, reward unused: exactly integrable in numpy."""
    ns = 0.9 * ms + act
    return ns, ns, jnp.sum(ns) * 0.0


def _linear_cost(obs, act, next_obs):
    return jnp.sum(next_obs**2, axis=-1) + 0.1 * jnp.sum(act**2, axis=-1)


def _np_rollout_cost(x0, actions):
    """Numpy replica of the linear dynamics + cost summed over the horizon."""
    p, h, d = actions.shape
    x = np.broadcast_to(x0, (p, d)).copy()
    total = np.zeros(p)
    for t in range(h):
        x = 0.9 * x + actions[:, t]
        total += np.sum(x**2, axis=-1) + 0.1 * np.sum(actions[:, t] ** 2, axis=-1)
    return x, total


def _np_reference_icem(cfg, x0, mean, std, elite_actions, elite_costs,
                       have_elites, draws):
    """The reference get_action/update_distributions loop
    (icem.py:106-211), numpy, consuming the recorded noise draws."""
    draws = list(draws)
    E = int(cfg.num_elites * cfg.fraction_elites_reused)
    last_iter = cfg.opt_iterations - 1
    best_action_seq, best_cost = None, np.inf

    for i, n_i in enumerate(cfg.population_schedule):
        noise = draws.pop(0)
        fresh = np.clip(noise * std + mean, -1.0, 1.0)
        if cfg.use_mean_actions and i == last_iter:
            fresh[0] = mean

        if i == 0 and cfg.shift_elites_over_time and E > 0:
            shift_noise = draws.pop(0)
            shift_samples = np.clip(shift_noise * std + mean, -1.0, 1.0)
            last_step = shift_samples[:, -1:, :]
            shifted = np.concatenate([elite_actions[:E, 1:, :], last_step], axis=1)
            sim_actions = np.concatenate([fresh, shifted], axis=0)
            sim_valid = np.concatenate([np.ones(n_i, bool),
                                        np.full(E, bool(have_elites))])
        else:
            # i>0: fresh samples only (plan_step samples shift noise at i==0)
            sim_actions = fresh
            sim_valid = np.ones(n_i, bool)

        _, sim_costs = _np_rollout_cost(x0, sim_actions)
        sim_last = None  # not compared here

        if i > 0 and cfg.keep_previous_elites and E > 0:
            cand_actions = np.concatenate([sim_actions, elite_actions[:E]], axis=0)
            cand_costs = np.concatenate([sim_costs, elite_costs[:E]], axis=0)
            cand_valid = np.concatenate([sim_valid, np.ones(E, bool)])
        else:
            cand_actions, cand_costs, cand_valid = sim_actions, sim_costs, sim_valid

        cand_costs = np.where(cand_valid, cand_costs, np.inf)
        bi = int(np.argmin(cand_costs))
        best_action_seq, best_cost = cand_actions[bi], cand_costs[bi]

        order = np.argsort(cand_costs, kind="stable")
        eidx = order[: cfg.num_elites]
        elite_actions = cand_actions[eidx]
        elite_costs = cand_costs[eidx]
        new_mean = elite_actions.mean(axis=0)
        new_std = elite_actions.std(axis=0)
        mean = (1 - cfg.alpha) * new_mean + cfg.alpha * mean
        std = (1 - cfg.alpha) * new_std + cfg.alpha * std
        have_elites = True

    executed = best_action_seq[0]
    mean = np.concatenate([mean[1:], mean[-1:]], axis=0)
    return executed, best_cost, mean, elite_actions, elite_costs


def _np_reference_icem_multistep(cfg, draws):
    """Reference mechanics over TWO planning steps: step 2 exercises
    shift-elites (re-simulated) and keep-elites (cost REUSE, icem.py:143-145)."""
    d = cfg.action_dim
    mean = np.zeros((cfg.horizon, d))
    std = np.full((cfg.horizon, d), cfg.init_std)  # bounds are [-1, 1]
    elite_actions = np.zeros((cfg.num_elites, cfg.horizon, d))
    elite_costs = np.full(cfg.num_elites, np.inf)
    have = False
    out = []
    x0 = np.full(d, 1.5)

    for step in range(2):
        executed, cost, mean, elite_actions, elite_costs = _np_reference_icem(
            cfg, x0, mean, std, elite_actions, elite_costs, have, draws[step])
        std = np.full((cfg.horizon, d), cfg.init_std)
        have = True
        out.append((executed, cost, mean.copy(),
                    elite_actions.copy(), elite_costs.copy()))
    return out


@pytest.mark.parametrize("alpha,use_mean", [(0.1, True), (0.0, False)])
def test_plan_step_matches_numpy_reference_mechanics(monkeypatch, alpha, use_mean):
    cfg = ic.ICemConfig(
        horizon=6, num_simulated_trajectories=20, factor_decrease_num=1.3,
        opt_iterations=3, elites_size=6, alpha=alpha, init_std=0.5,
        use_mean_actions=use_mean, keep_previous_elites=True,
        shift_elites_over_time=True, fraction_elites_reused=0.5,
        noise_beta=1.0, action_dim=2, action_low=(-1.0, -1.0),
        action_high=(1.0, 1.0),
    )

    rng = np.random.default_rng(42)
    queue = _NoiseQueue(rng, cfg)
    monkeypatch.setattr(ic, "sample_action_sequences", queue)

    import jax
    pstate = ic.init_state(cfg, obs_dim=2, key=jax.random.key(0))
    x0 = jnp.full((2,), 1.5)

    # ---- two eager plan steps, recording the noise consumed per step ------
    results, per_step_draws = [], []
    for _ in range(2):
        n_before = len(queue.draws)
        res = ic.plan_step(cfg, _linear_predict, _linear_cost, pstate,
                           x0, x0)
        per_step_draws.append(queue.draws[n_before:])
        results.append(res)
        pstate = res.state

    # the draw pattern per step: [fresh_i0, shift, fresh_i1, fresh_i2]
    expected_sizes = [cfg.population_schedule[0], cfg.elites_kept,
                      *cfg.population_schedule[1:]]
    assert [d.shape[0] for d in per_step_draws[0]] == expected_sizes

    # ---- numpy reference on the same draws --------------------------------
    ref = _np_reference_icem_multistep(cfg, per_step_draws)

    for step in range(2):
        res, (r_exec, r_cost, r_mean, r_ea, r_ec) = results[step], ref[step]
        np.testing.assert_allclose(np.asarray(res.action), r_exec, atol=2e-5,
                                   err_msg=f"executed action, step {step}")
        np.testing.assert_allclose(float(res.expected_cost), r_cost, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(res.state.mean), r_mean, atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.state.elite_costs), r_ec,
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(res.state.elite_actions), r_ea,
                                   atol=2e-5)
        # std reset to init after every step (icem.py:175)
        np.testing.assert_allclose(np.asarray(res.state.std), 0.5, rtol=1e-6)
