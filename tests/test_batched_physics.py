"""Population-batched physics path (envs/physics/batched.py) equivalence.

The batched engine re-derives mass matrix / gravity / Coriolis / contact
Jacobians analytically in a VPU-native layout; it must agree with the
autodiff per-trajectory engine to f32 roundoff on the per-control-step
terms, and to integrator-amplified roundoff on full steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.envs import env_from_string
from icem_tpu.envs.physics import batched, planar

ENVS = [
    pytest.param("HalfCheetah",
                 {"exclude_current_positions_from_observation": True},
                 marks=pytest.mark.slow),
    ("Hopper", {"exclude_current_positions_from_observation": False}),
    ("PlanarAnt", {"exclude_current_positions_from_observation": False}),
    # hinge-root + fluid-drag coverage (round-2 fast-path widening)
    ("Reacher", {}),
    ("reacher", {"task_name": "easy"}),
    ("swimmer", {"task_name": "swimmer6"}),
]
ENV_IDS = [p.values[0] if hasattr(p, 'values') else p[0] for p in ENVS]


def _rows(X):
    P, d = X.shape
    return [X.T[i].reshape(8, P // 8) for i in range(d)]


def _unrows(rows, P):
    return np.stack([np.broadcast_to(np.asarray(r, np.float32), (8, P // 8)).reshape(P)
                     for r in rows], axis=1)


@pytest.mark.parametrize("name,kwargs", ENVS, ids=ENV_IDS)
def test_mass_and_bias_match_autodiff(name, kwargs):
    env = env_from_string(name, **kwargs)
    model = env.model
    n = model.ndof
    P = 64
    Q = jax.random.normal(jax.random.key(0), (P, n)) * 0.1
    QD = jax.random.normal(jax.random.key(1), (P, n)) * 0.3

    M_rows, bias_rows = batched.mass_bias_batched(model, _rows(Q), _rows(QD))
    M_hand = np.stack([_unrows(M_rows[i], P) for i in range(n)], axis=1)
    bias_hand = _unrows(bias_rows, P)

    M_ref = np.asarray(jax.vmap(lambda q: planar.mass_matrix(model, q))(Q))
    bias_ref = np.asarray(jax.vmap(
        lambda q, qd: planar.bias_forces(model, q, qd))(Q, QD))

    scale = max(1.0, np.abs(M_ref).max())
    np.testing.assert_allclose(M_hand, M_ref, atol=2e-5 * scale)
    bscale = max(1.0, np.abs(bias_ref).max())
    np.testing.assert_allclose(bias_hand, bias_ref, atol=2e-4 * bscale)


@pytest.mark.parametrize("name,kwargs", ENVS, ids=ENV_IDS)
def test_step_batched_matches_vmap(name, kwargs):
    env = env_from_string(name, **kwargs)
    model = env.model
    n = model.ndof
    P = 64
    Q = jax.random.normal(jax.random.key(2), (P, n)) * 0.05
    QD = jax.random.normal(jax.random.key(3), (P, n)) * 0.1
    C = jax.random.uniform(jax.random.key(4), (P, env.action_dim),
                           minval=-1, maxval=1)
    q1, qd1 = jax.jit(jax.vmap(lambda q, qd, c: planar.step(model, q, qd, c)))(Q, QD, C)
    Q2, QD2 = jax.jit(lambda a, b, c: batched.step_batched(model, a, b, c))(Q, QD, C)
    # stiff contacts amplify f32 roundoff over n_substeps; positions stay tight
    np.testing.assert_allclose(np.asarray(Q2), np.asarray(q1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(QD2), np.asarray(qd1), atol=8e-2)


@pytest.mark.slow
def test_env_step_batched_agrees_with_vmapped_step():
    env = env_from_string("HalfCheetah",
                          exclude_current_positions_from_observation=True)
    P = 64
    states = jax.random.normal(jax.random.key(5), (P, 18)) * 0.05
    actions = jax.random.uniform(jax.random.key(6), (P, 6), minval=-1, maxval=1)
    ns_b, obs_b, rew_b, done_b = jax.jit(env.step_batched)(states, actions)
    ns_v, obs_v, rew_v, done_v = jax.jit(jax.vmap(env.step))(states, actions)
    np.testing.assert_allclose(np.asarray(ns_b), np.asarray(ns_v), atol=5e-2)
    np.testing.assert_allclose(np.asarray(rew_b), np.asarray(rew_v), atol=5e-2)
    np.testing.assert_array_equal(np.asarray(done_b), np.asarray(done_v))


def test_step_batched_pads_odd_population():
    """Populations not divisible by 8 go through the padding path."""
    env = env_from_string("HalfCheetah",
                          exclude_current_positions_from_observation=True)
    env.batched_min_pop = 1  # force the fast path even at P=67
    P = 67
    states = jax.random.normal(jax.random.key(7), (P, 18)) * 0.05
    actions = jax.random.uniform(jax.random.key(8), (P, 6), minval=-1, maxval=1)
    ns, obs, rew, done = jax.jit(env.step_batched)(states, actions)
    assert ns.shape == (P, 18) and rew.shape == (P,)
    assert np.all(np.isfinite(np.asarray(ns)))


def test_swimmer_drag_matches_autodiff():
    """_drag_tau (batched fluid drag) vs planar.fluid_drag_forces."""
    env = env_from_string("swimmer", task_name="swimmer6")
    model = env.model
    n = model.ndof
    P = 64
    Q = jax.random.normal(jax.random.key(0), (P, n)) * 0.1
    QD = jax.random.normal(jax.random.key(1), (P, n)) * 0.3
    chains = batched._ancestors(model)
    tau_hand = _unrows(batched._drag_tau(model, _rows(Q), _rows(QD), chains), P)
    tau_ref = np.asarray(jax.vmap(
        lambda q, qd: planar.fluid_drag_forces(model, q, qd))(Q, QD))
    scale = max(1.0, np.abs(tau_ref).max())
    np.testing.assert_allclose(tau_hand, tau_ref, atol=2e-5 * scale)


def test_swimmer_takes_batched_fast_path():
    """Fluid-drag models now run the batched engine (round-1 gap)."""
    env = env_from_string("swimmer", task_name="swimmer6")
    assert batched.supports_batched(env.model)
    P = 64
    key = jax.random.key(9)
    states = jnp.stack([env.init_state(k) for k in jax.random.split(key, P)])
    actions = jax.random.uniform(jax.random.key(10), (P, env.action_dim),
                                 minval=-1, maxval=1)
    ns_b, obs_b, rew_b, _ = jax.jit(env.step_batched)(states, actions)
    ns_v, obs_v, rew_v, _ = jax.jit(jax.vmap(env.step))(states, actions)
    np.testing.assert_allclose(np.asarray(ns_b), np.asarray(ns_v), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rew_b), np.asarray(rew_v), atol=5e-3)


def test_reacher_rollout_batched_matches_scan():
    """Hinge-root whole-horizon fast path vs the generic per-step loop."""
    env = env_from_string("Reacher")
    P, h = 64, 5
    key = jax.random.key(11)
    states = jnp.stack([env.init_state(k) for k in jax.random.split(key, P)])
    actions = jax.random.uniform(jax.random.key(12), (P, h, env.action_dim),
                                 minval=-1, maxval=1)
    out = env.rollout_batched(states, actions)
    assert out is not None, "reacher did not take the batched rollout path"
    obs_seq, next_obs_seq, acts_tm, rewards, final_states = out

    def scan_ref(s0, acts):
        def body(s, a):
            s2, o2, r, _ = env.step(s, a)
            return s2, (o2, r)
        sf, (os_, rs_) = jax.lax.scan(body, s0, acts)
        return os_, rs_, sf
    os_ref, rs_ref, sf_ref = jax.vmap(scan_ref)(states, actions)
    np.testing.assert_allclose(np.asarray(next_obs_seq),
                               np.transpose(np.asarray(os_ref), (1, 0, 2)),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(rewards),
                               np.transpose(np.asarray(rs_ref)), atol=2e-3)
    np.testing.assert_allclose(np.asarray(final_states), np.asarray(sf_ref),
                               atol=2e-3)


@pytest.mark.slow
def test_whole_horizon_rollout_matches_stepwise():
    """rollout_batched (layout-persistent scan) vs per-step step_batched."""
    env = env_from_string("HalfCheetah",
                          exclude_current_positions_from_observation=True)
    P, H = 68, 6  # not a multiple of 8: exercises the padding path
    env.batched_min_pop = 1
    states = jax.random.normal(jax.random.key(0), (P, 18)) * 0.05
    actions = jax.random.uniform(jax.random.key(1), (P, H, 6), minval=-1, maxval=1)

    out = jax.jit(env.rollout_batched)(states, actions)
    assert out is not None
    obs_seq, next_obs_seq, acts_tm, rewards, final_states = out

    # stepwise reference using the same batched physics core
    s = states
    for t in range(H):
        s2, ob, rew, _ = env.step_batched(s, actions[:, t])
        np.testing.assert_allclose(np.asarray(next_obs_seq[t]), np.asarray(ob),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(rewards[t]), np.asarray(rew),
                                   atol=5e-3)
        s = s2
    np.testing.assert_allclose(np.asarray(final_states), np.asarray(s), atol=2e-3)
