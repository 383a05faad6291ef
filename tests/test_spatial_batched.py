"""Batched spatial engine vs the autodiff engine (physics/spatial.py).

Mirrors tests/test_batched_physics.py: the hand-derived batched-scalar
formulation (envs/physics/spatial_batched.py) must reproduce the autodiff
Lagrangian engine — mass matrix, bias, contacts, energies, full control
steps — on the real 3D morphologies (Ant3D quadruped, Humanoid3D biped with
the recentred root chart and the energy valve) plus a hinge-root tree.

Everything is evaluated under jit: the autodiff reference in eager mode
dispatches ~1e5 scalar ops per mass matrix (128 s for ONE ant3d M on this
CPU vs 6 s to jit-compile-and-run the whole vmapped batch). The 23-dof
humanoid step compiles in ~2 min on CPU, so its step-level equivalence
tests carry the slow marker (the cheap M/bias/energy comparisons still run
in the smoke suite for all three morphologies).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.envs.ant3d import make_ant3d_model
from icem_tpu.envs.humanoid3d import make_humanoid3d_model
from icem_tpu.envs.physics import spatial, spatial_batched
from icem_tpu.envs.physics.spatial import SpatialModel


def _hinge_tree_model():
    """3-link hinge-root chain with skew axes (exercises free_root=False
    and non-axis-aligned Rodrigues entries)."""
    ax1 = np.array([0.6, 0.0, 0.8])
    ax2 = np.array([0.0, 1.0, 0.0])
    return SpatialModel(
        parent=(-1, 0, 1),
        anchor=np.array([[0.0, 0.0, 1.5], [0.4, 0.0, 0.0], [0.4, 0.1, 0.0]],
                        np.float32),
        axis=np.stack([ax1, ax2, ax1]).astype(np.float32),
        com=np.array([[0.2, 0.0, 0.0]] * 3, np.float32),
        mass=np.array([1.0, 0.7, 0.4], np.float32),
        inertia=np.array([[0.02, 0.03, 0.02]] * 3, np.float32),
        free_root=False,
        geom_body=(2,),
        geom_pos=np.array([[0.4, 0.0, 0.0]], np.float32),
        geom_radius=np.array([0.05], np.float32),
        actuator_dof=(0, 1, 2),
        gear=np.array([10.0, 8.0, 5.0], np.float32),
        damping=np.array([0.5, 0.3, 0.2], np.float32),
        stiffness=np.array([2.0, 1.0, 0.0], np.float32),
        springref=np.array([0.1, 0.0, 0.0], np.float32),
        limit_lo=np.array([-1.2, -np.inf, -2.0], np.float32),
        limit_hi=np.array([1.2, np.inf, 2.0], np.float32),
        dt=0.02,
        n_substeps=4,
    )


MODELS = {
    "ant3d": lambda: make_ant3d_model(),
    "humanoid3d": lambda: make_humanoid3d_model(chart_center_pitch=-np.pi / 4),
    "hinge_tree": _hinge_tree_model,
}


def _random_state(model, key, spread=0.5):
    kq, kqd = jax.random.split(key)
    n = model.ndof
    q = spread * jax.random.normal(kq, (n,))
    if model.free_root:
        q = q.at[2].add(0.8)          # keep the tree near (partial) contact
        q = q.at[4].multiply(0.3)     # stay away from the chart singularity
    qd = spread * jax.random.normal(kqd, (n,))
    return q, qd


def _rows(X):
    """[P, n] -> list of n [P] batched scalars (flat layout is fine: the
    row helpers only need a consistent [*B] shape)."""
    return [X[:, j] for j in range(X.shape[1])]


@pytest.mark.parametrize("name", sorted(MODELS))
def test_mass_bias_match_autodiff(name):
    model = MODELS[name]()
    P = 8
    keys = jax.random.split(jax.random.PRNGKey(0), P)
    qs, qds = jax.vmap(lambda k: _random_state(model, k))(keys)

    M_ref = jax.jit(jax.vmap(lambda q: spatial.mass_matrix(model, q)))(qs)
    b_ref = jax.jit(jax.vmap(
        lambda q, qd: spatial.bias_forces(model, q, qd)))(qs, qds)

    M_rows, bias = jax.jit(
        lambda Q, QD: spatial_batched.mass_bias_rows(model, _rows(Q), _rows(QD))
    )(qs, qds)
    n = model.ndof
    M_hand = np.stack([np.stack([np.broadcast_to(np.asarray(M_rows[i][j]), (P,))
                                 for j in range(n)], -1) for i in range(n)], -2)
    b_hand = np.stack([np.broadcast_to(np.asarray(bias[i]), (P,))
                       for i in range(n)], -1)

    scale = max(1.0, float(np.abs(np.asarray(M_ref)).max()))
    bscale = max(1.0, float(np.abs(np.asarray(b_ref)).max()))
    np.testing.assert_allclose(M_hand, np.asarray(M_ref), atol=3e-5 * scale)
    np.testing.assert_allclose(b_hand, np.asarray(b_ref), atol=3e-4 * bscale)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_contact_tau_matches_autodiff(name):
    model = MODELS[name]()
    P = 8
    keys = jax.random.split(jax.random.PRNGKey(1), P)
    qs, qds = jax.vmap(lambda k: _random_state(model, k))(keys)
    if model.free_root:
        qs = qs.at[:, 2].add(-0.6)    # force real penetration for some rows

    tau_ref = jax.jit(jax.vmap(
        lambda q, qd: spatial.contact_forces(model, q, qd)))(qs, qds)

    def hand(Q, QD):
        chains = spatial_batched.rot_chains(model)
        fk = spatial_batched.fk_rows(model, _rows(Q))
        return spatial_batched.contact_tau_rows(model, _rows(QD), fk, chains)

    tau = jax.jit(hand)(qs, qds)
    tau_hand = np.stack([np.broadcast_to(np.asarray(t), (P,)) for t in tau], -1)
    scale = max(1.0, float(np.abs(np.asarray(tau_ref)).max()))
    np.testing.assert_allclose(tau_hand, np.asarray(tau_ref), atol=3e-4 * scale)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_energies_match_autodiff(name):
    model = MODELS[name]()
    P = 8
    keys = jax.random.split(jax.random.PRNGKey(2), P)
    qs, qds = jax.vmap(lambda k: _random_state(model, k))(keys)

    ke_ref = jax.jit(jax.vmap(
        lambda q, qd: spatial.kinetic_energy(model, q, qd)))(qs, qds)
    se_ref = jax.jit(jax.vmap(
        lambda q, qd: spatial.stored_energy(model, q, qd)))(qs, qds)

    def hand(Q, QD):
        chains = spatial_batched.rot_chains(model)
        fk = spatial_batched.fk_rows(model, _rows(Q))
        ke = spatial_batched.kinetic_rows(model, _rows(QD), fk, chains)
        se = spatial_batched.stored_energy_rows(model, _rows(Q), _rows(QD),
                                                fk, chains)
        return ke, se

    ke, se = jax.jit(hand)(qs, qds)
    np.testing.assert_allclose(
        np.asarray(ke), np.asarray(ke_ref),
        atol=2e-4 * max(1.0, float(np.abs(np.asarray(ke_ref)).max())))
    np.testing.assert_allclose(
        np.asarray(se), np.asarray(se_ref),
        atol=2e-4 * max(1.0, float(np.abs(np.asarray(se_ref)).max())))


def _step_case(model, n_act, P=16):
    keys = jax.random.split(jax.random.PRNGKey(3), P)
    qs, qds = jax.vmap(lambda k: _random_state(model, k, spread=0.3))(keys)
    ctrl = jax.random.uniform(jax.random.PRNGKey(4), (P, n_act),
                              minval=-1.0, maxval=1.0)
    q_ref, qd_ref = jax.jit(jax.vmap(
        lambda q, qd, a: spatial.step(model, q, qd, a)))(qs, qds, ctrl)
    Q2, QD2 = jax.jit(
        lambda Q, QD, A: spatial_batched.step_batched(model, Q, QD, A))(
            qs, qds, ctrl)
    np.testing.assert_allclose(np.asarray(Q2), np.asarray(q_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(QD2), np.asarray(qd_ref), atol=8e-2)


@pytest.mark.parametrize("name", ["ant3d", "hinge_tree"])
def test_step_batched_matches_vmap(name):
    model = MODELS[name]()
    _step_case(model, len(model.actuator_dof))


@pytest.mark.slow
def test_step_batched_matches_vmap_humanoid():
    model = MODELS["humanoid3d"]()
    _step_case(model, len(model.actuator_dof))


@pytest.mark.slow
def test_valve_engages_identically():
    """On a violently energetic humanoid state the valve must fire (scale <1)
    and both engines must agree on the post-valve velocities."""
    model = make_humanoid3d_model(chart_center_pitch=-np.pi / 4)
    assert model.energy_valve
    n = model.ndof
    P = 8
    key = jax.random.PRNGKey(5)
    kq, kd, ka = jax.random.split(key, 3)
    qs = 0.2 * jax.random.normal(kq, (P, n))
    qs = qs.at[:, 2].set(0.25)                       # slammed into the ground
    qds = 8.0 * jax.random.normal(kd, (P, n))        # violent joint rates
    ctrl = jax.random.uniform(ka, (P, len(model.actuator_dof)),
                              minval=-1.0, maxval=1.0)

    q_ref, qd_ref = jax.jit(jax.vmap(
        lambda q, qd, a: spatial.step(model, q, qd, a)))(qs, qds, ctrl)
    Q2, QD2 = jax.jit(
        lambda Q, QD, A: spatial_batched.step_batched(model, Q, QD, A))(
            qs, qds, ctrl)
    np.testing.assert_allclose(np.asarray(Q2), np.asarray(q_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(QD2), np.asarray(qd_ref), atol=1e-1)


def test_ant3d_env_step_batched_agrees_with_vmapped_step():
    from icem_tpu.envs.ant3d import Ant3D
    env = Ant3D()
    P = 64
    keys = jax.random.split(jax.random.PRNGKey(7), P)
    states = jax.vmap(lambda k: env.init_state(k))(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(8), (P, 8),
                              minval=-1.0, maxval=1.0)
    ns_b, obs_b, rew_b, done_b = jax.jit(env.step_batched)(states, acts)
    ns_v, obs_v, rew_v, done_v = jax.jit(jax.vmap(env.step))(states, acts)
    np.testing.assert_allclose(np.asarray(ns_b), np.asarray(ns_v), atol=5e-2)
    np.testing.assert_allclose(np.asarray(rew_b), np.asarray(rew_v), atol=5e-2)
    np.testing.assert_allclose(np.asarray(done_b), np.asarray(done_v))


def test_ant3d_rollout_batched_matches_stepwise():
    from icem_tpu.envs.ant3d import Ant3D
    env = Ant3D()
    P, h = 64, 4
    keys = jax.random.split(jax.random.PRNGKey(9), P)
    states = jax.vmap(lambda k: env.init_state(k))(keys)
    acts = 0.5 * jax.random.normal(jax.random.PRNGKey(10), (P, h, 8))

    out = jax.jit(env.rollout_batched)(states, acts)
    assert out is not None
    obs_seq, next_obs_seq, acts_tm, rewards, final_states = out

    # stepwise reference via the batched step (same physics path numerics)
    step_b = jax.jit(env.step_batched)
    s = states
    rs, nos = [], []
    for t in range(h):
        s, o, r, _ = step_b(s, acts[:, t])
        rs.append(r)
        nos.append(o)
    np.testing.assert_allclose(np.asarray(next_obs_seq),
                               np.asarray(jnp.stack(nos)), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rewards),
                               np.asarray(jnp.stack(rs)), atol=2e-3)
    np.testing.assert_allclose(np.asarray(final_states), np.asarray(s),
                               atol=2e-3)


@pytest.mark.slow
def test_humanoid_standup_env_batched_agrees():
    from icem_tpu.envs.humanoid3d import HumanoidStandup3D
    env = HumanoidStandup3D()
    P = 64
    keys = jax.random.split(jax.random.PRNGKey(11), P)
    states = jax.vmap(lambda k: env.init_state(k))(keys)
    acts = jax.random.uniform(jax.random.PRNGKey(12), (P, 17),
                              minval=-1.0, maxval=1.0)
    ns_b, obs_b, rew_b, _ = jax.jit(env.step_batched)(states, acts)
    ns_v, obs_v, rew_v, _ = jax.jit(jax.vmap(env.step))(states, acts)
    np.testing.assert_allclose(np.asarray(ns_b), np.asarray(ns_v), atol=5e-2)
    np.testing.assert_allclose(np.asarray(rew_b), np.asarray(rew_v), atol=5e-2)


@pytest.mark.slow
def test_spatial_pallas_kernel_interpret_mode_matches_rows():
    """ops/spatial_rollout.py correctness WITHOUT a TPU: the Pallas
    interpreter executes the same kernel body (including the multi-chunk
    scratch carry across the sequential horizon-chunk grid axis) on CPU.
    The on-device twin lives in tests/test_pallas_rollout.py."""
    from icem_tpu.envs.ant3d import Ant3D
    from icem_tpu.ops import spatial_rollout as sr

    env = Ant3D()
    model = env.model
    nd, na = model.ndof, len(model.actuator_dof)
    H = 5
    # force 2-step horizon chunks so the scratch carry path is exercised
    budget0 = sr._VMEM_STREAM_BUDGET
    sr._VMEM_STREAM_BUDGET = sr._TILE_BYTES * (na + 2 * nd) * 2 * 2
    try:
        assert sr.pick_h_chunk(H, nd, na) < H
        P = sr.BLOCK
        base = env.init_state(jax.random.PRNGKey(0))[:nd]
        Q = base[None] + jax.random.normal(jax.random.PRNGKey(1), (P, nd)) * 0.01
        QD = jax.random.normal(jax.random.PRNGKey(2), (P, nd)) * 0.05
        A = jax.random.uniform(jax.random.PRNGKey(3), (P, H, na),
                               minval=-1.0, maxval=1.0)
        qs, qds = sr.rollout_spatial_pallas(model, Q, QD, A, interpret=True)

        def body(c, a):
            q, qd = c
            q2, qd2 = spatial_batched.step_batched(model, q, qd, a)
            return (q2, qd2), (q2, qd2)
        _, (qs_r, qds_r) = jax.lax.scan(body, (Q, QD), jnp.swapaxes(A, 0, 1))
        np.testing.assert_allclose(np.asarray(qs), np.asarray(qs_r), atol=1e-4)
        np.testing.assert_allclose(np.asarray(qds), np.asarray(qds_r), atol=1e-3)
    finally:
        sr._VMEM_STREAM_BUDGET = budget0
