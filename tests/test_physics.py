"""Planar engine validation against analytic mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.envs.physics import planar
from icem_tpu.envs.physics.planar import PlanarModel


def pendulum_model(m=1.3, L=0.9, damping=0.0):
    """Single hinge pendulum: link extends along -y in body frame."""
    return PlanarModel(
        parent=(-1,),
        anchor=np.zeros((1, 2), np.float32),
        com=np.array([[0.0, -L / 2]], np.float32),
        mass=np.array([m], np.float32),
        inertia=np.array([planar.chain_link_inertia(m, L)], np.float32),
        free_root=False,
        damping=np.array([damping], np.float32),
        stiffness=np.zeros(1, np.float32),
        springref=np.zeros(1, np.float32),
        limit_lo=np.array([-np.inf], np.float32),
        limit_hi=np.array([np.inf], np.float32),
        gravity=9.81,
        dt=0.01,
        n_substeps=4,
    )


def double_pendulum_model(m1=1.0, m2=0.7, L1=1.0, L2=0.6):
    return PlanarModel(
        parent=(-1, 0),
        anchor=np.array([[0, 0], [0, -L1]], np.float32),
        com=np.array([[0, -L1 / 2], [0, -L2 / 2]], np.float32),
        mass=np.array([m1, m2], np.float32),
        inertia=np.array([planar.chain_link_inertia(m1, L1),
                          planar.chain_link_inertia(m2, L2)], np.float32),
        free_root=False,
        damping=np.zeros(2, np.float32),
        stiffness=np.zeros(2, np.float32),
        springref=np.zeros(2, np.float32),
        limit_lo=np.full(2, -np.inf, np.float32),
        limit_hi=np.full(2, np.inf, np.float32),
        gravity=9.81,
        dt=0.002,
        n_substeps=1,
    )


def test_single_pendulum_analytic_acceleration():
    m, L = 1.3, 0.9
    model = pendulum_model(m, L)
    lc = L / 2
    I_pivot = planar.chain_link_inertia(m, L) + m * lc**2  # parallel axis

    for theta in [0.0, 0.4, -1.2, 2.5]:
        q = jnp.array([theta])
        qd = jnp.array([0.7])
        M = planar.mass_matrix(model, q)
        np.testing.assert_allclose(float(M[0, 0]), I_pivot, rtol=1e-5)
        bias = planar.bias_forces(model, q, qd)
        # angle measured from -y axis: torque of gravity = -m g lc sin(theta)
        expected_grav_torque = m * 9.81 * lc * np.sin(theta)
        np.testing.assert_allclose(float(bias[0]), expected_grav_torque,
                                   rtol=1e-4, atol=1e-5)


def test_double_pendulum_mass_matrix_analytic():
    """Compound double pendulum M(q) against the textbook closed form."""
    m1, m2, L1, L2 = 1.0, 0.7, 1.0, 0.6
    model = double_pendulum_model(m1, m2, L1, L2)
    lc1, lc2 = L1 / 2, L2 / 2
    I1 = planar.chain_link_inertia(m1, L1)
    I2 = planar.chain_link_inertia(m2, L2)

    for q2 in [0.0, 0.5, -1.1, 2.0]:
        q = jnp.array([0.3, q2])
        M = np.asarray(planar.mass_matrix(model, q))
        c2 = np.cos(q2)
        M11 = I1 + I2 + m1 * lc1**2 + m2 * (L1**2 + lc2**2 + 2 * L1 * lc2 * c2)
        M12 = I2 + m2 * (lc2**2 + L1 * lc2 * c2)
        M22 = I2 + m2 * lc2**2
        np.testing.assert_allclose(M[0, 0], M11, rtol=1e-5)
        np.testing.assert_allclose(M[0, 1], M12, rtol=1e-5)
        np.testing.assert_allclose(M[1, 0], M12, rtol=1e-5)
        np.testing.assert_allclose(M[1, 1], M22, rtol=1e-5)


def test_double_pendulum_energy_conservation():
    model = double_pendulum_model()
    q = jnp.array([1.0, 0.5])
    qd = jnp.array([0.0, 0.0])

    def energy(q, qd):
        return float(planar.kinetic_energy(model, q, qd)
                     + planar.potential_energy(model, q))

    e0 = energy(q, qd)
    step = jax.jit(lambda q, qd: planar.step(model, q, qd, jnp.zeros(0)))
    for _ in range(500):  # 1 second at dt=0.002
        q, qd = step(q, qd)
    e1 = energy(q, qd)
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05, f"energy drift {e0} -> {e1}"


def test_free_fall():
    model = PlanarModel(
        parent=(-1,),
        anchor=np.zeros((1, 2), np.float32),
        com=np.zeros((1, 2), np.float32),
        mass=np.array([2.0], np.float32),
        inertia=np.array([0.1], np.float32),
        free_root=True,
        damping=np.zeros(3, np.float32),
        stiffness=np.zeros(3, np.float32),
        springref=np.zeros(3, np.float32),
        limit_lo=np.full(3, -np.inf, np.float32),
        limit_hi=np.full(3, np.inf, np.float32),
        dt=0.01, n_substeps=2,
    )
    q = jnp.array([0.0, 1.0, 0.3])
    qd = jnp.array([0.5, 0.0, 0.2])
    M = planar.mass_matrix(model, q)
    np.testing.assert_allclose(np.asarray(M), np.diag([2.0, 2.0, 0.1]), atol=1e-6)

    step = jax.jit(lambda q, qd: planar.step(model, q, qd, jnp.zeros(0)))
    for _ in range(50):  # 0.5 s
        q, qd = step(q, qd)
    # x moves ballistically, z falls ~ g t^2 / 2, rotation is uniform
    np.testing.assert_allclose(float(q[0]), 0.25, atol=0.01)
    np.testing.assert_allclose(float(qd[1]), -9.81 * 0.5, rtol=0.02)
    np.testing.assert_allclose(float(qd[2]), 0.2, atol=1e-4)


def test_ball_settles_on_ground():
    r = 0.1
    model = PlanarModel(
        parent=(-1,),
        anchor=np.zeros((1, 2), np.float32),
        com=np.zeros((1, 2), np.float32),
        mass=np.array([1.0], np.float32),
        inertia=np.array([0.004], np.float32),
        free_root=True,
        geom_body=(0,),
        geom_pos=np.zeros((1, 2), np.float32),
        geom_radius=np.array([r], np.float32),
        damping=np.zeros(3, np.float32),
        stiffness=np.zeros(3, np.float32),
        springref=np.zeros(3, np.float32),
        limit_lo=np.full(3, -np.inf, np.float32),
        limit_hi=np.full(3, np.inf, np.float32),
        dt=0.01, n_substeps=10,
    )
    q = jnp.array([0.0, 0.5, 0.0])
    qd = jnp.zeros(3)
    step = jax.jit(lambda q, qd: planar.step(model, q, qd, jnp.zeros(0)))
    for _ in range(200):  # 2 s: drop and settle
        q, qd = step(q, qd)
    z = float(q[1])
    # rests near the surface (small penalty penetration allowed)
    assert r - 0.01 < z <= r + 1e-3, f"ball resting height {z}, radius {r}"
    assert abs(float(qd[1])) < 0.05
    assert np.all(np.isfinite(np.asarray(q)))


def test_vmap_population_batching():
    model = double_pendulum_model()
    P = 64
    qs = jax.random.uniform(jax.random.key(0), (P, 2), minval=-1, maxval=1)
    qds = jnp.zeros((P, 2))
    stepped = jax.jit(jax.vmap(lambda q, qd: planar.step(model, q, qd, jnp.zeros(0))))
    q2, qd2 = stepped(qs, qds)
    assert q2.shape == (P, 2)
    assert np.all(np.isfinite(np.asarray(q2)))
