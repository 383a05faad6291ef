"""Spatial (3D) engine correctness (envs/physics/spatial.py).

The strongest check embeds a planar mechanism in 3D: with every hinge axis
at (0, -1, 0), anchors/COMs lifted (x, h) -> (x, 0, h) and the root pitch
equal to minus the planar root angle, the spatial engine must integrate the
SAME trajectory as the planar engine (the two implementations share no
dynamics code beyond the Cholesky helpers). Plus energy-behavior and
free-fall sanity checks that need no oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.envs.ant import make_ant_model
from icem_tpu.envs.physics import planar, spatial
from icem_tpu.envs.physics.spatial import SpatialModel


def _lift_planar(pm: planar.PlanarModel) -> SpatialModel:
    """Embed a free-root PlanarModel into 3D (xz-plane, hinge axes -y)."""
    B = pm.nbody
    nd_p, nd_s = pm.ndof, 6 + B - 1
    lift_pts = lambda a: np.stack(
        [a[:, 0], np.zeros(len(a)), a[:, 1]], axis=1).astype(np.float32)

    # planar dof k -> spatial dof: x->0, h(z)->2, rot->4 (pitch), joints shift
    dof_map = [0, 2, 4] + list(range(6, 6 + B - 1))

    def lift_dof_arr(arr, fill):
        out = np.full(nd_s, fill, np.float32)
        out[dof_map] = arr
        return out

    return SpatialModel(
        parent=pm.parent,
        anchor=lift_pts(np.asarray(pm.anchor)),
        axis=np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (B, 1)),
        com=lift_pts(np.asarray(pm.com)),
        mass=np.asarray(pm.mass),
        inertia=np.tile(np.asarray(pm.inertia)[:, None], (1, 3)),
        free_root=True,
        geom_body=pm.geom_body,
        geom_pos=lift_pts(np.asarray(pm.geom_pos)),
        geom_radius=np.asarray(pm.geom_radius),
        actuator_dof=tuple(dof_map[d] for d in pm.actuator_dof),
        gear=np.asarray(pm.gear),
        damping=lift_dof_arr(np.asarray(pm.damping), 0.0),
        stiffness=lift_dof_arr(np.asarray(pm.stiffness), 0.0),
        springref=lift_dof_arr(np.asarray(pm.springref), 0.0),
        limit_lo=lift_dof_arr(np.asarray(pm.limit_lo), -np.inf),
        limit_hi=lift_dof_arr(np.asarray(pm.limit_hi), np.inf),
        limit_stiffness=pm.limit_stiffness,
        limit_damping=pm.limit_damping,
        gravity=pm.gravity,
        contact_kp=pm.contact_kp,
        contact_kd=pm.contact_kd,
        contact_fmax=pm.contact_fmax,
        friction_mu=pm.friction_mu,
        friction_kt=pm.friction_kt,
        max_qd=pm.max_qd,
        dt=pm.dt,
        n_substeps=pm.n_substeps,
    )


def _lift_q(pm, q_p):
    """Planar coords [x, h, rot, joints] -> spatial [x,0,h, 0,-rot,0, joints]."""
    zeros = jnp.zeros(())
    return jnp.concatenate([
        q_p[0:1], jnp.zeros(1), q_p[1:2],
        jnp.zeros(1), -q_p[2:3], jnp.zeros(1), q_p[3:]])


@pytest.fixture(scope="module")
def ant_pair():
    pm = make_ant_model()
    return pm, _lift_planar(pm)


def test_lifted_mass_matrix_matches(ant_pair):
    pm, sm = ant_pair
    key = jax.random.key(0)
    q_p = 0.1 * jax.random.normal(key, (pm.ndof,))
    M_p = planar.mass_matrix(pm, q_p)
    M_s = spatial.mass_matrix(sm, _lift_q(pm, q_p))
    dof_map = np.array([0, 2, 4, 6, 7, 8, 9])
    M_s_sub = np.asarray(M_s)[np.ix_(dof_map, dof_map)]
    # pitch = -rot flips the sign of the rot row/column cross terms
    sign = np.where(dof_map == 4, -1.0, 1.0)
    M_s_sub = M_s_sub * sign[:, None] * sign[None, :]
    np.testing.assert_allclose(M_s_sub, np.asarray(M_p), rtol=1e-4, atol=1e-5)


def test_lifted_single_step_matches(ant_pair):
    pm, sm = ant_pair
    key = jax.random.key(1)
    k1, k2, k3 = jax.random.split(key, 3)
    q_p = jnp.zeros(pm.ndof).at[1].set(0.05) + 0.05 * jax.random.normal(k1, (pm.ndof,))
    qd_p = 0.1 * jax.random.normal(k2, (pm.ndof,))
    ctrl = jax.random.uniform(k3, (len(pm.actuator_dof),), minval=-1, maxval=1)

    q2_p, qd2_p = planar.step(pm, q_p, qd_p, ctrl)
    q2_s, qd2_s = spatial.step(sm, _lift_q(pm, q_p), _lift_q(pm, qd_p), ctrl)

    q2_s_back = jnp.concatenate([q2_s[0:1], q2_s[2:3], -q2_s[4:5], q2_s[6:]])
    qd2_s_back = jnp.concatenate([qd2_s[0:1], qd2_s[2:3], -qd2_s[4:5], qd2_s[6:]])
    np.testing.assert_allclose(np.asarray(q2_s_back), np.asarray(q2_p),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd2_s_back), np.asarray(qd2_p),
                               rtol=1e-3, atol=2e-3)
    # out-of-plane coordinates stay identically zero
    off_plane = jnp.concatenate([q2_s[1:2], q2_s[3:4], q2_s[5:6],
                                 qd2_s[1:2], qd2_s[3:4], qd2_s[5:6]])
    np.testing.assert_allclose(np.asarray(off_plane), 0.0, atol=1e-5)


def test_lifted_trajectory_matches(ant_pair):
    """Multi-step rollout with contacts active stays on the planar track."""
    pm, sm = ant_pair
    key = jax.random.key(2)
    q_p = jnp.zeros(pm.ndof).at[1].set(0.02)
    qd_p = jnp.zeros(pm.ndof)
    q_s, qd_s = _lift_q(pm, q_p), _lift_q(pm, qd_p)

    step_p = jax.jit(lambda q, qd, c: planar.step(pm, q, qd, c))
    step_s = jax.jit(lambda q, qd, c: spatial.step(sm, q, qd, c))
    for t in range(8):
        key, k = jax.random.split(key)
        ctrl = jax.random.uniform(k, (4,), minval=-0.5, maxval=0.5)
        q_p, qd_p = step_p(q_p, qd_p, ctrl)
        q_s, qd_s = step_s(q_s, qd_s, ctrl)
    q_back = np.concatenate([np.asarray(q_s[0:1]), np.asarray(q_s[2:3]),
                             -np.asarray(q_s[4:5]), np.asarray(q_s[6:])])
    # integrator-amplified f32 divergence accumulates through contact events
    np.testing.assert_allclose(q_back, np.asarray(q_p), atol=5e-3)


def _flight_model():
    """Two-link pendulum in flight (no geoms): energy test subject."""
    return SpatialModel(
        parent=(-1, 1 - 1),
        anchor=np.array([[0, 0, 0], [0.1, 0.2, 0.0]], np.float32),
        axis=np.array([[0, 0, 1.0], [0.3, 0.8, 0.52]], np.float32) /
             np.array([[1.0], [np.sqrt(0.3**2 + 0.8**2 + 0.52**2)]], np.float32),
        com=np.array([[0, 0, -0.1], [0.15, 0, -0.05]], np.float32),
        mass=np.array([1.0, 0.7], np.float32),
        inertia=np.array([[0.02, 0.03, 0.01], [0.01, 0.015, 0.008]], np.float32),
        free_root=True,
        dt=0.02, n_substeps=40, max_qd=1e3,
    )


def test_energy_approximately_conserved_in_flight():
    m = _flight_model()
    key = jax.random.key(4)
    q = 0.3 * jax.random.normal(key, (m.ndof,))
    qd = jnp.array([0.5, -0.3, 1.0, 0.8, -1.2, 0.6, 2.0])

    def energy(q, qd):
        return (spatial.kinetic_energy(m, q, qd)
                + spatial.potential_energy(m, q))

    e0 = float(energy(q, qd))
    step = jax.jit(lambda q, qd: spatial.step(m, q, qd, jnp.zeros(0)))
    for _ in range(25):
        q, qd = step(q, qd)
    e1 = float(energy(q, qd))
    # semi-implicit Euler on a non-separable Lagrangian: bounded drift, not
    # exact conservation; 0.5 s of tumbling flight should hold ~1%
    assert abs(e1 - e0) < 0.015 * abs(e0) + 1e-3, (e0, e1)


def test_free_fall_com_acceleration():
    m = _flight_model()
    q = jnp.zeros(m.ndof)
    qd = jnp.zeros(m.ndof)
    step = jax.jit(lambda q, qd: spatial.step(m, q, qd, jnp.zeros(0)))
    T = 20
    for _ in range(T):
        q, qd = step(q, qd)
    t = m.dt * T
    # COM of the whole assembly falls ballistically; track via weighted coms
    coms, _, _ = spatial.fk(m, q)
    mass = np.asarray(m.mass)
    com_z = float(np.sum(mass * np.asarray(coms)[:, 2]) / mass.sum())
    coms0, _, _ = spatial.fk(m, jnp.zeros(m.ndof))
    com_z0 = float(np.sum(mass * np.asarray(coms0)[:, 2]) / mass.sum())
    # semi-implicit Euler free fall: dz = -g * dt_sub^2 * n(n+1)/2 summed ->
    # -g t (t + dt_sub) / 2
    dt_sub = m.dt / m.n_substeps
    expect = -m.gravity * t * (t + dt_sub) / 2.0
    np.testing.assert_allclose(com_z - com_z0, expect, rtol=1e-3)


def test_ant3d_obs_contract_and_stand():
    from icem_tpu.envs import env_from_string
    env = env_from_string("Ant", exclude_current_positions_from_observation=False)
    assert env.observation_space.low.shape == (28,)
    state, obs = env.reset_with_mode(jax.random.key(0), "train")
    # obs == state in position-included mode (x at 0, z at 2)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(state))
    step = jax.jit(env.step)
    for _ in range(30):
        state, obs, reward, done = step(state, jnp.zeros(8))
    z = float(obs[2])
    assert 0.2 < z < 1.0, f"3D ant fell or flew: z={z}"
    assert float(done) == 0.0
    # roll/pitch stay near level standing still
    assert abs(float(obs[3])) < 0.2 and abs(float(obs[4])) < 0.2


@pytest.mark.slow
def test_ant3d_adversarial_flail_cannot_pump_energy():
    """Closes VERDICT r3 Weak #9: Ant3D now runs the same energy valve as
    Humanoid3D (ant3d.py make_ant3d_model), so the flail-slam-launch exploit
    class (saturated joints + per-control-step frozen mass matrix injecting
    momentum, converted to a root launch by a ground slam) is closed for the
    quadruped too. Maximal alternating full-gear flailing from a 3 m drop
    must never raise the COM above its release height, and must end on the
    ground, not airborne (launch = flight = no contact = free -x_velocity
    for the planner, the exploit the valve forbids)."""
    from icem_tpu.envs.ant3d import make_ant3d_model

    m = make_ant3d_model()
    assert m.energy_valve, "Ant3D model must ship with the energy valve on"
    mass = np.asarray(m.mass)

    def com_z(q):
        coms, _, _ = spatial.fk(m, q)
        return float(np.sum(mass * np.asarray(coms)[:, 2]) / mass.sum())

    step = jax.jit(lambda q, qd, c: spatial.step(m, q, qd, c))
    q = jnp.zeros(m.ndof).at[2].set(3.0)
    qd = jnp.zeros(m.ndof)
    z0 = com_z(q)
    max_com = 0.0
    for t in range(100):
        ctrl = jnp.ones(8) * (1.0 if t % 2 == 0 else -1.0)
        q, qd = step(q, qd, ctrl)
        max_com = max(max_com, com_z(q))
    assert bool(jnp.all(jnp.isfinite(q)))
    assert max_com < z0 + 0.05, f"energy pumped: COM {max_com} from {z0}"
    # grounded, not launched: a splayed ant's COM rests at ~0.5 m (root z
    # up to ~0.55 inside the healthy band); airborne would be >> 1
    assert com_z(q) < 0.8, "should end on the ground, not airborne"
