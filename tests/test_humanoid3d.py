"""3D humanoid (envs/humanoid3d.py) contract + stability tests.

Mirrors the Ant3D checks in test_spatial_physics.py: observation layout the
reference cost formulas index into (height at 2, x velocity at nq —
mujoco.py:259-277, :317-343), chart-recentered supine start, and
no-energy-injection passive stability (the bug class these guard against:
penalty-contact/gimbal blowups that launch the body, see module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icem_tpu.envs.humanoid3d import (Humanoid3D, HumanoidStandup3D,
                                      _Z_STANCE, make_humanoid3d_model)
from icem_tpu.envs.physics import spatial


def test_obs_contract_and_dims():
    env = Humanoid3D()
    assert env.nq == 23 and env.action_space.dim == 17
    assert env.observation_space.low.shape == (46,)
    state, obs = env.reset_with_mode(jax.random.key(0), "train")
    np.testing.assert_allclose(np.asarray(obs), np.asarray(state))
    assert 1.0 < float(obs[2]) < 2.0      # standing, inside the healthy band

    env_ex = Humanoid3D(exclude_current_positions_from_observation=True)
    assert env_ex.observation_space.low.shape == (44,)
    obs_ex = env_ex.observation(state)
    np.testing.assert_allclose(np.asarray(obs_ex), np.asarray(state)[2:])
    assert not env_ex.supports_state_from_obs


def test_cost_formulas_both_branches():
    """cost = -1.25*x_vel + 100*unhealthy + 0.1*|a|^2, z/vel indices per
    branch (mujoco.py:303-343)."""
    key = jax.random.key(1)
    obs = jax.random.normal(key, (5, 46))
    obs = obs.at[:, 2].set(jnp.array([1.2, 0.5, 1.2, 2.5, 1.5]))  # z
    act = 0.3 * jnp.ones((5, 17))
    env = Humanoid3D()
    c = env.cost_fn(obs, act, obs)
    x_vel = obs[:, 23]
    unhealthy = jnp.array([0.0, 1.0, 0.0, 1.0, 0.0])
    expect = -1.25 * x_vel + 100.0 * unhealthy + 0.1 * 17 * 0.09
    np.testing.assert_allclose(np.asarray(c), np.asarray(expect), rtol=1e-5)

    env_ex = Humanoid3D(exclude_current_positions_from_observation=True)
    c_ex = env_ex.cost_fn(obs[:, 2:], act, obs[:, 2:])
    np.testing.assert_allclose(np.asarray(c_ex), np.asarray(expect), rtol=1e-5)

    su = HumanoidStandup3D()
    c_su = su.cost_fn(obs, act, obs)
    np.testing.assert_allclose(np.asarray(c_su),
                               np.asarray(-obs[:, 2] + 0.1 * 17 * 0.09),
                               rtol=1e-5)


def test_supine_start_is_flat_and_off_singularity():
    """The standup init pose lies along x near the ground, and its chart
    pitch (-pi/4) keeps the mass matrix far from the gimbal singularity."""
    su = HumanoidStandup3D()
    state = su.init_state(jax.random.key(2))
    q = state[:su.nq]
    assert abs(float(q[4]) + np.pi / 4) < 0.05      # chart pitch, not -pi/2
    coms, rots, _ = spatial.fk(su.model, q)
    coms = np.asarray(coms)
    assert coms[:, 2].max() < 0.55, "supine body should hug the ground"
    # spine (body +z of the torso) points along world -x when supine
    spine_world = np.asarray(rots)[0] @ np.array([0.0, 0.0, 1.0])
    assert spine_world[0] < -0.95
    # conditioning: the full 23-dof mass matrix stays numerically sane
    M = np.asarray(spatial.mass_matrix(su.model, q))
    assert np.linalg.cond(M) < 1e6


def test_chart_recentring_is_pure_reparametrization():
    """fk with root_rot_offset=Ry(c) at chart pitch p equals the identity
    chart at world pitch p+c (roll = yaw = 0): recentering changes
    coordinates, never the reachable poses."""
    m0 = make_humanoid3d_model()
    mc = make_humanoid3d_model(chart_center_pitch=-np.pi / 4)
    q = jnp.zeros(23).at[2].set(0.8)
    qw = q.at[4].set(0.3 - np.pi / 4)     # world pitch in the identity chart
    qc = q.at[4].set(0.3)                 # same pose in the recentered chart
    coms0, rots0, _ = spatial.fk(m0, qw)
    comsc, rotsc, _ = spatial.fk(mc, qc)
    np.testing.assert_allclose(np.asarray(coms0), np.asarray(comsc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rots0), np.asarray(rotsc), atol=1e-5)


@pytest.mark.slow
def test_adversarial_flail_cannot_pump_energy():
    """A -height planner WILL find integrator energy leaks (it found the
    flail-slam-launch exploit this guards: joints saturated at limit-spring
    terminal velocity, the stale per-control-step mass matrix injected
    momentum, one ground slam converted it to a +30 m/s root launch).
    With the energy valve + per-dof qd caps, maximal alternating full-gear
    flailing from a 5 m drop must never raise the COM above its release
    height."""
    m = make_humanoid3d_model()
    mass = np.asarray(m.mass)

    def com_z(q):
        coms, _, _ = spatial.fk(m, q)
        return float(np.sum(mass * np.asarray(coms)[:, 2]) / mass.sum())

    step = jax.jit(lambda q, qd, c: spatial.step(m, q, qd, c))
    q = jnp.zeros(23).at[2].set(5.0)
    qd = jnp.zeros(23)
    z0 = com_z(q)
    max_com = 0.0
    for t in range(100):
        ctrl = jnp.ones(17) * (1.0 if t % 2 == 0 else -1.0)
        q, qd = step(q, qd, ctrl)
        max_com = max(max_com, com_z(q))
    assert bool(jnp.all(jnp.isfinite(q)))
    assert max_com < z0 + 0.05, f"energy pumped: COM {max_com} from {z0}"
    assert com_z(q) < 0.6, "should end slammed on the ground, not airborne"


@pytest.mark.slow
def test_passive_rollouts_do_not_inject_energy():
    """Zero-control rollouts must come to rest without contact/gimbal
    blowups: the standing biped may FALL (unstable equilibrium) but must
    never be launched (the |qd| and z bounds)."""
    env = Humanoid3D()
    state, obs = env.reset_with_mode(jax.random.key(3), "train")
    step = jax.jit(env.step)
    max_z, max_qd = 0.0, 0.0
    for _ in range(100):
        state, obs, r, d = step(state, jnp.zeros(17))
        max_z = max(max_z, float(obs[2]))
        max_qd = max(max_qd, float(jnp.max(jnp.abs(state[23:]))))
    assert bool(jnp.all(jnp.isfinite(state)))
    assert max_z < _Z_STANCE + 0.3, f"launched: max z {max_z}"
    assert float(jnp.max(jnp.abs(state[23:]))) < 2.0, "did not come to rest"

    su = HumanoidStandup3D()
    state, obs = su.reset_with_mode(jax.random.key(4), "train")
    sstep = jax.jit(su.step)
    for _ in range(80):
        state, obs, r, d = sstep(state, jnp.zeros(17))
    assert bool(jnp.all(jnp.isfinite(state)))
    assert float(obs[2]) < 0.3, "supine rest height"
    assert float(jnp.max(jnp.abs(state[23:]))) < 1.0
