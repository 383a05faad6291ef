"""MuJoCo-oracle parity for the MJCF exporter and engine cores.

BASELINE.md's dynamics-parity target: the reference's ground-truth model is
literally MuJoCo (icem/models/gt_model.py:59-102). These tests pin our
engines to a real ``mujoco`` build of the SAME model parameters
(envs/physics/mjcf_export.py) in the regimes where agreement must be exact:

- forward kinematics (geom/COM world positions): float32-exact
- mass matrix / Coriolis+gravity bias: float32-exact
- joint spring/damper passive forces: float32-exact
- ballistic trajectories (airborne, zero ctrl): tight per-step drift

Contact/limit trajectories are measured (not asserted) by
scripts/fidelity_oracle.py -> results/FIDELITY_r*.json, because MuJoCo
realizes those through a convex complementarity solver while our engines use
penalty forces — a structural difference the artifact quantifies.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from icem_tpu.envs.ant3d import make_ant3d_model  # noqa: E402
from icem_tpu.envs.cheetah import HalfCheetah  # noqa: E402
from icem_tpu.envs.hopper import Hopper  # noqa: E402
from icem_tpu.envs.physics import mjcf_export, planar, spatial  # noqa: E402


def _spatial_cases():
    return {"ant3d": make_ant3d_model()}


def _planar_cases():
    return {"halfcheetah": HalfCheetah().model, "hopper": Hopper().model}


def _mid_limits(model, rng, spread=0.15):
    q = 0.1 * rng.standard_normal(model.ndof)
    lo = np.asarray(model.limit_lo, np.float64)
    hi = np.asarray(model.limit_hi, np.float64)
    if lo.size:
        fin = np.isfinite(lo) & np.isfinite(hi)
        mid = np.where(fin, lo, 0.0) / 2.0 + np.where(fin, hi, 0.0) / 2.0
        span = np.where(fin, hi, 0.0) - np.where(fin, lo, 0.0)
        q[fin] = (mid + spread * span * np.tanh(q))[fin]
    return q


@pytest.mark.parametrize("name", sorted(_spatial_cases()))
def test_spatial_fk_matches_mujoco(name):
    model = _spatial_cases()[name]
    m = mujoco.MjModel.from_xml_string(mjcf_export.spatial_to_mjcf(model))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    for _ in range(3):
        q = 0.3 * rng.standard_normal(model.ndof)
        q[2] += 1.0
        d.qpos[:] = mjcf_export.qpos_from_q_spatial(q, model.free_root)
        mujoco.mj_forward(m, d)
        coms, _, gpts = spatial.fk(model, jnp.asarray(q, jnp.float32))
        gpts = np.asarray(gpts)
        for g in range(len(model.geom_body)):
            gid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, f"g{g}")
            np.testing.assert_allclose(d.geom_xpos[gid], gpts[g], atol=1e-5)
        coms = np.asarray(coms)
        for b in range(model.nbody):
            bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, f"b{b}")
            np.testing.assert_allclose(d.xipos[bid], coms[b], atol=1e-5)


@pytest.mark.parametrize("name", sorted(_spatial_cases()))
def test_spatial_mass_bias_passive_match_mujoco(name):
    model = _spatial_cases()[name]
    m = mujoco.MjModel.from_xml_string(mjcf_export.spatial_to_mjcf(model))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(1)
    perm = np.arange(model.ndof)
    perm[3], perm[5] = 5, 3

    q = _mid_limits(model, rng)
    q[2] += 1.0
    qd = 0.5 * rng.standard_normal(model.ndof)
    d.qpos[:] = mjcf_export.qpos_from_q_spatial(q, True)
    d.qvel[:] = mjcf_export.qvel_from_qd_spatial(qd, True)
    mujoco.mj_forward(m, d)

    M_ref = np.asarray(spatial.mass_matrix(model, jnp.asarray(q, jnp.float32)))
    Mmj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mmj)
    scale = np.abs(M_ref).max()
    np.testing.assert_allclose(Mmj[np.ix_(perm, perm)], M_ref, atol=3e-5 * scale)

    b_ref = np.asarray(spatial.bias_forces(
        model, jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32)))
    bscale = max(1.0, np.abs(b_ref).max())
    np.testing.assert_allclose(d.qfrc_bias[perm], b_ref, atol=3e-5 * bscale)

    sp_ref = np.asarray(spatial.spring_forces(model, jnp.asarray(q, jnp.float32)))
    damping = np.asarray(model.damping, np.float64)
    if damping.size == 0:
        damping = np.zeros(model.ndof)
    passive_ref = sp_ref - damping * qd
    pscale = max(1.0, np.abs(passive_ref).max())
    np.testing.assert_allclose(d.qfrc_passive[perm], passive_ref,
                               atol=3e-5 * pscale)


@pytest.mark.parametrize("name", sorted(_planar_cases()))
def test_planar_fk_mass_bias_match_mujoco(name):
    model = _planar_cases()[name]
    m = mujoco.MjModel.from_xml_string(mjcf_export.planar_to_mjcf(model))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(2)
    q = 0.3 * rng.standard_normal(model.ndof)
    q[1] += 1.0
    qd = 0.5 * rng.standard_normal(model.ndof)
    d.qpos[:] = q
    d.qvel[:] = qd
    mujoco.mj_forward(m, d)

    _, _, gpts = planar.fk(model, jnp.asarray(q, jnp.float32))
    gpts = np.asarray(gpts)
    for g in range(len(model.geom_body)):
        gid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_GEOM, f"g{g}")
        np.testing.assert_allclose(
            d.geom_xpos[gid], [gpts[g, 0], 0.0, gpts[g, 1]], atol=1e-5)

    M_ref = np.asarray(planar.mass_matrix(model, jnp.asarray(q, jnp.float32)))
    Mmj = np.zeros((m.nv, m.nv))
    mujoco.mj_fullM(m, d, Mmj)
    np.testing.assert_allclose(Mmj, M_ref, atol=3e-5 * np.abs(M_ref).max())

    b_ref = np.asarray(planar.bias_forces(
        model, jnp.asarray(q, jnp.float32), jnp.asarray(qd, jnp.float32)))
    np.testing.assert_allclose(d.qfrc_bias, b_ref,
                               atol=3e-5 * max(1.0, np.abs(b_ref).max()))


@pytest.mark.parametrize("name", sorted(_planar_cases()))
def test_planar_ballistic_trajectory_matches_mujoco(name):
    """Airborne, zero ctrl, inside limits: the only differences are
    integrator details; 5 control steps must agree to ~1e-4."""
    model = _planar_cases()[name]
    m = mujoco.MjModel.from_xml_string(mjcf_export.planar_to_mjcf(model))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(3)
    q0 = _mid_limits(model, rng)
    q0[1] = 3.0
    qd0 = 0.2 * rng.standard_normal(model.ndof)
    d.qpos[:] = q0
    d.qvel[:] = qd0

    step = jax.jit(lambda q, qd, a: planar.step(model, q, qd, a))
    q, qd = jnp.asarray(q0, jnp.float32), jnp.asarray(qd0, jnp.float32)
    a = jnp.zeros(len(model.actuator_dof))
    for _ in range(5):
        q, qd = step(q, qd, a)
        d.ctrl[:] = 0.0
        for _ in range(model.n_substeps):
            mujoco.mj_step(m, d)
    # springs keep joints moving airborne, so the per-control-step frozen
    # mass matrix (ours) vs per-substep (MuJoCo) shows up at ~2e-3 over 5
    # steps; a chart/mapping bug would be orders of magnitude larger
    np.testing.assert_allclose(np.asarray(q, np.float64), d.qpos, atol=1e-2)


def test_spatial_ballistic_trajectory_matches_mujoco():
    model = make_ant3d_model()
    m = mujoco.MjModel.from_xml_string(mjcf_export.spatial_to_mjcf(model))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(4)
    q0 = _mid_limits(model, rng)
    q0[2] = 4.0
    qd0 = 0.2 * rng.standard_normal(model.ndof)
    d.qpos[:] = mjcf_export.qpos_from_q_spatial(q0, True)
    d.qvel[:] = mjcf_export.qvel_from_qd_spatial(qd0, True)

    step = jax.jit(lambda q, qd, a: spatial.step(model, q, qd, a))
    q, qd = jnp.asarray(q0, jnp.float32), jnp.asarray(qd0, jnp.float32)
    a = jnp.zeros(len(model.actuator_dof))
    for _ in range(5):
        q, qd = step(q, qd, a)
        d.ctrl[:] = 0.0
        for _ in range(model.n_substeps):
            mujoco.mj_step(m, d)
    qmj = mjcf_export.q_from_qpos_spatial(d.qpos.copy(), True)
    np.testing.assert_allclose(np.asarray(q, np.float64), qmj, atol=5e-3)


def test_exporter_refuses_unexportable_features():
    import dataclasses
    model = dataclasses.replace(make_ant3d_model(), motor_omega_max=8.0)
    with pytest.raises(ValueError):
        mjcf_export.spatial_to_mjcf(model)
