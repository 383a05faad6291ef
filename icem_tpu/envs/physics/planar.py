"""Planar articulated rigid-body dynamics, pure JAX.

The reference delegates all locomotion physics to the external MuJoCo C
engine through host bindings (icem/models/gt_model.py -> env.step); stepping
p trajectories means p separate C calls split across worker processes
(icem/models/gt_par_model.py). This module replaces that with a TPU-native
engine: dynamics are a traceable function of (q, qd, ctrl) so a population of
thousands of trajectories batches with one ``vmap`` and shards across a mesh
with ``shard_map``.

Formulation (Lagrangian, derived by autodiff — no hand-derived equations):

- A model is a kinematic tree of B planar bodies. Body 0 is either a free
  planar root (dofs x, z, rot — MuJoCo's rootx/rootz/rooty pattern) or a
  hinge to the world; every other body hangs from its parent by one hinge.
- Forward kinematics ``fk(q)`` gives body COM positions, absolute angles and
  contact-point world positions (small unrolled loop over bodies).
- Kinetic energy T(q, qd) is evaluated with a single ``jvp`` through fk
  (point velocities without materializing Jacobians).
- The mass matrix is M = d(dT/dqd)/dqd (jacfwd over grad), the
  Coriolis/centrifugal bias is h = (dp/dq) qd - dT/dq with p = dT/dqd
  (one jvp + one grad), gravity is the gradient of the potential.
- Ground contact: penalty springs at geom points (normal spring-damper,
  clamped-viscous Coulomb friction); generalized contact forces come from a
  ``vjp`` of the contact-point map (virtual work), again Jacobian-free.
- Integration: semi-implicit Euler, ``n_substeps`` per control step.

Everything is f32 and shape-static; one compiled step serves any population.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PlanarModel:
    """Static description of a planar kinematic tree.

    Body 0 is the root. If ``free_root`` the dof layout is
    ``[x, z, rot, hinge_1 .. hinge_{B-1}]`` (dof of body b>0 is ``2 + b``),
    else every body including the root has one hinge
    (dof of body b is ``b``).
    """

    parent: Tuple[int, ...]          # per body; parent[0] == -1
    anchor: np.ndarray               # [B,2] joint anchor in parent frame
    com: np.ndarray                  # [B,2] COM offset in body frame
    mass: np.ndarray                 # [B]
    inertia: np.ndarray              # [B] about COM
    free_root: bool = True
    # contact geoms: spheres attached to bodies
    geom_body: Tuple[int, ...] = ()
    geom_pos: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.float32))
    geom_radius: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    # actuators: torque = gear * ctrl applied to a dof
    actuator_dof: Tuple[int, ...] = ()
    gear: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    # per-dof passive dynamics
    damping: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    stiffness: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    springref: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    limit_lo: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    limit_hi: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    limit_stiffness: float = 400.0
    limit_damping: float = 4.0
    # anisotropic viscous fluid drag per body (swimming; zero = disabled):
    # force at the COM decomposed along the body frame, torque on the angle
    drag_normal: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    drag_tangent: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    drag_angular: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.float32))
    # world
    gravity: float = 9.81
    contact_kp: float = 2.0e4
    contact_kd: float = 200.0
    contact_fmax: float = np.inf  # cap on normal force: keeps penalty
    # contacts from storing unbounded elastic energy on hard slams (planners
    # otherwise exploit the rebound to launch bodies)
    friction_mu: float = 1.0
    friction_kt: float = 400.0
    max_qd: float = 100.0         # hard velocity rail (numerical safety)
    # DC-motor speed-torque line: available torque falls linearly to zero at
    # |qd| = motor_omega_max in the torque direction (power-limits actuators;
    # inf disables). Physical analog of MuJoCo's gainprm/force limits.
    motor_omega_max: float = np.inf
    # Energy-consistency valve (the planar twin of spatial.energy_valve):
    # the frozen-M semi-implicit integrator can manufacture energy on hard
    # contact/limit slams (measured: hopper up to 23 kJ in ONE control step
    # from a limit slam, 404 J from a passive ground slam at fall speeds a
    # nominal episode reaches — tests/test_energy_pump.py), which a
    # velocity- or height-rewarding planner can exploit as a launcher. With
    # the valve, end-of-step velocities are rescaled whenever
    # E(q1, qd1) > E(q0, qd0) + W_actuator + eps. Reality-path only: the
    # population-batched imagination paths (batched.py, ops/planar_rollout)
    # stay valveless — an exploit plan then simply fails to realize in the
    # valved real env instead of inflating returns.
    energy_valve: bool = False
    energy_valve_eps: float = 0.1
    # integration
    dt: float = 0.05                 # control timestep
    n_substeps: int = 10

    @property
    def nbody(self) -> int:
        return len(self.parent)

    @property
    def ndof(self) -> int:
        return (3 + self.nbody - 1) if self.free_root else self.nbody

    def dof_of_body(self, b: int) -> int:
        """The hinge dof index of body b (b > 0 for free_root models)."""
        return (2 + b) if self.free_root else b


def _rot(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def fk(model: PlanarModel, q):
    """Forward kinematics.

    Returns (coms [B,2], angles [B], geom_points [G,2]).
    """
    B = model.nbody
    anchors = jnp.asarray(model.anchor, jnp.float32)
    coms_l = jnp.asarray(model.com, jnp.float32)

    origins, angles = [], []
    for b in range(B):
        if b == 0:
            if model.free_root:
                ang = q[2]
                orig = q[0:2] + anchors[0]
            else:
                ang = q[0]
                orig = anchors[0]
        else:
            pa = model.parent[b]
            pang, porig = angles[pa], origins[pa]
            ang = pang + q[model.dof_of_body(b)]
            orig = porig + _rot(pang) @ anchors[b]
        origins.append(orig)
        angles.append(ang)

    origins = jnp.stack(origins)          # [B,2]
    angles = jnp.stack(angles)            # [B]
    rots = jax.vmap(_rot)(angles)         # [B,2,2]
    coms = origins + jnp.einsum("bij,bj->bi", rots, coms_l)

    if len(model.geom_body) > 0:
        gb = np.asarray(model.geom_body)
        gpos = jnp.asarray(model.geom_pos, jnp.float32)
        geom_pts = origins[gb] + jnp.einsum("gij,gj->gi", rots[gb], gpos)
    else:
        geom_pts = jnp.zeros((0, 2))
    return coms, angles, geom_pts


def kinetic_energy(model: PlanarModel, q, qd):
    """T(q, qd) via one jvp through fk (no Jacobian materialization)."""
    mass = jnp.asarray(model.mass, jnp.float32)
    inertia = jnp.asarray(model.inertia, jnp.float32)

    def pos_fn(q_):
        coms, angles, _ = fk(model, q_)
        return coms, angles

    (_, _), (vcom, vang) = jax.jvp(pos_fn, (q,), (qd,))
    return 0.5 * jnp.sum(mass * jnp.sum(vcom**2, axis=-1)) + 0.5 * jnp.sum(inertia * vang**2)


def potential_energy(model: PlanarModel, q):
    mass = jnp.asarray(model.mass, jnp.float32)
    coms, _, _ = fk(model, q)
    return model.gravity * jnp.sum(mass * coms[:, 1])


def mass_matrix(model: PlanarModel, q):
    """M(q) = d^2 T / dqd^2 (constant in qd)."""
    zero = jnp.zeros(model.ndof)
    p_fn = jax.grad(lambda v: kinetic_energy(model, q, v))
    return jax.jacfwd(p_fn)(zero)


def bias_forces(model: PlanarModel, q, qd):
    """Coriolis/centrifugal h(q, qd) = (dp/dq) qd - dT/dq, plus gravity dV/dq."""
    p_fn = lambda q_: jax.grad(lambda v: kinetic_energy(model, q_, v))(qd)
    mdot_qd = jax.jvp(p_fn, (q,), (qd,))[1]
    dT_dq = jax.grad(lambda q_: kinetic_energy(model, q_, qd))(q)
    dV_dq = jax.grad(lambda q_: potential_energy(model, q_))(q)
    return mdot_qd - dT_dq + dV_dq


def contact_forces(model: PlanarModel, q, qd):
    """Generalized ground-contact forces via virtual work (vjp of geom map)."""
    if len(model.geom_body) == 0:
        return jnp.zeros(model.ndof)
    radius = jnp.asarray(model.geom_radius, jnp.float32)

    geom_fn = lambda q_: fk(model, q_)[2]
    # one linearization serves both the velocity (J qd) and the generalized
    # force (J^T f) — jvp + vjp would run the fk forward pass twice
    pts, lin = jax.linearize(geom_fn, q)
    vel = lin(qd)
    phi = pts[:, 1] - radius                       # signed distance to ground
    in_contact = phi < 0.0
    fn = jnp.maximum(0.0, -model.contact_kp * phi - model.contact_kd * vel[:, 1])
    fn = jnp.minimum(fn, model.contact_fmax)
    fn = jnp.where(in_contact, fn, 0.0)
    ft = -jnp.clip(model.friction_kt * vel[:, 0],
                   -model.friction_mu * fn, model.friction_mu * fn)
    force = jnp.stack([ft, fn], axis=-1)           # [G,2]

    lin_t = jax.linear_transpose(lin, q)
    return lin_t(force)[0]


def fluid_drag_forces(model: PlanarModel, q, qd):
    """Anisotropic viscous drag (swimmer-style fluid model).

    Each body feels a force at its COM proportional to the COM velocity,
    decomposed in the body frame (normal drag >> tangential drag makes
    undulation propulsive), plus rotational damping. Generalized forces via
    virtual work (vjp), like contacts.
    """
    if len(model.drag_normal) == 0:
        return jnp.zeros(model.ndof)
    cn = jnp.asarray(model.drag_normal, jnp.float32)
    ct = jnp.asarray(model.drag_tangent, jnp.float32)
    ca = jnp.asarray(model.drag_angular, jnp.float32)

    def pose_fn(q_):
        coms, angles, _ = fk(model, q_)
        return coms, angles

    (coms, angles), (vcom, vang) = jax.jvp(pose_fn, (q,), (qd,))
    tangent = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)   # [B,2]
    normal = jnp.stack([-jnp.sin(angles), jnp.cos(angles)], axis=-1)
    vt = jnp.sum(vcom * tangent, axis=-1, keepdims=True)
    vn = jnp.sum(vcom * normal, axis=-1, keepdims=True)
    f_com = -(ct[:, None] * vt * tangent + cn[:, None] * vn * normal)  # [B,2]
    torque = -ca * vang                                                # [B]

    _, vjp_fn = jax.vjp(pose_fn, q)
    return vjp_fn((f_com, torque))[0]


def spring_forces(model: PlanarModel, q):
    """Position-dependent passive torques: joint springs + limit penalties.

    Velocity-dependent damping is handled IMPLICITLY in the integrator
    (see ``substep``) for unconditional stability with stiff joints.
    """
    stiffness = jnp.asarray(model.stiffness, jnp.float32)
    springref = jnp.asarray(model.springref, jnp.float32)
    lo = jnp.asarray(model.limit_lo, jnp.float32)
    hi = jnp.asarray(model.limit_hi, jnp.float32)

    tau = -stiffness * (q - springref)
    over = jnp.maximum(q - hi, 0.0)
    under = jnp.maximum(lo - q, 0.0)
    tau += -model.limit_stiffness * over + model.limit_stiffness * under
    return tau


def damping_diagonal(model: PlanarModel, q):
    """Per-dof viscous coefficients treated implicitly: joint damping plus
    extra limit damping while a limit is violated."""
    damping = jnp.asarray(model.damping, jnp.float32)
    lo = jnp.asarray(model.limit_lo, jnp.float32)
    hi = jnp.asarray(model.limit_hi, jnp.float32)
    in_violation = (q > hi) | (q < lo)
    return damping + jnp.where(in_violation, model.limit_damping, 0.0)


def actuation(model: PlanarModel, ctrl):
    """Map [A] controls to [ndof] torques (torque = gear * ctrl)."""
    tau = jnp.zeros(model.ndof)
    if len(model.actuator_dof) == 0:
        return tau
    dofs = np.asarray(model.actuator_dof)
    gear = jnp.asarray(model.gear, jnp.float32)
    return tau.at[dofs].add(gear * ctrl)


def substep(model: PlanarModel, q, qd, tau_ctrl, dt_sub: float):
    """One semi-implicit Euler substep with implicit joint damping.

    Solving (M + dt*D) qd' = M qd + dt * rhs makes arbitrarily large joint
    damping unconditionally stable (MuJoCo treats damping implicitly for the
    same reason); contact normal/friction damping stays explicit but is
    tuned against the substep size.
    """
    rhs = (tau_ctrl + spring_forces(model, q) + contact_forces(model, q, qd)
           + fluid_drag_forces(model, q, qd) - bias_forces(model, q, qd))
    M = mass_matrix(model, q) + 1e-6 * jnp.eye(model.ndof)
    D = damping_diagonal(model, q)
    lhs = M + dt_sub * jnp.diag(D)
    qd_new = jnp.linalg.solve(lhs, M @ qd + dt_sub * rhs)
    qd_new = jnp.clip(qd_new, -model.max_qd, model.max_qd)  # safety rail
    q_new = q + dt_sub * qd_new
    return q_new, qd_new


def cholesky_unrolled(A, n: int):
    """Cholesky factor of a small SPD matrix, fully unrolled.

    For static n (~9 dofs) this lowers to a chain of batched elementwise ops
    — no LAPACK-style loops/pivoting, which is what makes the inner dynamics
    solve fast on TPU under vmap. Returns the lower factor as nested lists of
    (batched) scalars.
    """
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                # pivot floor RELATIVE to the diagonal: near a singular
                # configuration (rpy gimbal lock) f32 roundoff drives the
                # Schur complement to ~eps*A_ii; an absolute 1e-9 floor
                # makes 1/L ~ 3e4, and the back-substitution's alternating
                # huge products overflow to inf - inf = nan over ~14 dofs.
                # Flooring at 1e-5*A_ii bounds the amplification — the lost
                # dof direction gets extra inertia (bounded acceleration)
                # instead of a NaN'd state; well-conditioned steps never
                # reach the floor.
                L[i][j] = jnp.sqrt(jnp.maximum(
                    s, jnp.maximum(1e-5 * A[..., i, i], 1e-9)))
            else:
                L[i][j] = s / L[j][j]
    return L


def cholesky_solve_unrolled(L, b, n: int):
    """Solve L L^T x = b with the unrolled factor from cholesky_unrolled."""
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _per_dof(model: PlanarModel, arr, fill: float):
    """Zero-length per-dof arrays (the dataclass defaults) mean 'none'."""
    a = np.asarray(arr, np.float32)
    if a.shape[0] == 0:
        a = np.full(model.ndof, fill, np.float32)
    return jnp.asarray(a)


def stored_energy(model: PlanarModel, q, qd):
    """Total mechanical energy the state can release: kinetic + gravity PE +
    joint-spring PE + limit-spring PE + contact-spring PE.

    The planar twin of spatial.stored_energy: every term the integrator can
    convert back into motion is included, so the physical inequality
    dE/dt <= P_actuator holds exactly for the continuous dynamics (joint
    damping, Coulomb friction, fluid drag and the contact normal damper
    only remove energy). Used by the energy-pump audit
    (tests/test_energy_pump.py) that checks the discrete integrator cannot
    be exploited as an energy source by a planner.
    """
    e = kinetic_energy(model, q, qd) + potential_energy(model, q)

    stiffness = _per_dof(model, model.stiffness, 0.0)
    springref = _per_dof(model, model.springref, 0.0)
    e += 0.5 * jnp.sum(stiffness * (q - springref) ** 2)

    lo = _per_dof(model, model.limit_lo, -np.inf)
    hi = _per_dof(model, model.limit_hi, np.inf)
    over = jnp.maximum(q - hi, 0.0)
    under = jnp.maximum(lo - q, 0.0)
    e += 0.5 * model.limit_stiffness * jnp.sum(over**2 + under**2)

    if len(model.geom_body) > 0:
        radius = jnp.asarray(model.geom_radius, jnp.float32)
        pts = fk(model, q)[2]
        pen = jnp.maximum(radius - pts[:, 1], 0.0)
        # piecewise PE consistent with the fmax-capped normal spring
        # (see spatial.stored_energy for the branch rationale)
        if np.isfinite(model.contact_fmax):
            pen_star = model.contact_fmax / model.contact_kp
            quad = 0.5 * model.contact_kp * jnp.minimum(pen, pen_star) ** 2
            lin = model.contact_fmax * jnp.maximum(pen - pen_star, 0.0)
            e += jnp.sum(quad + lin)
        else:
            e += jnp.sum(0.5 * model.contact_kp * pen**2)
    return e


def _control_step(model: PlanarModel, q, qd, ctrl, with_work: bool):
    """Shared control-step body; ``with_work`` (static) additionally
    integrates the exact discrete actuator work Σ τ·qd_new·dt_sub for the
    energy audit — kept out of the hot path, which calls with False
    (unless the model's energy valve needs the work bound anyway)."""
    with_work = with_work or model.energy_valve
    n = model.ndof
    tau_ctrl = actuation(model, ctrl)
    dt_sub = model.dt / model.n_substeps

    M = mass_matrix(model, q) + 1e-6 * jnp.eye(n)
    D = damping_diagonal(model, q)
    lhs = M + dt_sub * jnp.diag(D)
    L = cholesky_unrolled(lhs, n)
    bias = bias_forces(model, q, qd)

    def body(carry, _):
        q_, qd_, work = carry
        if np.isfinite(model.motor_omega_max):
            speed_factor = jnp.clip(
                1.0 - qd_ * jnp.sign(tau_ctrl) / model.motor_omega_max, 0.0, 1.0)
            tau = tau_ctrl * speed_factor
        else:
            tau = tau_ctrl
        rhs = (tau + spring_forces(model, q_)
               + contact_forces(model, q_, qd_)
               + fluid_drag_forces(model, q_, qd_) - bias)
        qd_new = cholesky_solve_unrolled(L, M @ qd_ + dt_sub * rhs, n)
        qd_new = jnp.clip(qd_new, -model.max_qd, model.max_qd)
        q_new = q_ + dt_sub * qd_new
        if with_work:
            work = work + dt_sub * jnp.dot(tau, qd_new)
        return (q_new, qd_new, work), None

    (q_new, qd_new, w_act), _ = jax.lax.scan(
        body, (q, qd, jnp.float32(0.0)), None, length=model.n_substeps)

    if model.energy_valve:
        e0 = stored_energy(model, q, qd)
        bound = e0 + jnp.maximum(w_act, 0.0) + model.energy_valve_eps
        e1 = stored_energy(model, q_new, qd_new)
        ke1 = kinetic_energy(model, q_new, qd_new)
        excess = e1 - bound
        # rescale end-of-step velocities so E1 <= bound (all the removable
        # energy is kinetic; potential terms depend on q alone). When no
        # excess exists scale2 clips to exactly 1.0, so nominal steps are
        # bit-identical to the valveless integrator.
        scale2 = jnp.clip((ke1 - excess) / jnp.maximum(ke1, 1e-9), 0.0, 1.0)
        qd_new = qd_new * jnp.sqrt(scale2)
    return q_new, qd_new, (w_act if with_work else None)


def step(model: PlanarModel, q, qd, ctrl):
    """One control step = n_substeps physics substeps (scan).

    TPU hot path: the mass matrix, its implicit-damping Cholesky factor and
    the Coriolis/gravity bias are computed ONCE per control step and held
    over the substeps (MuJoCo recomputes at its own coarser dt; these terms
    are smooth at the control timescale). Per substep only the stiff terms —
    contact and spring/limit forces — are re-evaluated, so a substep is a
    short chain of fused elementwise ops.
    """
    q_new, qd_new, _ = _control_step(model, q, qd, ctrl, with_work=False)
    return q_new, qd_new


def step_with_energy_audit(model: PlanarModel, q, qd, ctrl):
    """Control step that also returns the exact discrete actuator work.

    (q2, qd2, w_act) — the audit quantity is
    stored_energy(q2, qd2) - stored_energy(q, qd) - max(w_act, 0), which a
    leak-free discrete integrator keeps <= a small epsilon. This is the
    measurement backing the decision NOT to ship an energy valve on the
    planar engine (the 3D engine ships one, spatial.py energy_valve).
    """
    return _control_step(model, q, qd, ctrl, with_work=True)


# ---------------------------------------------------------------------------
# Model construction helpers
# ---------------------------------------------------------------------------

def chain_link_inertia(mass: float, length: float) -> float:
    """Thin-rod moment of inertia about the COM."""
    return mass * length**2 / 12.0
