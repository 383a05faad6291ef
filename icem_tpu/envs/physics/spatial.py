"""Spatial (3D) articulated rigid-body dynamics, pure JAX.

Round-2 built planar morphologies on the autodiff Lagrangian engine
(envs/physics/planar.py); this module generalizes the exact same
formulation to genuinely 3D kinematic trees so that Ant can be the 3D
quadruped the reference wraps (icem/environments/mujoco.py:134-171 — gym
ant_v3: free 6-dof root + 8 leg hinges) instead of a sagittal projection.

The structure deliberately mirrors planar.py one function for one function —
fk -> kinetic energy via one jvp -> mass matrix via jacfwd(grad) -> bias via
jvp+grad -> contacts via linearize/linear_transpose -> semi-implicit Euler
with an unrolled Cholesky — so the two engines validate each other: a
spatial model whose hinge axes are all +Y and whose root is constrained to
the xz-plane integrates the same trajectory as its planar twin (see
tests/test_spatial_physics.py).

3D-specific choices:

- Root orientation is intrinsic roll-pitch-yaw: R = Rz(yaw) Ry(pitch)
  Rx(roll), q[3:6] = [roll, pitch, yaw]. Euler angles keep the
  configuration space a plain vector (the Lagrangian autodiff machinery
  needs unconstrained coordinates); the gimbal singularity sits at
  pitch = ±pi/2, far outside a healthy quadruped's operating envelope —
  and the locomotion costs (unhealthy band) push planners away from it.
- Every non-root joint is a hinge about a FIXED body-frame axis
  (Rodrigues rotation). That covers the whole gym-Ant morphology; 3-dof
  ball joints would be three stacked hinges.
- Body angular velocity for the kinetic energy comes out of the same jvp
  that gives COM velocities: with pose_fn(q) -> (coms, Rs), the tangent
  Rdot yields the body-frame angular velocity Omega = unhat(R^T Rdot),
  and T_rot = 1/2 Omega . (I_body * Omega) with the diagonal body-frame
  inertia — no world-frame inertia tensors ever materialize.
- Ground contact is sphere-vs-plane z=0: normal spring-damper along z,
  Coulomb friction clamps the 2-norm of the (x, y) tangential viscous
  force to mu * fn (the planar engine's 1D clip, made isotropic).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.physics.planar import (cholesky_solve_unrolled,
                                          cholesky_unrolled)


@dataclass(frozen=True)
class SpatialModel:
    """Static description of a 3D kinematic tree.

    Body 0 is the root. If ``free_root`` the dof layout is
    ``[x, y, z, roll, pitch, yaw, hinge_1 .. hinge_{B-1}]`` (dof of body
    b>0 is ``5 + b``), else every body including the root has one hinge
    (dof of body b is ``b``).
    """

    parent: Tuple[int, ...]          # per body; parent[0] == -1
    anchor: np.ndarray               # [B,3] joint anchor in parent frame
    axis: np.ndarray                 # [B,3] hinge axis in body frame (unit)
    com: np.ndarray                  # [B,3] COM offset in body frame
    mass: np.ndarray                 # [B]
    inertia: np.ndarray              # [B,3] diagonal inertia about COM, body frame
    free_root: bool = True
    # Constant world-frame rotation applied LEFT of the root rpy chart:
    # R_root = root_rot_offset @ R_rpy(q[3:6]). The rpy chart is singular at
    # chart pitch = +-pi/2; tasks whose working orientations sit near a
    # singular chart point (e.g. a supine humanoid at world pitch -pi/2)
    # recenter the chart so the whole working range is well-conditioned
    # (see envs/humanoid3d.py). Identity by default; q[3:6] are then plain
    # world roll/pitch/yaw.
    root_rot_offset: np.ndarray = field(
        default_factory=lambda: np.eye(3, dtype=np.float32))
    # contact geoms: spheres attached to bodies
    geom_body: Tuple[int, ...] = ()
    geom_pos: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
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
    # world
    gravity: float = 9.81
    contact_kp: float = 2.0e4
    contact_kd: float = 200.0
    contact_fmax: float = np.inf
    friction_mu: float = 1.0
    friction_kt: float = 400.0
    # scalar or per-dof [ndof] velocity clip. Joint clips should sit near the
    # physical regime (~1.5x motor_omega_max): limit-spring terminal velocity
    # (limit_stiffness / limit_damping) is what lets joints reach unphysical
    # speeds where the per-control-step mass matrix is badly stale.
    max_qd: float | np.ndarray = 100.0
    motor_omega_max: float = np.inf
    # Energy-consistency valve: physics bounds a control step's stored-energy
    # growth by the actuator work done (damping/friction only dissipate).
    # The per-control-step M/Cholesky/bias split (the hot-path optimization)
    # makes the integrator NON-conservative under violent configuration
    # change within a step — a planner maximizing height will find and pump
    # that artifact (the 3D-humanoid "launch" exploit). With the valve, the
    # end-of-step velocities are rescaled whenever
    # E(q1, qd1) > E(q0, qd0) + W_actuator + eps, restoring the physical
    # energy inequality at ~10% extra step cost (two stored_energy evals).
    energy_valve: bool = False
    energy_valve_eps: float = 0.1
    # integration
    dt: float = 0.05
    n_substeps: int = 10

    @property
    def nbody(self) -> int:
        return len(self.parent)

    @property
    def ndof(self) -> int:
        return (6 + self.nbody - 1) if self.free_root else self.nbody

    def dof_of_body(self, b: int) -> int:
        """The hinge dof index of body b (b > 0 for free_root models)."""
        return (5 + b) if self.free_root else b


def _rot_axis(axis, theta):
    """Rodrigues rotation about a fixed unit axis."""
    a = jnp.asarray(axis, jnp.float32)
    K = jnp.array([[0.0, -a[2], a[1]],
                   [a[2], 0.0, -a[0]],
                   [-a[1], a[0], 0.0]], jnp.float32)
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def _rot_rpy(rpy):
    """Intrinsic roll-pitch-yaw: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    cr, sr = jnp.cos(rpy[0]), jnp.sin(rpy[0])
    cp, sp = jnp.cos(rpy[1]), jnp.sin(rpy[1])
    cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    Ry = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    Rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    return Rz @ Ry @ Rx


def fk(model: SpatialModel, q):
    """Forward kinematics.

    Returns (coms [B,3], rotations [B,3,3], geom_points [G,3]).
    """
    B = model.nbody
    anchors = jnp.asarray(model.anchor, jnp.float32)
    coms_l = jnp.asarray(model.com, jnp.float32)
    axes = np.asarray(model.axis, np.float32)

    origins, rots = [], []
    for b in range(B):
        if b == 0:
            if model.free_root:
                R = jnp.asarray(model.root_rot_offset, jnp.float32) @ _rot_rpy(q[3:6])
                orig = q[0:3] + anchors[0]
            else:
                R = _rot_axis(axes[0], q[0])
                orig = anchors[0]
        else:
            pa = model.parent[b]
            Rp, op = rots[pa], origins[pa]
            R = Rp @ _rot_axis(axes[b], q[model.dof_of_body(b)])
            orig = op + Rp @ anchors[b]
        origins.append(orig)
        rots.append(R)

    origins = jnp.stack(origins)                     # [B,3]
    rots = jnp.stack(rots)                           # [B,3,3]
    coms = origins + jnp.einsum("bij,bj->bi", rots, coms_l)

    if len(model.geom_body) > 0:
        gb = np.asarray(model.geom_body)
        gpos = jnp.asarray(model.geom_pos, jnp.float32)
        geom_pts = origins[gb] + jnp.einsum("gij,gj->gi", rots[gb], gpos)
    else:
        geom_pts = jnp.zeros((0, 3))
    return coms, rots, geom_pts


def _unhat(A):
    """Vector of a skew-symmetric [...,3,3] matrix."""
    return jnp.stack([A[..., 2, 1], A[..., 0, 2], A[..., 1, 0]], axis=-1)


def kinetic_energy(model: SpatialModel, q, qd):
    """T(q, qd) via one jvp through fk.

    The rotation tangents Rdot give body-frame angular velocities
    Omega = unhat(R^T Rdot) for free; inertia stays diagonal in the body
    frame, so T_rot never forms a world inertia tensor.
    """
    mass = jnp.asarray(model.mass, jnp.float32)
    inertia = jnp.asarray(model.inertia, jnp.float32)  # [B,3]

    def pose_fn(q_):
        coms, rots, _ = fk(model, q_)
        return coms, rots

    (_, rots), (vcom, rdot) = jax.jvp(pose_fn, (q,), (qd,))
    omega = _unhat(jnp.einsum("bji,bjk->bik", rots, rdot))   # R^T Rdot
    t_lin = 0.5 * jnp.sum(mass * jnp.sum(vcom**2, axis=-1))
    t_rot = 0.5 * jnp.sum(inertia * omega**2)
    return t_lin + t_rot


def potential_energy(model: SpatialModel, q):
    mass = jnp.asarray(model.mass, jnp.float32)
    coms, _, _ = fk(model, q)
    return model.gravity * jnp.sum(mass * coms[:, 2])


def mass_matrix(model: SpatialModel, q):
    """M(q) = d^2 T / dqd^2 (constant in qd)."""
    zero = jnp.zeros(model.ndof)
    p_fn = jax.grad(lambda v: kinetic_energy(model, q, v))
    return jax.jacfwd(p_fn)(zero)


def bias_forces(model: SpatialModel, q, qd):
    """Coriolis/centrifugal h(q, qd) = (dp/dq) qd - dT/dq, plus gravity dV/dq."""
    p_fn = lambda q_: jax.grad(lambda v: kinetic_energy(model, q_, v))(qd)
    mdot_qd = jax.jvp(p_fn, (q,), (qd,))[1]
    dT_dq = jax.grad(lambda q_: kinetic_energy(model, q_, qd))(q)
    dV_dq = jax.grad(lambda q_: potential_energy(model, q_))(q)
    return mdot_qd - dT_dq + dV_dq


def contact_forces(model: SpatialModel, q, qd):
    """Generalized ground-contact forces via virtual work (vjp of geom map).

    Normal: spring-damper along +z, capped at contact_fmax. Friction:
    viscous in the (x, y) tangent plane with its 2-NORM clamped to
    mu * fn (isotropic Coulomb cone, unlike the planar engine's scalar
    clip — a 3D slide direction must not get sqrt(2) extra budget on the
    diagonals).
    """
    if len(model.geom_body) == 0:
        return jnp.zeros(model.ndof)
    radius = jnp.asarray(model.geom_radius, jnp.float32)

    geom_fn = lambda q_: fk(model, q_)[2]
    pts, lin = jax.linearize(geom_fn, q)
    vel = lin(qd)
    phi = pts[:, 2] - radius
    in_contact = phi < 0.0
    fn = jnp.maximum(0.0, -model.contact_kp * phi - model.contact_kd * vel[:, 2])
    fn = jnp.minimum(fn, model.contact_fmax)
    fn = jnp.where(in_contact, fn, 0.0)
    ft_raw = -model.friction_kt * vel[:, :2]                  # [G,2]
    ft_norm = jnp.linalg.norm(ft_raw, axis=-1)
    scale = jnp.minimum(1.0, model.friction_mu * fn / jnp.maximum(ft_norm, 1e-9))
    ft = ft_raw * scale[:, None]
    force = jnp.concatenate([ft, fn[:, None]], axis=-1)       # [G,3]

    lin_t = jax.linear_transpose(lin, q)
    return lin_t(force)[0]


def _per_dof(model: SpatialModel, arr, fill: float):
    """Zero-length per-dof arrays (the dataclass defaults) mean 'none'."""
    a = np.asarray(arr, np.float32)
    if a.shape[0] == 0:
        a = np.full(model.ndof, fill, np.float32)
    return jnp.asarray(a)


def spring_forces(model: SpatialModel, q):
    """Position-dependent passive torques: joint springs + limit penalties."""
    stiffness = _per_dof(model, model.stiffness, 0.0)
    springref = _per_dof(model, model.springref, 0.0)
    lo = _per_dof(model, model.limit_lo, -np.inf)
    hi = _per_dof(model, model.limit_hi, np.inf)

    tau = -stiffness * (q - springref)
    over = jnp.maximum(q - hi, 0.0)
    under = jnp.maximum(lo - q, 0.0)
    tau += -model.limit_stiffness * over + model.limit_stiffness * under
    return tau


def damping_diagonal(model: SpatialModel, q):
    """Per-dof viscous coefficients (implicit): joint damping + limit damping."""
    damping = _per_dof(model, model.damping, 0.0)
    lo = _per_dof(model, model.limit_lo, -np.inf)
    hi = _per_dof(model, model.limit_hi, np.inf)
    in_violation = (q > hi) | (q < lo)
    return damping + jnp.where(in_violation, model.limit_damping, 0.0)


def stored_energy(model: SpatialModel, q, qd):
    """Total mechanical energy the state can release: kinetic + gravity PE +
    joint-spring PE + limit-spring PE + contact-spring PE.

    Every term the integrator can convert back into motion is included, so
    the physical inequality dE/dt <= P_actuator (damping, Coulomb friction
    and the contact normal damper only remove energy) holds exactly for the
    continuous dynamics — the energy_valve enforces its discrete analog.
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
        pen = jnp.maximum(radius - pts[:, 2], 0.0)
        # piecewise PE consistent with the fmax-capped normal spring:
        # quadratic below pen* = fmax/kp, linear (constant force) beyond.
        # With fmax = inf the linear branch would be inf * 0 = nan, so it
        # only exists for finite caps (pure quadratic otherwise).
        if np.isfinite(model.contact_fmax):
            pen_star = model.contact_fmax / model.contact_kp
            quad = 0.5 * model.contact_kp * jnp.minimum(pen, pen_star) ** 2
            lin = model.contact_fmax * jnp.maximum(pen - pen_star, 0.0)
            e += jnp.sum(quad + lin)
        else:
            e += jnp.sum(0.5 * model.contact_kp * pen**2)
    return e


def actuation(model: SpatialModel, ctrl):
    """Map [A] controls to [ndof] torques (torque = gear * ctrl)."""
    tau = jnp.zeros(model.ndof)
    if len(model.actuator_dof) == 0:
        return tau
    dofs = np.asarray(model.actuator_dof)
    gear = jnp.asarray(model.gear, jnp.float32)
    return tau.at[dofs].add(gear * ctrl)


def step(model: SpatialModel, q, qd, ctrl):
    """One control step = n_substeps semi-implicit Euler substeps (scan).

    Same hot-path split as planar.step: mass matrix + implicit-damping
    Cholesky + Coriolis/gravity bias once per control step (smooth terms);
    only the stiff contact and spring/limit forces re-evaluate per substep.
    """
    n = model.ndof
    tau_ctrl = actuation(model, ctrl)
    dt_sub = model.dt / model.n_substeps

    M = mass_matrix(model, q) + 1e-6 * jnp.eye(n)
    D = damping_diagonal(model, q)
    lhs = M + dt_sub * jnp.diag(D)
    L = cholesky_unrolled(lhs, n)
    bias = bias_forces(model, q, qd)

    max_qd = jnp.asarray(model.max_qd, jnp.float32)   # scalar or [ndof]

    def body(carry, _):
        q_, qd_, work = carry
        if np.isfinite(model.motor_omega_max):
            speed_factor = jnp.clip(
                1.0 - qd_ * jnp.sign(tau_ctrl) / model.motor_omega_max, 0.0, 1.0)
            tau = tau_ctrl * speed_factor
        else:
            tau = tau_ctrl
        rhs = (tau + spring_forces(model, q_)
               + contact_forces(model, q_, qd_) - bias)
        qd_new = cholesky_solve_unrolled(L, M @ qd_ + dt_sub * rhs, n)
        qd_new = jnp.clip(qd_new, -max_qd, max_qd)
        q_new = q_ + dt_sub * qd_new
        # discrete actuator work (torque through the displacement it caused)
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
        # energy is kinetic; potential terms depend on q alone)
        scale2 = jnp.clip((ke1 - excess) / jnp.maximum(ke1, 1e-9), 0.0, 1.0)
        qd_new = qd_new * jnp.sqrt(scale2)
    return q_new, qd_new
