"""Humanoid environments on the planar engine.

Capability-parity replacements for the reference's MuJoCo humanoids
(icem/environments/mujoco.py:228-343). The humanoid here is a 10-body
SAGITTAL-PLANE model (pelvis root, torso+head, paired legs modeled as two
independent leg chains, one arm chain) — standing up and running are
predominantly sagittal motions, and the planar model keeps the same cost
structure and GT-state contract while running at TPU-native throughput.
Deviation from MuJoCo's 3D 17-actuator model (376-dim observation with
cinert/cvel/cfrc blocks) is deliberate and documented: those blocks are
MuJoCo-internal diagnostics unavailable outside its solver.

Observation layout is chosen so the REFERENCE cost formulas hold verbatim:
- qpos starts with [x, y(=0), z_absolute, ...] so HumanoidStandup's
  cost = -obs[..., 2] + 0.1*|a|^2 reads the true height (mujoco.py:259-277)
- qvel starts at index nq so Humanoid's x-velocity read at obs[..., nq]
  is the true root velocity (mujoco.py:317-343)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.base import BoxSpace, Env
from icem_tpu.envs.planar_base import PlanarEnv
from icem_tpu.envs.physics import planar
from icem_tpu.envs.physics.planar import PlanarModel

# body order: pelvis, torso(+head), l_thigh, l_shin, l_foot,
#             r_thigh, r_shin, r_foot, arm_upper, arm_lower
_TIPS = {
    "torso": (0.0, 0.45),        # up from pelvis
    "thigh": (0.0, -0.40),
    "shin": (0.0, -0.40),
    "foot": (0.16, -0.03),
    "arm_up": (0.0, -0.28),
    "arm_lo": (0.0, -0.26),
}
_Z0 = 0.89  # pelvis height at stance: thigh + shin + foot drop + foot radius


def make_humanoid_model(dt: float = 0.05, n_substeps: int = 20) -> PlanarModel:
    inf = np.inf
    t = _TIPS
    parent = (-1, 0, 0, 2, 3, 0, 5, 6, 1, 8)
    anchor = np.array([
        [0.0, _Z0],          # pelvis root offset
        [0.0, 0.1],          # torso on pelvis
        [0.0, -0.05],        # l_thigh at hip
        t["thigh"],          # l_shin at knee
        t["shin"],           # l_foot at ankle
        [0.0, -0.05],        # r_thigh at hip
        t["thigh"],          # r_shin
        t["shin"],           # r_foot
        [0.0, 0.40],         # arm at shoulder (on torso, near top)
        t["arm_up"],         # forearm at elbow
    ], np.float32)
    com = np.array([
        [0.0, 0.0],
        [0.0, 0.25],
        [0.0, -0.20], [0.0, -0.20], [0.08, -0.015],
        [0.0, -0.20], [0.0, -0.20], [0.08, -0.015],
        [0.0, -0.14], [0.0, -0.13],
    ], np.float32)
    masses = np.array([9.0, 14.0, 4.0, 2.5, 1.0, 4.0, 2.5, 1.0, 1.5, 1.2],
                      np.float32)
    lengths = np.array([0.2, 0.55, 0.4, 0.4, 0.19, 0.4, 0.4, 0.19, 0.28, 0.26],
                       np.float32)
    inertia = (masses * lengths**2 / 12.0).astype(np.float32)

    # geoms: feet toes/heels, knees, pelvis, torso top (head), elbow, hand
    geom_body = (4, 4, 7, 7, 3, 6, 0, 1, 9, 8)
    geom_pos = np.array([
        [0.16, -0.03], [-0.06, -0.03],      # l foot toe/heel
        [0.16, -0.03], [-0.06, -0.03],      # r foot toe/heel
        t["shin"], t["shin"],               # knees (on shins' ends)
        [0.0, 0.0],                         # pelvis
        [0.0, 0.55],                        # head (above torso tip)
        t["arm_lo"],                        # hand
        t["arm_up"],                        # elbow
    ], np.float32)
    geom_radius = np.array([0.05] * 4 + [0.05] * 2 + [0.09, 0.09, 0.04, 0.04],
                           np.float32)

    # dofs: [x, z, rot, torso, l_hip, l_knee, l_ankle, r_hip, r_knee,
    #        r_ankle, shoulder, elbow]  -> 12
    n_dof = 12
    return PlanarModel(
        parent=parent,
        anchor=anchor,
        com=com,
        mass=masses,
        inertia=inertia,
        free_root=True,
        geom_body=geom_body,
        geom_pos=geom_pos,
        geom_radius=geom_radius,
        actuator_dof=tuple(range(3, n_dof)),
        gear=np.array([100, 150, 120, 90, 150, 120, 90, 40, 40], np.float32),
        damping=np.concatenate([np.zeros(3),
                                np.full(9, 4.0)]).astype(np.float32),
        stiffness=np.concatenate([np.zeros(3),
                                  np.full(9, 8.0)]).astype(np.float32),
        springref=np.zeros(n_dof, np.float32),
        limit_lo=np.array([-inf, -inf, -inf, -0.8,
                           -2.0, -2.4, -0.8, -2.0, -2.4, -0.8,
                           -3.0, -2.6], np.float32),
        limit_hi=np.array([inf, inf, inf, 0.8,
                           0.8, 0.0, 0.8, 0.8, 0.0, 0.8,
                           1.2, 0.0], np.float32),
        limit_stiffness=600.0,
        limit_damping=10.0,
        contact_kp=1.2e4,
        contact_kd=60.0,
        contact_fmax=900.0,    # per-geom; feet pairs still carry ~4x weight
        friction_mu=1.0,
        friction_kt=250.0,
        max_qd=25.0,
        motor_omega_max=8.0,   # power-limited joints: can push up, not fly
        dt=dt,
        n_substeps=n_substeps,
    )


class _HumanoidBase(PlanarEnv):
    nq = 13   # [x, y(=0), z, rot, 9 joints] — y is a constant-zero filler so
    nv = 13   # reference index arithmetic (height at 2, vx at nq) holds
    dt = 0.05
    n_joints = 9

    def __init__(self, *, frame_skip=None, **kwargs):
        super().__init__(**kwargs)
        n_substeps = 20 if frame_skip is None else 4 * int(frame_skip)
        self.model = make_humanoid_model(dt=self.dt, n_substeps=n_substeps)
        self.action_space = BoxSpace(low=[-1.0] * 9, high=[1.0] * 9)
        obs_dim = self.nq + self.nv
        self.observation_space = BoxSpace(low=[-np.inf] * obs_dim,
                                          high=[np.inf] * obs_dim)

    # engine q: [x, z_off, rot, joints(9)] (12); state = [q, qd] (24)
    def observation(self, state):
        q, qd = state[..., :12], state[..., 12:]
        zeros = jnp.zeros(q.shape[:-1] + (1,))
        z_abs = q[..., 1:2] + _Z0
        qpos = jnp.concatenate([q[..., 0:1], zeros, z_abs, q[..., 2:]], axis=-1)
        qvel = jnp.concatenate([qd[..., 0:1], zeros, qd[..., 1:2], qd[..., 2:]],
                               axis=-1)
        return jnp.concatenate([qpos, qvel], axis=-1)

    def state_from_observation(self, observation):
        qpos, qvel = observation[..., :self.nq], observation[..., self.nq:]
        q = jnp.concatenate([qpos[..., 0:1], qpos[..., 2:3] - _Z0,
                             qpos[..., 3:]], axis=-1)
        qd = jnp.concatenate([qvel[..., 0:1], qvel[..., 2:3], qvel[..., 3:]],
                             axis=-1)
        return jnp.concatenate([q, qd], axis=-1)



class HumanoidStandup(_HumanoidBase):
    """reference: environments/mujoco.py:228-277 ("HumanoidStandup").

    Starts lying supine; cost = -height + 0.1*|a|^2 on the CURRENT obs.
    """

    name = "HumanoidStandup"

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        q = jnp.zeros(12)
        # supine: rotated backward, pelvis near the ground, legs slightly bent
        q = q.at[1].set(0.12 - _Z0)      # z offset: pelvis at ~0.12 abs
        q = q.at[2].set(-jnp.pi / 2 + 0.05)
        q = q + 0.01 * jax.random.uniform(k1, (12,), minval=-1.0, maxval=1.0)
        qd = 0.01 * jax.random.normal(k2, (12,))
        return jnp.concatenate([q, qd])

    def _post_step(self, state, new_state, action):
        obs = self.observation(new_state)
        height = obs[2]
        ctrl = 0.1 * jnp.sum(jnp.square(action))
        # uph_cost analog: reward height gain rate minus control cost
        reward = height / self.dt * 0.04 - ctrl + 1.0
        return obs, reward, jnp.float32(0.0)

    def cost_fn(self, observation, action, next_obs):
        """Exact reference formula: -height + 0.1*|a|^2 (mujoco.py:259-277)."""
        up = observation[..., 2]
        ctrl_cost = 0.1 * jnp.sum(jnp.square(action), axis=-1)
        return -up + ctrl_cost


class Humanoid(_HumanoidBase):
    """reference: environments/mujoco.py:280-343 ("Humanoid", running)."""

    name = "Humanoid"
    _healthy_z_range = (0.6, 1.5)
    _ctrl_cost_weight = 0.1
    _forward_reward_weight = 1.25

    def __init__(self, *, exclude_current_positions_from_observation: bool = False,
                 **kwargs):
        super().__init__(**kwargs)
        self._exclude_current_positions = bool(exclude_current_positions_from_observation)

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        q = 0.01 * jax.random.uniform(k1, (12,), minval=-1.0, maxval=1.0)
        qd = 0.01 * jax.random.normal(k2, (12,))
        return jnp.concatenate([q, qd])

    def _post_step(self, state, new_state, action):
        obs = self.observation(new_state)
        x_vel = obs[self.nq]
        z = obs[2]
        healthy = ((z > self._healthy_z_range[0])
                   & (z < self._healthy_z_range[1])).astype(jnp.float32)
        reward = (self._forward_reward_weight * x_vel + 5.0 * healthy
                  - self._ctrl_cost_weight * jnp.sum(jnp.square(action)))
        return obs, reward, 1.0 - healthy

    def unhealthy_states(self, states):
        z = states[..., 2]
        healthy = (z > self._healthy_z_range[0]) & (z < self._healthy_z_range[1])
        finite = jnp.all(jnp.isfinite(states), axis=-1)
        return 1.0 - (healthy & finite).astype(jnp.float32)

    def cost_fn(self, observation, action, next_obs):
        """Exact reference formula (mujoco.py:317-343): -w*x_vel + 100*unhealthy
        + ctrl cost, velocity read at index nq."""
        unhealthy = self.unhealthy_states(observation)
        x_velocity = observation[..., self.nq]
        control_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action), axis=-1)
        return (-self._forward_reward_weight * x_velocity
                + 100.0 * unhealthy + control_cost)
