"""Reacher: 2-link planar arm reaching a random target.

Gym-flavor Reacher (reference: icem/environments/mujoco.py:346-368) on the
pure-JAX engine (fixed base, no gravity — the arm moves in the horizontal
plane like the MuJoCo model):

- observation (11) = [cos q1, cos q2, sin q1, sin q2, target_xy (2),
  qvel (2), fingertip - target (3, z term always 0)]
- cost = |fingertip - target| from the observation tail
  (mujoco.py:366-368)
- state_from_observation reconstructs angles via atan2 and zeros the
  unobserved target velocity (mujoco.py:359-364)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.base import BoxSpace
from icem_tpu.envs.physics import planar
from icem_tpu.envs.physics.planar import PlanarModel
from icem_tpu.envs.planar_base import PlanarEnv


def make_arm_model(l1: float, l2: float, dt: float, n_substeps: int,
                   torque: float, damping: float) -> PlanarModel:
    m1, m2 = 0.1, 0.1
    inf = np.inf
    return PlanarModel(
        parent=(-1, 0),
        anchor=np.array([[0.0, 0.0], [l1, 0.0]], np.float32),
        com=np.array([[l1 / 2, 0.0], [l2 / 2, 0.0]], np.float32),
        mass=np.array([m1, m2], np.float32),
        inertia=np.array([planar.chain_link_inertia(m1, l1),
                          planar.chain_link_inertia(m2, l2)], np.float32),
        free_root=False,
        actuator_dof=(0, 1),
        gear=np.array([torque, torque], np.float32),
        damping=np.array([damping, damping], np.float32),
        stiffness=np.zeros(2, np.float32),
        springref=np.zeros(2, np.float32),
        limit_lo=np.array([-inf, -3.0], np.float32),
        limit_hi=np.array([inf, 3.0], np.float32),
        gravity=0.0,   # horizontal plane
        dt=dt,
        n_substeps=n_substeps,
    )


class TwoLinkArm(PlanarEnv):
    """Shared dynamics. State = [q1, q2, qd1, qd2, target_x, target_y].

    A PlanarEnv: the hinge-root batched engine (envs/physics/batched.py)
    and the Pallas rollout kernel serve the planner's population rollouts;
    physics goes through PlanarEnv._physics.
    """

    l1 = 0.1
    l2 = 0.11
    dt = 0.02
    torque = 0.05
    joint_damping = 0.01
    target_radius_range = (0.05, 0.20)

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.model = make_arm_model(self.l1, self.l2, self.dt, 4,
                                    self.torque, self.joint_damping)
        self.action_space = BoxSpace(low=[-1.0, -1.0], high=[1.0, 1.0])

    def fingertip(self, q):
        x = self.l1 * jnp.cos(q[..., 0]) + self.l2 * jnp.cos(q[..., 0] + q[..., 1])
        y = self.l1 * jnp.sin(q[..., 0]) + self.l2 * jnp.sin(q[..., 0] + q[..., 1])
        return jnp.stack([x, y], axis=-1)

    def _sample_target(self, key):
        k1, k2 = jax.random.split(key)
        angle = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
        radius = jax.random.uniform(k2, (), minval=self.target_radius_range[0],
                                    maxval=self.target_radius_range[1])
        return jnp.stack([radius * jnp.sin(angle), radius * jnp.cos(angle)])

class Reacher(TwoLinkArm):
    """Gym-flavor Reacher (reference mujoco.py:346-368)."""

    name = "Reacher"

    def __init__(self, *, frame_skip=None, **kwargs):
        super().__init__(**kwargs)
        self.observation_space = BoxSpace(low=[-np.inf] * 11, high=[np.inf] * 11)
        self.supports_state_from_obs = True

    def init_state(self, key, mode: str = "train"):
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1)
        qd = jax.random.uniform(k2, (2,), minval=-0.005, maxval=0.005)
        target = self._sample_target(k3)
        return jnp.concatenate([q, qd, target])

    def observation(self, state):
        q, qd, target = state[..., :2], state[..., 2:4], state[..., 4:6]
        tip = self.fingertip(q)
        diff = tip - target
        zeros = jnp.zeros(diff.shape[:-1] + (1,))
        return jnp.concatenate([
            jnp.cos(q), jnp.sin(q), target, qd,
            diff, zeros,
        ], axis=-1)

    def _post_step(self, state, new_state, action):
        obs = self.observation(new_state)
        dist = jnp.linalg.norm(obs[..., -3:], axis=-1)
        reward = -dist - jnp.sum(jnp.square(action))
        return obs, reward, jnp.float32(0.0)

    def state_from_observation(self, observation):
        theta1 = jnp.arctan2(observation[..., 2], observation[..., 0])
        theta2 = jnp.arctan2(observation[..., 3], observation[..., 1])
        return jnp.concatenate([
            jnp.stack([theta1, theta2], axis=-1),
            observation[..., 6:8],
            observation[..., 4:6],
        ], axis=-1)

    def cost_fn(self, observations, actions, next_observations):
        return jnp.linalg.norm(observations[..., -3:], axis=-1)


class ReacherSuite(TwoLinkArm):
    """dm-suite reacher flavor (reference dm_suite.py:28-38):
    observation (6) = [q1, q2, to_target_xy (2), qvel (2)];
    cost = |to_target| read from obs[..., 2:4]."""

    name = "reacher"

    def __init__(self, *, task_name: str = "easy", task_kwargs=None, **kwargs):
        kwargs.pop("visualize_reward", None)
        kwargs.pop("render_mode", None)
        super().__init__(**kwargs)
        self.task_name = task_name
        self.observation_space = BoxSpace(low=[-np.inf] * 6, high=[np.inf] * 6)

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        q = jax.random.uniform(k1, (2,), minval=-jnp.pi, maxval=jnp.pi)
        target = self._sample_target(k2)
        return jnp.concatenate([q, jnp.zeros(2), target])

    def observation(self, state):
        q, qd, target = state[..., :2], state[..., 2:4], state[..., 4:6]
        to_target = target - self.fingertip(q)
        return jnp.concatenate([q, to_target, qd], axis=-1)

    def _post_step(self, state, new_state, action):
        obs = self.observation(new_state)
        dist = jnp.linalg.norm(obs[..., 2:4], axis=-1)
        return obs, -dist, jnp.float32(0.0)

    def cost_fn(self, states, actions, next_states):
        return jnp.linalg.norm(states[..., 2:4], axis=-1)

    def state_from_observation(self, observation):
        q = observation[..., :2]
        qd = observation[..., 4:6]
        target = self.fingertip(q) + observation[..., 2:4]
        return jnp.concatenate([q, qd, target], axis=-1)


class RestrictedReacherSuite(ReacherSuite):
    """Mode-dependent init randomization around a fixed goal
    (reference dm_suite.py:79-117)."""

    name = "restricted_reacher"

    def __init__(self, *, goal_xcoor=-0.15, goal_ycoor=-0.1,
                 init_position_std_train=0.05, init_position_std_eval=0.1, **kwargs):
        super().__init__(**kwargs)
        self.goal = np.array([goal_xcoor, goal_ycoor], np.float32)
        self.init_position_std_train = float(init_position_std_train)
        self.init_position_std_eval = float(init_position_std_eval)

    def init_state(self, key, mode: str = "train"):
        # NOTE deliberate deviation: the reference maps mode=='evaluate' to
        # init_position_std_TRAIN and everything else to std_EVAL
        # (dm_suite.py:44-49) — a swapped lookup we do not replicate. The
        # fixed base joint pose mirrors its FixedPosPlusUniformRandom
        # (a constant draw from a fixed-seed RandomState plus uniform noise).
        std = self.init_position_std_eval if mode == "evaluate" \
            else self.init_position_std_train
        q = 1.0 + jax.random.uniform(key, (2,), minval=-std, maxval=std)
        return jnp.concatenate([q, jnp.zeros(2), jnp.asarray(self.goal)])
