"""Classic-control environments as pure-JAX dynamics.

Re-implements the gym classic-control dynamics the reference wraps
(icem/environments/classic.py) as traceable state-space maps. Costs,
goal states and masks match the reference wrappers exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.base import BoxSpace, DiscreteSpace, Env


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class ContinuousPendulum(Env):
    """Torque-limited pendulum swing-up (gym Pendulum-v0 dynamics).

    Cost matches the reference wrapper (environments/classic.py:70-75):
    angle^2 + 0.1*thdot^2 + 0.001*u^2 evaluated on the current observation.
    State: [theta, theta_dot]. Obs: [cos(theta), sin(theta), theta_dot].
    """

    name = "ContinuousPendulum"
    max_speed = 8.0
    max_torque = 2.0
    dt = 0.05
    g = 10.0
    m = 1.0
    length = 1.0

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.action_space = BoxSpace(low=[-self.max_torque], high=[self.max_torque])
        self.observation_space = BoxSpace(low=[-1.0, -1.0, -self.max_speed],
                                          high=[1.0, 1.0, self.max_speed])

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        return jnp.stack([theta, theta_dot])

    def observation(self, state):
        theta, theta_dot = state[..., 0], state[..., 1]
        return jnp.stack([jnp.cos(theta), jnp.sin(theta), theta_dot], axis=-1)

    def step(self, state, action):
        theta, theta_dot = state[0], state[1]
        u = jnp.clip(action[0], -self.max_torque, self.max_torque)
        cost = angle_normalize(theta) ** 2 + 0.1 * theta_dot**2 + 0.001 * u**2

        accel = 3.0 * self.g / (2.0 * self.length) * jnp.sin(theta) \
            + 3.0 / (self.m * self.length**2) * u
        new_theta_dot = jnp.clip(theta_dot + accel * self.dt, -self.max_speed, self.max_speed)
        new_theta = theta + new_theta_dot * self.dt

        new_state = jnp.stack([new_theta, new_theta_dot])
        return new_state, self.observation(new_state), -cost, jnp.float32(0.0)

    def state_from_observation(self, observation):
        theta = jnp.arctan2(observation[..., 1], observation[..., 0])
        return jnp.stack([theta, observation[..., 2]], axis=-1)

    def cost_fn(self, observation, action, next_obs):
        cos_t, sin_t, th_dot = observation[..., 0], observation[..., 1], observation[..., 2]
        theta = jnp.arctan2(sin_t, cos_t)
        act = jnp.squeeze(action, axis=-1) if action.shape[-1] == 1 else action[..., 0]
        return angle_normalize(theta) ** 2 + 0.1 * th_dot**2 + 0.001 * act**2


class ContinuousMountainCar(Env):
    """Continuous mountain car (gym Continuous_MountainCarEnv dynamics).

    Reference goal/mask: cost = |position - 0.5| (classic.py:33-35).
    State == observation: [position, velocity].
    """

    name = "ContinuousMountainCar"
    goal_state = np.array([0.5, 0.0], np.float32)
    goal_mask = np.array([1.0, 0.0], np.float32)
    min_position, max_position = -1.2, 0.6
    max_speed = 0.07
    goal_position = 0.45
    power = 0.0015
    dt = 1.0  # steps are unit-time in the gym env

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.action_space = BoxSpace(low=[-1.0], high=[1.0])
        self.observation_space = BoxSpace(
            low=[self.min_position, -self.max_speed],
            high=[self.max_position, self.max_speed])

    def get_fps(self):
        return 30.0

    def init_state(self, key, mode: str = "train"):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        return jnp.stack([pos, jnp.float32(0.0)])

    def observation(self, state):
        return state

    def step(self, state, action):
        position, velocity = state[0], state[1]
        force = jnp.clip(action[0], -1.0, 1.0)
        velocity = velocity + force * self.power - 0.0025 * jnp.cos(3.0 * position)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(position + velocity, self.min_position, self.max_position)
        velocity = jnp.where((position <= self.min_position) & (velocity < 0), 0.0, velocity)
        new_state = jnp.stack([position, velocity])
        done = (position >= self.goal_position).astype(jnp.float32)
        reward = 100.0 * done - 0.1 * force**2
        return new_state, new_state, reward, done

    def state_from_observation(self, observation):
        return observation


class DiscreteActionMountainCar(Env):
    """Discrete mountain car through the continuous embedding of base.DiscreteSpace.

    Dynamics are the gym MountainCarEnv: force = (index - 1) * 0.001.
    """

    name = "DiscreteMountainCar"
    goal_state = np.array([0.5, 0.0], np.float32)
    goal_mask = np.array([1.0, 0.0], np.float32)
    min_position, max_position = -1.2, 0.6
    max_speed = 0.07
    goal_position = 0.5
    force_mag = 0.001

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.action_space = DiscreteSpace(3)
        self.observation_space = BoxSpace(
            low=[self.min_position, -self.max_speed],
            high=[self.max_position, self.max_speed])

    def get_fps(self):
        return 30.0

    def init_state(self, key, mode: str = "train"):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        return jnp.stack([pos, jnp.float32(0.0)])

    def observation(self, state):
        return state

    def step(self, state, action):
        position, velocity = state[0], state[1]
        idx = self.action_space.index(action)
        velocity = velocity + (idx.astype(jnp.float32) - 1.0) * self.force_mag \
            - 0.0025 * jnp.cos(3.0 * position)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(position + velocity, self.min_position, self.max_position)
        velocity = jnp.where((position <= self.min_position) & (velocity < 0), 0.0, velocity)
        new_state = jnp.stack([position, velocity])
        done = (position >= self.goal_position).astype(jnp.float32)
        # gym pays -1 on EVERY step including the goal-reaching one
        return new_state, new_state, jnp.float32(-1.0), done

    def state_from_observation(self, observation):
        return observation


class DiscreteActionCartPole(Env):
    """Cart-pole balance (gym CartPoleEnv Euler dynamics), +-10 N discrete force.

    Reference default cost: unmasked L2 to the zero state (classic.py:28-30).
    State == observation: [x, x_dot, theta, theta_dot].
    """

    name = "DiscreteCartPole"
    goal_state = np.zeros(4, np.float32)
    goal_mask = np.ones(4, np.float32)
    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    pole_half_length = 0.5
    force_mag = 10.0
    dt = 0.02
    theta_threshold = 12 * 2 * np.pi / 360
    x_threshold = 2.4

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.action_space = DiscreteSpace(2)
        high = np.array([self.x_threshold * 2, np.inf, self.theta_threshold * 2, np.inf],
                        np.float32)
        self.observation_space = BoxSpace(low=-high, high=high)

    def init_state(self, key, mode: str = "train"):
        return jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)

    def observation(self, state):
        return state

    def step(self, state, action):
        x, x_dot, theta, theta_dot = state[0], state[1], state[2], state[3]
        idx = self.action_space.index(action)
        force = jnp.where(idx == 1, self.force_mag, -self.force_mag)

        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.pole_half_length
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        temp = (force + polemass_length * theta_dot**2 * sin_t) / total_mass
        theta_acc = (self.gravity * sin_t - cos_t * temp) / (
            self.pole_half_length * (4.0 / 3.0 - self.masspole * cos_t**2 / total_mass))
        x_acc = temp - polemass_length * theta_acc * cos_t / total_mass

        x = x + self.dt * x_dot
        x_dot = x_dot + self.dt * x_acc
        theta = theta + self.dt * theta_dot
        theta_dot = theta_dot + self.dt * theta_acc
        new_state = jnp.stack([x, x_dot, theta, theta_dot])

        done = ((jnp.abs(x) > self.x_threshold)
                | (jnp.abs(theta) > self.theta_threshold)).astype(jnp.float32)
        # gym pays +1 on every step, including the one where done turns True
        return new_state, new_state, jnp.float32(1.0), done

    def state_from_observation(self, observation):
        return observation


class PointMass(Env):
    """2-D double integrator driven by force actions (dm-suite point_mass
    analog, reference environments/dm_suite.py:120-185).

    State/obs: [x, y, vx, vy]; cost = distance of (x, y) to the goal.
    """

    name = "point_mass"
    dt = 0.05
    damping = 0.5

    def __init__(self, *, goal=(0.0, 0.0), restricted_init: bool = False, **kwargs):
        super().__init__(**kwargs)
        self.goal = np.asarray(goal, np.float32)
        self.restricted_init = restricted_init
        self.goal_state = np.array([*self.goal, 0.0, 0.0], np.float32)
        self.goal_mask = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
        self.action_space = BoxSpace(low=[-1.0, -1.0], high=[1.0, 1.0])
        self.observation_space = BoxSpace(low=[-np.inf] * 4, high=[np.inf] * 4)

    def init_state(self, key, mode: str = "train"):
        if self.restricted_init and mode == "evaluate":
            pos = jax.random.uniform(key, (2,), minval=0.25, maxval=0.3)
        else:
            pos = jax.random.uniform(key, (2,), minval=-0.3, maxval=0.3)
        return jnp.concatenate([pos, jnp.zeros(2)])

    def observation(self, state):
        return state

    def step(self, state, action):
        pos, vel = state[:2], state[2:]
        force = jnp.clip(action, -1.0, 1.0)
        vel = vel + self.dt * (force - self.damping * vel)
        pos = pos + self.dt * vel
        new_state = jnp.concatenate([pos, vel])
        reward = -jnp.linalg.norm(pos - jnp.asarray(self.goal))
        return new_state, new_state, reward, jnp.float32(0.0)

    def state_from_observation(self, observation):
        return observation
