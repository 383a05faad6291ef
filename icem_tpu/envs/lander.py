"""Continuous lunar lander.

Capability-parity replacement for the reference's Box2D-backed
ContinuousLunarLander (icem/environments/classic.py:48-50). Rigid-body
lander with main + side thrusters, gravity, and leg ground contact; the
observation layout and the default masked-L2 cost over
goal_state [0,0,0,0,0,0,1,1] with legs masked out match the reference
wrapper exactly.

Obs (8) = [x, y, vx, vy, angle, angular_vel, leg1_contact, leg2_contact].
Action (2) = [main_throttle, side_throttle] in [-1, 1]; the main engine
fires only for throttle > 0, side engines for |side| > 0.5 — gym's
continuous-action semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.base import BoxSpace, Env


class ContinuousLunarLander(Env):
    name = "ContinuousLunarLander"
    goal_state = np.array([0, 0, 0, 0, 0, 0, 1, 1], np.float32)
    goal_mask = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)
    dt = 0.02  # 50 fps
    gravity = 1.625  # in scaled viewport units like the original
    main_power = 4.0
    side_power = 0.6
    leg_span = 0.12

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.action_space = BoxSpace(low=[-1.0, -1.0], high=[1.0, 1.0])
        self.observation_space = BoxSpace(low=[-np.inf] * 8, high=[np.inf] * 8)

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        x = jax.random.uniform(k1, (), minval=-0.2, maxval=0.2)
        fx = jax.random.uniform(k2, (2,), minval=-0.3, maxval=0.3)
        # [x, y, vx, vy, angle, omega]
        return jnp.stack([x, 1.4, fx[0], 0.0, fx[1] * 0.2, 0.0])

    def _legs(self, state):
        x, y, ang = state[..., 0], state[..., 1], state[..., 4]
        leg_y = y - 0.1 * jnp.cos(ang)
        l1 = (leg_y - self.leg_span * jnp.sin(ang) <= 0.0)
        l2 = (leg_y + self.leg_span * jnp.sin(ang) <= 0.0)
        return l1.astype(jnp.float32), l2.astype(jnp.float32)

    def observation(self, state):
        l1, l2 = self._legs(state)
        return jnp.concatenate([state, l1[..., None] if state.ndim > 1 else l1[None],
                                l2[..., None] if state.ndim > 1 else l2[None]],
                               axis=-1)

    def step(self, state, action):
        x, y, vx, vy, ang, omega = (state[0], state[1], state[2],
                                    state[3], state[4], state[5])
        a = jnp.clip(action, -1.0, 1.0)
        # gym semantics: main fires for a[0] > 0 at 50-100% power
        main = jnp.where(a[0] > 0.0, 0.5 + 0.5 * jnp.clip(a[0], 0.0, 1.0), 0.0)
        side = jnp.where(jnp.abs(a[1]) > 0.5, jnp.sign(a[1])
                         * (0.5 + 0.5 * (jnp.abs(a[1]) - 0.5) * 2), 0.0)

        thrust_x = -jnp.sin(ang) * main * self.main_power
        thrust_y = jnp.cos(ang) * main * self.main_power

        on_ground = y <= 0.1
        vx = vx + self.dt * thrust_x
        vy = vy + self.dt * (thrust_y - self.gravity)
        omega = omega + self.dt * side * self.side_power * 10.0
        # classify on the IMPACT velocity, before ground damping rewrites it:
        # a hard vertical slam must be a crash, not a +10 landing
        vy_impact = vy
        # ground contact: support + strong damping
        vy = jnp.where(on_ground & (vy < 0), -0.2 * vy, vy)
        vx = jnp.where(on_ground, vx * 0.8, vx)
        omega = jnp.where(on_ground, omega * 0.8, omega)

        x = x + self.dt * vx
        y = jnp.maximum(y + self.dt * vy, 0.1)
        ang = ang + self.dt * omega
        new_state = jnp.stack([x, y, vx, vy, ang, omega])
        obs = self.observation(new_state)

        landed = on_ground & (jnp.abs(vx) < 0.1) & (jnp.abs(ang) < 0.2) \
            & (jnp.abs(x) < 0.2) & (jnp.abs(vy_impact) < 1.0)
        crashed = on_ground & ((jnp.abs(ang) > 0.6) | (jnp.abs(vy_impact) > 1.0))
        shaping = -(jnp.abs(x) + jnp.abs(y) + 0.3 * (jnp.abs(vx) + jnp.abs(vy))
                    + jnp.abs(ang))
        reward = shaping - 0.3 * main - 0.03 * jnp.abs(side) \
            + 10.0 * landed.astype(jnp.float32)
        done = (landed | crashed).astype(jnp.float32)
        return new_state, obs, reward, done

    def state_from_observation(self, observation):
        return observation[..., :6]
