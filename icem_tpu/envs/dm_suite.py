"""dm_control-suite-flavored environments.

The reference wraps dm_control tasks through a gym bridge and overrides costs
and episode-init behavior (icem/environments/dm_suite.py, dm2gym.py). Here
the same task semantics run on pure-JAX dynamics:

- CartPoleSuite: swing-up cart-pole; obs [x, cos, sin, xd, thd]; default
  masked-L2 cost on (cos, sin) vs (1, 0) (dm_suite.py:12-24)
- ReacherSuite / RestrictedReacherSuite: in icem_tpu.envs.reacher
- DoubleIntSuite / RestrictedDoubleIntSuite: point mass, goal at origin,
  mode-dependent init randomization (dm_suite.py:120-185)
- HalfCheetahSuite: the cheetah with position included in obs (18-dim) and
  the same velocity cost (dm_suite.py:188-249)
- SwimmerSuite: 6-link swimmer with anisotropic fluid drag; obs =
  [joints (5), nose_to_target (2), body velocities (18)];
  cost = |nose_to_target| at obs[..., -20:-18] (dm_suite.py:252-261)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.base import BoxSpace, Env
from icem_tpu.envs.cheetah import HalfCheetah
from icem_tpu.envs.classic import PointMass
from icem_tpu.envs.planar_base import PlanarEnv
from icem_tpu.envs.physics import planar
from icem_tpu.envs.physics.planar import PlanarModel
from icem_tpu.envs.reacher import ReacherSuite, RestrictedReacherSuite  # noqa: F401 (factory)


class CartPoleSuite(Env):
    """Continuous-force cart-pole swing-up.

    State [x, theta, xd, thd]; obs [x, cos, sin, xd, thd]; cost via
    goal_state/goal_mask exactly like the reference wrapper
    (dm_suite.py:15-16): only the angle matters.
    """

    name = "cartpole"
    goal_state = np.array([0.0, 1.0, 0.0, 0.0, 0.0], np.float32)
    goal_mask = np.array([0.0, 1.0, 1.0, 0.0, 0.0], np.float32)
    # dm_control's cartpole runs a 0.01 s physics step (10 s limit = 1000
    # steps; PlaNet's action_repeat=8 -> 0.08 s control hold). 0.02 (the gym
    # value) doubles the hold to 0.16 s — at the inverted-pendulum
    # instability timescale sqrt(L/g) ~ 0.23 s — and makes stabilization
    # after swing-up practically impossible for ANY h=12 planner (measured:
    # GT-model iCEM tail cost 1.15 at dt=0.02 vs 0.04 at dt=0.01).
    dt = 0.01
    gravity = 9.81
    masscart = 1.0
    masspole = 0.1
    pole_half_length = 0.5
    force_mag = 10.0
    x_limit = 1.8

    def __init__(self, *, task_name: str = "swingup", task_kwargs=None, **kwargs):
        kwargs.pop("visualize_reward", None)
        kwargs.pop("render_mode", None)
        super().__init__(**kwargs)
        self.task_name = task_name
        self.action_space = BoxSpace(low=[-1.0], high=[1.0])
        self.observation_space = BoxSpace(low=[-np.inf] * 5, high=[np.inf] * 5)

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        if self.task_name == "swingup":
            theta = jnp.pi + jax.random.uniform(k1, (), minval=-0.1, maxval=0.1)
        else:  # balance
            theta = jax.random.uniform(k1, (), minval=-0.1, maxval=0.1)
        x = jax.random.uniform(k2, (), minval=-0.1, maxval=0.1)
        return jnp.stack([x, theta, 0.0 * x, 0.0 * x])

    def observation(self, state):
        x, theta, xd, thd = (state[..., 0], state[..., 1],
                             state[..., 2], state[..., 3])
        return jnp.stack([x, jnp.cos(theta), jnp.sin(theta), xd, thd], axis=-1)

    def step(self, state, action):
        x, theta, xd, thd = state[0], state[1], state[2], state[3]
        force = jnp.clip(action[0], -1.0, 1.0) * self.force_mag

        total_mass = self.masscart + self.masspole
        pml = self.masspole * self.pole_half_length
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        temp = (force + pml * thd**2 * sin_t) / total_mass
        th_acc = (self.gravity * sin_t - cos_t * temp) / (
            self.pole_half_length * (4.0 / 3.0 - self.masspole * cos_t**2 / total_mass))
        x_acc = temp - pml * th_acc * cos_t / total_mass

        xd = xd + self.dt * x_acc
        x = jnp.clip(x + self.dt * xd, -self.x_limit, self.x_limit)
        thd = thd + self.dt * th_acc
        theta = theta + self.dt * thd
        new_state = jnp.stack([x, theta, xd, thd])
        obs = self.observation(new_state)
        reward = -self.cost_fn(obs, action, obs)
        return new_state, obs, reward, jnp.float32(0.0)

    def state_from_observation(self, observation):
        theta = jnp.arctan2(observation[..., 2], observation[..., 1])
        return jnp.stack([observation[..., 0], theta,
                          observation[..., 3], observation[..., 4]], axis=-1)


class DoubleIntSuite(PointMass):
    """dm-suite point_mass flavor (dm_suite.py:120-161)."""

    name = "point_mass"

    def __init__(self, *, task_name: str = "easy", task_kwargs=None,
                 init_std=None, **kwargs):
        kwargs.pop("visualize_reward", None)
        kwargs.pop("render_mode", None)
        super().__init__(goal=(0.0, 0.0), **kwargs)
        self.task_name = task_name
        self.init_std = init_std


class RestrictedDoubleIntSuite(DoubleIntSuite):
    """Init near (0.2, 0.1) with mode-dependent noise (dm_suite.py:164-185)."""

    name = "restricted_point_mass"

    def __init__(self, *, init_std=0.05, init_std_eval=None, **kwargs):
        super().__init__(**kwargs)
        self.init_std = float(init_std) if init_std is not None else None
        self.init_std_eval = float(init_std_eval) if init_std_eval is not None else None

    def init_state(self, key, mode: str = "train"):
        std = self.init_std
        if mode == "evaluate" and self.init_std_eval is not None:
            std = self.init_std_eval
        if std is None:
            return super().init_state(key, mode)
        pos = jnp.array([0.2, 0.1]) + jax.random.uniform(
            key, (2,), minval=-std, maxval=std)
        return jnp.concatenate([pos, jnp.zeros(2)])


class HalfCheetahSuite(HalfCheetah):
    """Cheetah with positions included in the observation (18-dim), same
    velocity cost (dm_suite.py:188-249)."""

    name = "cheetah"

    def __init__(self, *, task_name: str = "run", task_kwargs=None,
                 penalise_flipping: bool = True, **kwargs):
        kwargs.pop("visualize_reward", None)
        kwargs.pop("render_mode", None)
        kwargs.pop("exclude_current_positions_from_observation", None)
        super().__init__(exclude_current_positions_from_observation=False,
                         penalise_flipping=penalise_flipping, **kwargs)
        self.task_name = task_name


def make_swimmer_model(n_links: int = 6, link_len: float = 0.1,
                       dt: float = 0.03, n_substeps: int = 6) -> PlanarModel:
    inf = np.inf
    masses = np.full(n_links, 0.1, np.float32)
    inertia = np.full(n_links, planar.chain_link_inertia(0.1, link_len), np.float32)
    # chain along +x; root is the head link
    anchor = np.zeros((n_links, 2), np.float32)
    anchor[1:, 0] = -link_len  # each child attaches at the parent's tail
    com = np.tile(np.array([-link_len / 2, 0.0], np.float32), (n_links, 1))
    n_dof = 3 + n_links - 1
    return PlanarModel(
        parent=tuple([-1] + list(range(n_links - 1))),
        anchor=anchor,
        com=com,
        mass=masses,
        inertia=inertia,
        free_root=True,
        actuator_dof=tuple(range(3, n_dof)),
        gear=np.full(n_links - 1, 0.25, np.float32),
        damping=np.concatenate([np.zeros(3), np.full(n_links - 1, 0.02)]).astype(np.float32),
        stiffness=np.zeros(n_dof, np.float32),
        springref=np.zeros(n_dof, np.float32),
        limit_lo=np.concatenate([np.full(3, -inf), np.full(n_links - 1, -1.75)]).astype(np.float32),
        limit_hi=np.concatenate([np.full(3, inf), np.full(n_links - 1, 1.75)]).astype(np.float32),
        drag_normal=np.full(n_links, 12.0, np.float32),
        drag_tangent=np.full(n_links, 0.4, np.float32),
        drag_angular=np.full(n_links, 0.05, np.float32),
        gravity=0.0,  # top-down plane
        dt=dt,
        n_substeps=n_substeps,
    )


class SwimmerSuite(PlanarEnv):
    """6-link swimmer chasing a target (dm_suite.py:252-261).

    A PlanarEnv: fluid drag now runs in the batched engine, so population
    rollouts take the VPU row layout / Pallas kernel fast path.

    State = [q (8 = 3 root + 5 joints), qd (8), target_xy (2)].
    Obs (25) = [joint angles (5), nose_to_target (2), per-link
    (vx, vy, omega) body velocities (18)]; cost = |obs[..., 5:7]|
    (== obs[..., -20:-18], matching the reference index arithmetic).
    """

    name = "swimmer"
    n_links = 6
    link_len = 0.1
    dt = 0.03

    def __init__(self, *, task_name: str = "swimmer6", task_kwargs=None, **kwargs):
        kwargs.pop("visualize_reward", None)
        kwargs.pop("render_mode", None)
        super().__init__(**kwargs)
        self.task_name = task_name
        self.model = make_swimmer_model(self.n_links, self.link_len, self.dt)
        n_act = self.n_links - 1
        self.action_space = BoxSpace(low=[-1.0] * n_act, high=[1.0] * n_act)
        self.observation_space = BoxSpace(low=[-np.inf] * 25, high=[np.inf] * 25)
        self.supports_state_from_obs = False

    @property
    def _ndof(self):
        return 3 + self.n_links - 1

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        q = jnp.zeros(self._ndof)
        q = q.at[2].set(jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi))
        angle = jax.random.uniform(k2, (), minval=0.0, maxval=2 * jnp.pi)
        target = 0.4 * jnp.stack([jnp.cos(angle), jnp.sin(angle)])
        return jnp.concatenate([q, jnp.zeros(self._ndof), target])

    def observation(self, state):
        nd = self._ndof
        q, qd, target = state[..., :nd], state[..., nd:2 * nd], state[..., 2 * nd:]

        def single(q, qd, target):
            # one jvp gives primal AND tangent forward kinematics
            _, (vcom, vang) = jax.jvp(lambda q_: planar.fk(self.model, q_)[:2],
                                      (q,), (qd,))
            nose = q[0:2]
            body_vels = jnp.concatenate([vcom, vang[:, None]], axis=-1).ravel()
            return jnp.concatenate([q[3:], target - nose, body_vels])

        if state.ndim == 1:
            return single(q, qd, target)
        # arbitrary leading batch dims (base-contract): flatten, vmap, restore
        batch_shape = state.shape[:-1]
        flat = jax.vmap(single)(q.reshape(-1, nd), qd.reshape(-1, nd),
                                target.reshape(-1, target.shape[-1]))
        return flat.reshape(batch_shape + flat.shape[-1:])

    def _post_step(self, state, new_state, action):
        obs = self.observation(new_state)
        reward = -jnp.linalg.norm(obs[..., 5:7], axis=-1)
        return obs, reward, jnp.float32(0.0)

    def cost_fn(self, states, actions, next_states):
        return jnp.linalg.norm(states[..., -20:-18], axis=-1)
