"""Fetch goal-conditioned manipulation (Reach, Pick&Place).

Capability-parity replacements for the reference's gym-robotics wrappers
(icem/environments/robotics.py). The gym originals drive a 7-dof Fetch arm
through MuJoCo mocap welds; the actual CONTROL interface is end-effector
deltas — so the TPU-native env models exactly that interface: a workspace-
clamped end-effector integrator, symmetric gripper fingers, and a grasp-
carry object model with table support and gravity.

Matched reference behavior:
- flattened observation = [observation, desired_goal]
  (robotics.py:75-81): PickAndPlace 25+3 = 28, Reach 10+3 = 13
- goal/achieved index sets: PickAndPlace achieved = obs[3:6] (object),
  goal = obs[25:28]; Reach achieved = obs[0:3] (gripper), goal = obs[10:13]
  (robotics.py:49-57, 192-201)
- sparse or dense thresholded cost, with optional shaped end-effector term
  for PickAndPlace (robotics.py:150-164); is_success on next_obs
- fixed_object_pos / fixed_goal (in gripper-relative range units) and the
  in-the-air goal sampling coin flip (robotics.py:108-148)
- ground-truth state = [sim-state, goal] so planners can restore exactly
  (robotics.py:97-103)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.base import BoxSpace, MaskedGoalSpaceEnv

# workspace geometry (gym fetch ballpark)
GRIPPER_INIT = np.array([1.34, 0.75, 0.53], np.float32)
TABLE_HEIGHT = 0.425
OBJ_HALF_HEIGHT = 0.025
WS_LOW = np.array([1.05, 0.40, TABLE_HEIGHT + 0.0], np.float32)
WS_HIGH = np.array([1.60, 1.10, 0.95], np.float32)
POS_SCALE = 0.05      # action -> EE displacement per step
GRIP_SCALE = 0.015
OBJ_RANGE = 0.15
TARGET_RANGE = 0.15


class _FetchBase(MaskedGoalSpaceEnv):
    dt = 0.04
    has_object = False
    obs_core_dim = 10

    def __init__(self, *, sparse: bool, threshold: float = 0.05,
                 fixed_goal=None, **kwargs):
        core = self.obs_core_dim
        goal_idx = np.arange(core, core + 3)
        achieved = [3, 4, 5] if self.has_object else [0, 1, 2]
        super().__init__(goal_idx=goal_idx, achieved_goal_idx=achieved,
                         sparse=sparse, threshold=threshold, **kwargs)
        self.fixed_goal = None if fixed_goal is None \
            else np.asarray(fixed_goal, np.float32)
        self.action_space = BoxSpace(low=[-1.0] * 4, high=[1.0] * 4)
        self.observation_space = BoxSpace(low=[-np.inf] * (core + 3),
                                          high=[np.inf] * (core + 3))
        self.supports_state_from_obs = False  # robotics.py:105-106 semantics

    def state_from_observation(self, observation):
        raise NotImplementedError(
            f"{self.name} env needs the real GT states to be reset")

    # -- goal sampling (robotics.py:129-148) -------------------------------
    def _sample_goal(self, key):
        if self.fixed_goal is not None:
            if self.has_object:
                goal = jnp.asarray(GRIPPER_INIT) + \
                    jnp.asarray(self.fixed_goal) * TARGET_RANGE
                goal = goal.at[2].set(TABLE_HEIGHT + OBJ_HALF_HEIGHT)
                goal = goal.at[2].add(self.fixed_goal[2] * 0.45)
            else:
                goal = jnp.asarray(GRIPPER_INIT) + jnp.asarray(self.fixed_goal)
            return goal
        k1, k2, k3 = jax.random.split(key, 3)
        if self.has_object:
            goal = jnp.asarray(GRIPPER_INIT) + jax.random.uniform(
                k1, (3,), minval=-TARGET_RANGE, maxval=TARGET_RANGE)
            goal = goal.at[2].set(TABLE_HEIGHT + OBJ_HALF_HEIGHT)
            in_air = jax.random.uniform(k2) < 0.5
            lift = jax.random.uniform(k3, minval=0.0, maxval=0.45)
            return goal.at[2].add(jnp.where(in_air, lift, 0.0))
        return jnp.asarray(GRIPPER_INIT) + jax.random.uniform(
            k1, (3,), minval=-0.15, maxval=0.15)


class FetchReach(_FetchBase):
    """reference: robotics.py:176-304 ("FetchReach").

    State = [ee (3), grip (1), ee_vel (3), goal (3)].
    Obs (13) = [grip_pos (3), finger state (2), grip velp (3),
    finger vel (2), goal (3)].
    """

    name = "FetchReach"
    obs_core_dim = 10
    has_object = False

    def init_state(self, key, mode: str = "train"):
        goal = self._sample_goal(key)
        ee = jnp.asarray(GRIPPER_INIT)
        return jnp.concatenate([ee, jnp.zeros(1), jnp.zeros(3), goal])

    def observation(self, state):
        ee, grip, vel, goal = (state[..., :3], state[..., 3:4],
                               state[..., 4:7], state[..., 7:10])
        half = grip / 2.0
        return jnp.concatenate([ee, half, half, vel * self.dt,
                                jnp.zeros_like(half), jnp.zeros_like(half),
                                goal], axis=-1)

    def step(self, state, action):
        ee, grip, _, goal = state[:3], state[3], state[4:7], state[7:10]
        action = jnp.clip(action, -1.0, 1.0)
        new_ee = jnp.clip(ee + action[:3] * POS_SCALE,
                          jnp.asarray(WS_LOW), jnp.asarray(WS_HIGH))
        vel = (new_ee - ee) / self.dt
        new_grip = jnp.clip(grip + action[3] * GRIP_SCALE, 0.0, 0.05)
        new_state = jnp.concatenate([new_ee, new_grip[None], vel, goal])
        obs = self.observation(new_state)
        reward = self.reward_fn(obs, action, obs)
        return new_state, obs, reward, jnp.float32(0.0)


class FetchPickAndPlace(_FetchBase):
    """reference: robotics.py:31-173 ("FetchPickAndPlace").

    State = [ee (3), grip (1), obj_pos (3), obj_vel (3), attached (1),
    goal (3)].
    Obs (28) = [grip_pos (3), obj_pos (3), obj_rel (3), fingers (2),
    obj_rot (3)=0, obj_velp (3), obj_velr (3)=0, grip_velp (3)=0,
    finger_vel (2), goal (3)].
    (obj_rot/obj_velr/grip_velp are zero-filled: the reduced point-gripper
    model carries no EE velocity or object rotation in its state; the slots
    keep the gym/reference 25-dim core layout so cost indices line up.)
    """

    name = "FetchPickAndPlace"
    obs_core_dim = 25
    has_object = True
    GRASP_DIST = 0.04      # EE-object distance below which closing grasps
    GRIP_CLOSED = 0.03     # finger opening below which the object is held
    CONTACT_DIST = 0.05    # EE-object overlap radius for pushing contact

    def __init__(self, *, sparse: bool, threshold: float = 0.05,
                 fixed_object_pos=None, fixed_goal=None,
                 shaped_reward: bool = False, **kwargs):
        super().__init__(sparse=sparse, threshold=threshold,
                         fixed_goal=fixed_goal, **kwargs)
        self.fixed_object_pos = None if fixed_object_pos is None \
            else np.asarray(fixed_object_pos, np.float32)
        self.shaped_reward = bool(shaped_reward)

    def init_state(self, key, mode: str = "train"):
        k1, k2 = jax.random.split(key)
        goal = self._sample_goal(k1)
        if self.fixed_object_pos is not None:
            obj_xy = jnp.asarray(GRIPPER_INIT[:2]) + \
                jnp.asarray(self.fixed_object_pos[:2]) * OBJ_RANGE
        else:
            # rejection-free analog of "resample until 0.1 away from gripper"
            # (robotics.py:114-124): sample an offset ring in [0.1, OBJ_RANGE]
            ka, kr = jax.random.split(k2)
            ang = jax.random.uniform(ka, (), minval=0.0, maxval=2 * jnp.pi)
            rad = jax.random.uniform(kr, (), minval=0.1, maxval=OBJ_RANGE)
            obj_xy = jnp.asarray(GRIPPER_INIT[:2]) + \
                rad * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
        obj = jnp.concatenate([obj_xy,
                               jnp.array([TABLE_HEIGHT + OBJ_HALF_HEIGHT])])
        ee = jnp.asarray(GRIPPER_INIT)
        return jnp.concatenate([ee, jnp.array([0.05]), obj, jnp.zeros(3),
                                jnp.zeros(1), goal])

    def observation(self, state):
        ee, grip = state[..., :3], state[..., 3:4]
        obj, obj_vel = state[..., 4:7], state[..., 7:10]
        goal = state[..., 11:14]
        rel = obj - ee
        half = grip / 2.0
        zeros3 = jnp.zeros_like(obj)
        return jnp.concatenate([
            ee, obj, rel, half, half, zeros3, obj_vel * self.dt, zeros3,
            zeros3, jnp.zeros_like(half), jnp.zeros_like(half), goal,
        ], axis=-1)

    def step(self, state, action):
        ee, grip = state[:3], state[3]
        obj, obj_vel = state[4:7], state[7:10]
        attached, goal = state[10], state[11:14]
        action = jnp.clip(action, -1.0, 1.0)

        new_ee = jnp.clip(ee + action[:3] * POS_SCALE,
                          jnp.asarray(WS_LOW), jnp.asarray(WS_HIGH))
        ee_vel = (new_ee - ee) / self.dt
        new_grip = jnp.clip(grip + action[3] * GRIP_SCALE, 0.0, 0.05)

        near = jnp.linalg.norm(obj - ee) < self.GRASP_DIST
        closing = new_grip < self.GRIP_CLOSED
        new_attached = jnp.where(near & closing, 1.0,
                                 jnp.where(closing, attached, 0.0))

        # attached: object rides the gripper; free: gravity + table support
        carried_pos = new_ee
        carried_vel = ee_vel
        free_vel = obj_vel.at[2].add(-9.81 * self.dt)
        free_vel = free_vel * jnp.array([0.8, 0.8, 1.0])  # table friction
        free_pos = obj + free_vel * self.dt

        # EE pushing contact: the gripper body displaces a free object it
        # sweeps through (the MuJoCo-contact behavior the gym env relies on).
        # Without this the box can only ever move via an exact grasp, and
        # the reference's dense-but-unshaped cost (robotics.py:150-164,
        # settings/fpp: shaped_reward=false) gives the planner ZERO gradient
        # — nudging the box is how iCEM discovers manipulation.
        delta = free_pos - new_ee
        dist = jnp.linalg.norm(delta)
        dirn = delta / jnp.maximum(dist, 1e-8)
        pen = jnp.maximum(self.CONTACT_DIST - dist, 0.0)
        free_pos = free_pos + dirn * pen
        free_vel = free_vel + dirn * pen / self.dt

        on_table = free_pos[2] <= TABLE_HEIGHT + OBJ_HALF_HEIGHT
        free_pos = free_pos.at[2].set(
            jnp.maximum(free_pos[2], TABLE_HEIGHT + OBJ_HALF_HEIGHT))
        free_vel = free_vel.at[2].set(jnp.where(on_table, 0.0, free_vel[2]))

        new_obj = jnp.where(new_attached > 0, carried_pos, free_pos)
        new_obj_vel = jnp.where(new_attached > 0, carried_vel, free_vel)

        new_state = jnp.concatenate([
            new_ee, new_grip[None], new_obj, new_obj_vel,
            new_attached[None], goal])
        obs = self.observation(new_state)
        reward = self.reward_fn(obs, action, obs)
        return new_state, obs, reward, jnp.float32(0.0)

    def cost_fn(self, observation, action, next_obs):
        """Sparse/dense with optional shaped EE term (robotics.py:150-164)."""
        dist_box_to_goal = jnp.linalg.norm(
            self.goal_from_observation(observation)
            - self.achieved_goal_from_observation(observation), axis=-1)
        dist_ee_to_box = 0.0
        if self.shaped_reward:
            dist_ee_to_box = jnp.linalg.norm(
                observation[..., :3] - observation[..., 3:6], axis=-1)
        if self.sparse:
            cost = (dist_box_to_goal > self.threshold).astype(jnp.float32)
            if self.shaped_reward:
                cost = cost + 0.1 * (dist_ee_to_box > self.threshold).astype(jnp.float32)
            return cost
        return dist_box_to_goal + 0.1 * dist_ee_to_box
