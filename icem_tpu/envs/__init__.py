"""Environment factory.

String->class registry mirroring the reference's env_from_string
(icem/environments/__init__.py:25-65) so reference settings files resolve
unchanged. All envs are pure-JAX dynamics (no MuJoCo build locks to break).
"""

from importlib import import_module

_ENV_REGISTRY = {
    # classic control (reference .classic)
    "DiscreteMountainCar": ("icem_tpu.envs.classic", "DiscreteActionMountainCar"),
    "DiscreteCartPole": ("icem_tpu.envs.classic", "DiscreteActionCartPole"),
    "ContinuousMountainCar": ("icem_tpu.envs.classic", "ContinuousMountainCar"),
    "ContinuousPendulum": ("icem_tpu.envs.classic", "ContinuousPendulum"),
    "ContinuousLunarLander": ("icem_tpu.envs.lander", "ContinuousLunarLander"),
    # locomotion (reference .mujoco)
    "HalfCheetah": ("icem_tpu.envs.cheetah", "HalfCheetah"),
    "Hopper": ("icem_tpu.envs.hopper", "Hopper"),
    "Reacher": ("icem_tpu.envs.reacher", "Reacher"),
    "Ant": ("icem_tpu.envs.ant3d", "Ant3D"),
    "PlanarAnt": ("icem_tpu.envs.ant", "Ant"),  # round-2 sagittal model
    "HumanoidStandup": ("icem_tpu.envs.humanoid3d", "HumanoidStandup3D"),
    "Humanoid": ("icem_tpu.envs.humanoid3d", "Humanoid3D"),
    # round-2 sagittal models
    "PlanarHumanoidStandup": ("icem_tpu.envs.humanoid", "HumanoidStandup"),
    "PlanarHumanoid": ("icem_tpu.envs.humanoid", "Humanoid"),
    # goal-conditioned manipulation (reference .robotics)
    "FetchPickAndPlace": ("icem_tpu.envs.fetch", "FetchPickAndPlace"),
    "FetchReach": ("icem_tpu.envs.fetch", "FetchReach"),
    # dm-suite flavors (reference .dm_suite)
    "cartpole": ("icem_tpu.envs.dm_suite", "CartPoleSuite"),
    "reacher": ("icem_tpu.envs.dm_suite", "ReacherSuite"),
    "restricted_reacher": ("icem_tpu.envs.dm_suite", "RestrictedReacherSuite"),
    "point_mass": ("icem_tpu.envs.dm_suite", "DoubleIntSuite"),
    "restricted_point_mass": ("icem_tpu.envs.dm_suite", "RestrictedDoubleIntSuite"),
    "cheetah": ("icem_tpu.envs.dm_suite", "HalfCheetahSuite"),
    "swimmer": ("icem_tpu.envs.dm_suite", "SwimmerSuite"),
    # Adroit hand manipulation (reference .mjenvs)
    "Door": ("icem_tpu.envs.adroit", "Door"),
    "Relocate": ("icem_tpu.envs.adroit", "Relocate"),
}


def env_from_string(env_string: str, **env_params):
    if env_string not in _ENV_REGISTRY:
        raise ImportError(f"add '{env_string}' entry to the env registry; "
                          f"known: {sorted(_ENV_REGISTRY)}")
    module_name, class_name = _ENV_REGISTRY[env_string]
    module = import_module(module_name)
    cls = getattr(module, class_name)
    return cls(name=env_string, **env_params)


def register_env(name: str, module: str, class_name: str):
    """Extension hook for user environments."""
    _ENV_REGISTRY[name] = (module, class_name)
