"""Controller factory.

Registry mirroring the reference controller_from_string
(icem/controllers/__init__.py:6-31).
"""

from importlib import import_module

_CONTROLLER_REGISTRY = {
    "mpc-icem": ("icem_tpu.controllers.icem", "MpcICem"),
    "mpc-cem-std": ("icem_tpu.controllers.cem_std", "MpcCemStd"),
    "mpc-random": ("icem_tpu.controllers.random", "MpcRandom"),
    "random": ("icem_tpu.controllers.random", "RndController"),
    "open-loop": ("icem_tpu.controllers.open_loop", "OpenLoopPolicy"),
}


def controller_from_string(controller_str: str):
    if controller_str not in _CONTROLLER_REGISTRY:
        raise ImportError(f"add '{controller_str}' entry to the controller registry; "
                          f"known: {sorted(_CONTROLLER_REGISTRY)}")
    module_name, class_name = _CONTROLLER_REGISTRY[controller_str]
    return getattr(import_module(module_name), class_name)


def register_controller(name: str, module: str, class_name: str):
    _CONTROLLER_REGISTRY[name] = (module, class_name)
