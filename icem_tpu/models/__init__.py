"""Forward-model factory (mirrors icem/models/__init__.py:11-26)."""

from importlib import import_module

_MODEL_REGISTRY = {
    "GroundTruthModel": ("icem_tpu.models.ground_truth", "GroundTruthModel"),
    "ParallelGroundTruthModel": ("icem_tpu.models.ground_truth", "ParallelGroundTruthModel"),
    "EnsembleModel": ("icem_tpu.models.ensemble", "EnsembleModel"),
    "RSSM": ("icem_tpu.models.rssm", "RSSMModel"),
}


def forward_model_from_string(model_str: str):
    if model_str not in _MODEL_REGISTRY:
        raise ImportError(f"add '{model_str}' entry to the model registry; "
                          f"known: {sorted(_MODEL_REGISTRY)}")
    module_name, class_name = _MODEL_REGISTRY[model_str]
    return getattr(import_module(module_name), class_name)


def register_model(name: str, module: str, class_name: str):
    _MODEL_REGISTRY[name] = (module, class_name)
