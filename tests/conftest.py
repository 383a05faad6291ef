"""Test harness configuration.

Runs the suite on a CPU-simulated 8-device mesh so multi-chip sharding paths
(shard_map population sharding, collective top-k) execute in CI without TPU
hardware. Must set the XLA flags BEFORE jax is imported anywhere.
"""

import os
import sys

# ICEM_TESTS_TPU=1 runs on the real accelerator instead (e.g. for the
# Pallas kernel tests in test_pallas_rollout.py, which self-skip on CPU)
_USE_TPU = bool(os.environ.get("ICEM_TESTS_TPU"))

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _USE_TPU:
    # the TPU plugin in this image overrides JAX_PLATFORMS at import time;
    # the config update below wins as long as no backend is initialized yet
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: repeated suite runs (and repeated jits of the
# same program shapes across tests) skip XLA recompilation
from icem_tpu.runtime.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
