"""Persistent XLA compilation cache.

The fused planner/episode programs dominate experiment wall-clock on first
run (measured round 2: e.g. Relocate spent 695 s of a 706 s experiment
compiling). JAX's persistent compilation cache serializes every compiled
executable to disk keyed on (HLO, compile options, backend), so any process
that builds the same program — re-runs, multi-seed sweeps, quality tables,
resumed experiments — loads it in milliseconds instead of recompiling.
Measured through the TPU tunnel: first plan_step 74 s cold, 1.0 s in a fresh
process with a warm cache.

The reference has no analog (no compilation step); this is pure TPU-runtime
infrastructure. Enabled by default from the driver/bench/test entry points;
opt out with ``ICEM_NO_COMPILE_CACHE=1``, redirect with
``ICEM_COMPILE_CACHE=<dir>``.
"""

from __future__ import annotations

import os

_enabled = False
_platform_configured = False

# repo-local default keeps all writes inside the working tree
_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "jax")


def configure_platform() -> None:
    """Apply the ICEM_PLATFORM backend override (idempotent).

    e.g. ``ICEM_PLATFORM=cpu`` to run experiments while the TPU tunnel is
    unavailable. Must happen before backend init — the TPU plugin ignores
    the ``JAX_PLATFORMS`` env var, only the jax config wins. Deliberately
    independent of the compile-cache opt-out so ``ICEM_NO_COMPILE_CACHE=1``
    can never silently drop the platform request (which would hang process
    startup in TPU init when the tunnel is down).
    """
    global _platform_configured
    if _platform_configured:
        return
    platform = os.environ.get("ICEM_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    _platform_configured = True


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's on-disk compilation cache (idempotent).

    Returns the cache directory in use, or None when disabled via env.
    Safe to call before or after backend initialization; must be called
    before the first compilation it should capture. Always applies the
    platform override, even when the cache itself is opted out.
    """
    global _enabled
    configure_platform()
    if os.environ.get("ICEM_NO_COMPILE_CACHE"):
        return None
    cache_dir = cache_dir or os.environ.get("ICEM_COMPILE_CACHE") or _DEFAULT_DIR
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took noticeable compile time; tiny kernels are
    # cheap to recompile and would only churn the directory
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
    return cache_dir
