"""Multi-host bootstrap: ``jax.distributed.initialize`` plumbing.

The reference scales beyond one machine by forking worker processes and
feeding them over pipes (icem/models/gt_par_model.py:26-37). The TPU-native
equivalent (SURVEY §5.8) is JAX's multi-controller runtime: every host runs
the SAME program, ``jax.distributed.initialize`` wires the processes into
one cluster, ``jax.devices()`` then spans every chip on every host, and a
``Mesh`` over those devices makes the planner's ``shard_map`` collectives
ride ICI/DCN with zero further code changes.

Launch (env-gated so single-host runs pay nothing):

    # host 0 (also the coordinator)
    ICEM_MULTIHOST=1 ICEM_COORDINATOR=host0:8476 ICEM_NUM_PROCESSES=2 \
        ICEM_PROCESS_ID=0 python -m icem_tpu.main settings/<exp>/<cfg>.json
    # host 1
    ICEM_MULTIHOST=1 ICEM_COORDINATOR=host0:8476 ICEM_NUM_PROCESSES=2 \
        ICEM_PROCESS_ID=1 python -m icem_tpu.main settings/<exp>/<cfg>.json

On Cloud TPU pods, ``ICEM_MULTIHOST=1`` alone suffices — coordinator,
process count and process id are auto-detected from the TPU metadata.

Multi-controller contract: every process must execute the same jitted calls
with the same replicated inputs. The driver satisfies this because seeds,
settings, and the (replicated) planner state are identical on every host;
only the population shards differ, and those live on each host's own chips.
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize the JAX distributed runtime when ``ICEM_MULTIHOST`` is set.

    Must run before the first JAX operation of the process (backend init
    binds the process-local topology otherwise). Idempotent; returns whether
    the runtime is (now) initialized.
    """
    global _initialized
    if _initialized:
        return True
    if not os.environ.get("ICEM_MULTIHOST"):
        return False
    import jax

    def _int_env(name, default):
        raw = os.environ.get(name, default)
        try:
            return int(raw)
        except ValueError:
            raise ValueError(
                f"{name}={raw!r} is not an integer — check the multihost "
                f"launch line (see module docstring)") from None

    kwargs = {}
    coord = os.environ.get("ICEM_COORDINATOR")
    num_processes = 1
    if coord:
        num_processes = _int_env("ICEM_NUM_PROCESSES", "1")
        kwargs = dict(
            coordinator_address=coord,
            num_processes=num_processes,
            process_id=_int_env("ICEM_PROCESS_ID", "0"),
        )
    # else: TPU-pod auto-detection (jax.distributed reads the TPU metadata)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if num_processes > 1:
            # degrading to single-host here would silently run a DUPLICATE
            # single-host experiment on every non-coordinator host
            raise RuntimeError(
                f"jax.distributed.initialize failed for an explicit "
                f"{num_processes}-process launch: {e}") from e
        # single-process launch: backend already initialized (e.g. a library
        # touched jax first) — surface it loudly, it's a launch-order bug
        print(f"WARNING: jax.distributed.initialize failed: {e}")
        return False
    _initialized = True
    if verbose:
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}"
              f" up, {jax.local_device_count()} local /"
              f" {jax.device_count()} global devices")
    return True


def process_zero() -> bool:
    """True on the host that should write checkpoints/metrics/videos."""
    import jax
    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True
