"""Pallas TPU kernel: whole-horizon planar-physics rollout, VMEM-resident.

The XLA path (envs/planar_base.rollout_batched) already lays every physical
scalar out as a full vreg tile, but the scan-carry and fusion boundaries
still round-trip intermediates through HBM between substeps. This kernel
runs the ENTIRE h-control-step x n-substep rollout for a block of
trajectories inside one Pallas program: the physics state lives in
registers/VMEM across all h*n_substeps iterations, and only the per-step
joint coordinates are written out.

Layout: a block is 8 x LANES trajectories; every batched scalar is one
[8, LANES] tile. The kernel body literally calls the same batched-scalar
math (envs/physics/batched.step_rows) — Pallas traces plain jnp — so the
numerics are identical to the XLA path by construction.

Grid: one program per trajectory block; blocks are independent (no
cross-trajectory coupling in the physics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.envs.physics import batched
from icem_tpu.envs.physics.planar import PlanarModel

LANES = 128  # one f32 vreg tile per batched scalar: [8, 128]
BLOCK = 8 * LANES

# minimum population for the Pallas path. Measured on v5e (HalfCheetah
# h=30): P=512 padded into one block runs 6.1 ms vs 4.3 ms on the XLA row
# path (the modular pad-gather plus fixed per-call overheads dominate),
# while P=1024 runs 3.9 ms vs 5.6 ms — the crossover sits at one full
# block, so sub-BLOCK populations stay on the XLA path. Above the
# threshold, padding a partial last block IS worth it: a nearly-empty
# block costs ~0.4 ms where a tail routed through the row path costs
# several (a tail-split variant measured +8 ms/plan at the flagship
# config).
PALLAS_MIN_POP = BLOCK

# VMEM is ~16 MB/core; the kernel's per-block footprint is the [h, na] action
# input block plus two [h, nd] output blocks (each element a [8, 128] f32
# tile), and Pallas double-buffers blocks across grid steps. Budget the
# resident footprint at half of VMEM so the loop-carried physics working set
# always fits; callers fall back to the XLA row-scan path above this.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def block_vmem_bytes(horizon: int, ndof: int, n_act: int) -> int:
    """Estimated VMEM residency of one grid step (with double buffering)."""
    tiles = horizon * (n_act + 2 * ndof)
    return 2 * tiles * 8 * LANES * 4


def fits_vmem(horizon: int, ndof: int, n_act: int) -> bool:
    return block_vmem_bytes(horizon, ndof, n_act) <= _VMEM_BUDGET_BYTES


_KERNEL_CACHE = {}


def _kernel_factory(model: PlanarModel, horizon: int, n_act: int):
    """Build the (model, h)-specialized kernel body, cached by model identity
    (PlanarModel holds ndarrays, so it isn't hashable for lru_cache; envs
    keep one model instance for their lifetime)."""
    cache_key = (id(model), horizon, n_act)
    cached = _KERNEL_CACHE.get(cache_key)
    if cached is not None:
        return cached[0]
    if len(_KERNEL_CACHE) > 64:  # bound growth in env-sweep processes
        _KERNEL_CACHE.clear()
    nd = model.ndof
    chains = batched._ancestors(model)

    def kernel(a_ref, q0_ref, qd0_ref, qs_ref, qds_ref):
        # a_ref:   [h, n_act, 8, LANES]
        # q0/qd0:  [nd, 8, LANES]
        # qs/qds:  [h, nd, 8, LANES]  (outputs)
        q0 = [q0_ref[i] for i in range(nd)]
        qd0 = [qd0_ref[i] for i in range(nd)]

        def control_step(t, carry):
            q, qd = carry
            a = [a_ref[t, i] for i in range(n_act)]
            q, qd = batched.step_rows(model, q, qd, a, chains)
            for i in range(nd):
                qs_ref[t, i] = q[i]
                qds_ref[t, i] = qd[i]
            return (q, qd)

        jax.lax.fori_loop(0, horizon, control_step, (q0, qd0))

    # store the model alongside: keeps id(model) valid for the cache key's
    # lifetime (and the kernel closure needs it anyway)
    _KERNEL_CACHE[cache_key] = (kernel, model)
    return kernel


def rollout_planar_pallas(model: PlanarModel, Q, QD, ACTS):
    """Full open-loop rollout through the physics on TPU via Pallas.

    Q, QD: [P, ndof]; ACTS: [P, h, n_act] (already clipped). P must be a
    multiple of BLOCK (callers pad). Returns (qs, qds): [h, P, ndof].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, nd = Q.shape
    h, na = ACTS.shape[1], ACTS.shape[2]
    assert P % BLOCK == 0, f"population {P} must be a multiple of {BLOCK}"
    n_blocks = P // BLOCK
    L_total = P // 8

    # [P, d] -> [d, 8, P//8] (trajectory = sublane * L_total + lane)
    def to_rows(X):
        return jnp.transpose(X).reshape(X.shape[1], 8, L_total)

    q_in = to_rows(Q)
    qd_in = to_rows(QD)
    a_in = jnp.transpose(ACTS, (1, 2, 0)).reshape(h, na, 8, L_total)

    kernel = _kernel_factory(model, h, na)
    grid = (n_blocks,)
    qs, qds = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, na, 8, LANES), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 8, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, 8, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h, nd, 8, LANES), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, nd, 8, LANES), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, nd, 8, L_total), jnp.float32),
            jax.ShapeDtypeStruct((h, nd, 8, L_total), jnp.float32),
        ],
    )(a_in.astype(jnp.float32), q_in.astype(jnp.float32),
      qd_in.astype(jnp.float32))

    # [h, nd, 8, P//8] -> [h, P, nd]
    qs = jnp.transpose(qs.reshape(h, nd, P), (0, 2, 1))
    qds = jnp.transpose(qds.reshape(h, nd, P), (0, 2, 1))
    return qs, qds


def pallas_available() -> bool:
    """TPU backend present and Pallas importable."""
    import os
    if os.environ.get("ICEM_TPU_NO_PALLAS"):
        return False
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except ImportError:
        return False
    try:
        # Mosaic kernels lower only on TPU backends (GPU Pallas uses a
        # different dialect; pltpu.VMEM specs would fail there)
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False
