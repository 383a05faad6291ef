"""icem_tpu — a TPU-native sampling-based MPC (iCEM) planning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
iCEM implementation (martius-lab/iCEM, "Sample-efficient Cross-Entropy Method
for Real-time Planning", arXiv:2008.06389):

- improved CEM (iCEM) with colored-noise (1/f^beta) action sampling,
  population decay, elite keep/shift memory, add-mean-at-last-iteration and
  execute-best-action semantics (reference: icem/controllers/icem.py)
- vanilla CEM and random-shooting MPC baselines
  (reference: icem/controllers/mpc.py)
- pure-JAX ground-truth dynamics (reference used MuJoCo via env.step) and
  learned forward models (ensemble / latent)
- population parallelism via vmap within a chip and shard_map across a
  jax.sharding.Mesh (reference used multiprocessing pipes)

Everything in the hot path is functional: explicit state pytrees transformed
with jit/vmap/scan/shard_map; the planning step for one environment step is a
single compiled XLA program with no host round-trips.
"""

__version__ = "0.1.0"

from icem_tpu.runtime.config import ParamDict, resolve_settings  # noqa: F401
