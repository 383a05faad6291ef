"""PRNG discipline.

The reference seeds one global numpy/torch RNG and shares it across workers
(icem/misc/seeding.py; known quirk: all model workers reuse one seed,
gt_par_model.py:29). Here every consumer receives an explicitly split
jax.random key instead — deterministic, device-resident, and race-free under
any parallel schedule.
"""

from __future__ import annotations

import secrets
from typing import Optional

import jax
import numpy as np


class Seeding:
    """Global seed registry mirroring the reference API (misc/seeding.py).

    ``set_seed`` fixes the root key; ``key_for(name)`` derives independent
    streams by folding a stable hash of the consumer name, so adding a new
    consumer never perturbs existing streams.
    """

    SEED: Optional[int] = None
    _root_key = None
    _counters: dict = {}

    @classmethod
    def set_seed(cls, seed: Optional[int] = None, env=None) -> int:
        if seed is None:
            seed = secrets.randbits(31)
        cls.SEED = int(seed)
        cls._root_key = jax.random.key(cls.SEED)
        cls._counters = {}
        np.random.seed(cls.SEED & 0x7FFFFFFF)
        if env is not None and hasattr(env, "seed"):
            env.seed(cls.SEED)
        return cls.SEED

    @classmethod
    def root_key(cls):
        if cls._root_key is None:
            cls.set_seed(None)
        return cls._root_key

    @classmethod
    def key_for(cls, name: str):
        """A key stream independent per consumer name."""
        digest = int.from_bytes(name.encode(), "little") % (2**31 - 1)
        return jax.random.fold_in(cls.root_key(), digest)

    @classmethod
    def next_key(cls, kind: str):
        """Deterministic key for the n-th consumer of a kind.

        Run-reproducible replacement for keying on object identity (heap
        addresses differ across runs): with a fixed seed, the i-th
        constructed consumer of each kind always gets the same stream.
        """
        n = cls._counters.get(kind, 0)
        cls._counters[kind] = n + 1
        return cls.key_for(f"{kind}/{n}")
