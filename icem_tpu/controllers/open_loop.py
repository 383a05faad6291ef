"""Open-loop policy: precomputed action sequences as a controller.

Reference: OpenLoopPolicy (icem/controllers/abstract_controller.py:153-184)
wraps a [p, h, d] population of action sequences and doles them out one
column at a time through ArrayIteratorParallelRowwise
(icem/controllers/utils.py:18-51); ``get_parallel_policy_copy(indices)``
slices the population for a worker process.

Here the planner-internal use of OpenLoopPolicy is gone — plan_step rolls
action tensors directly through ``rollout_open_loop`` (models/base.py), which
is the vmap/scan form of the same iteration. This host-level class remains
for the reference's OTHER use: replaying recorded plans through the episode
runtime (e.g. plan visualization, expert-data replay).
"""

from __future__ import annotations

import numpy as np


class OpenLoopPolicy:
    """Replay a [h, d] plan or a [p, h, d] population of plans."""

    needs_training = False
    needs_data = False
    has_state = True
    needs_forward_model = False

    def __init__(self, action_sequences, *, env=None, **kwargs):
        seq = np.asarray(action_sequences, np.float32)
        if seq.ndim == 2:
            seq = seq[None]
        if seq.ndim != 3:
            raise ValueError(f"expected [h,d] or [p,h,d] actions, got {seq.shape}")
        self.action_sequences = seq
        self._t = 0

    @property
    def population(self) -> int:
        return self.action_sequences.shape[0]

    @property
    def horizon(self) -> int:
        return self.action_sequences.shape[1]

    def beginning_of_rollout(self, *, observation=None, state=None, mode="train"):
        self._t = 0

    def end_of_rollout(self, total_time, total_return, mode):
        pass

    def get_action(self, obs=None, state=None, mode="train"):
        """Next action column; rows beyond the horizon repeat the last action
        (the reference raises StopIteration — here replay saturates, which is
        what the episode runtime needs for horizon mismatches)."""
        t = min(self._t, self.horizon - 1)
        self._t += 1
        col = self.action_sequences[:, t, :]
        return col[0] if self.population == 1 else col

    def get_parallel_policy_copy(self, indices):
        """Population slice (abstract_controller.py:180-184)."""
        return OpenLoopPolicy(self.action_sequences[np.asarray(indices)])
