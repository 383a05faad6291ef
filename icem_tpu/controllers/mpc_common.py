"""Shared MPC controller behavior.

The reference puts ``check_model_consistency`` on the common MpcController
base (icem/controllers/mpc.py:39-47), so EVERY model-based MPC controller —
iCEM, vanilla CEM, random shooting — warns when its ground-truth forward
model's internal state drifts from the live environment state. This mixin is
the equivalent shared home for that check.
"""

from __future__ import annotations

CONSISTENCY_TOL = 1e-5  # reference: mpc.py:44


class ModelConsistencyMixin:
    """Provides ``check_model_consistency`` for controllers that keep a
    ``_model_state`` synced to reality and hold ``self.env`` /
    ``self.forward_model``.

    Only meaningful for ground-truth models (a learned model's latent state
    is not comparable to an env state); controllers flag learned models via
    ``_has_params`` and the check returns None for them.
    """

    def check_model_consistency(self, env_state):
        """Warn if the forward model's internal state diverged more than
        ``CONSISTENCY_TOL`` from the live env state (mpc.py:39-47).

        Returns the state difference, or None when the check is inapplicable
        (no env state supplied, no synced model state, learned model).
        """
        if (env_state is None or self._model_state is None
                or getattr(self, "_has_params", False)):
            return None
        diff = float(self.env.compute_state_difference(env_state, self._model_state))
        if diff > CONSISTENCY_TOL:
            print(f"Warning: internal forward model differs from env: {diff}")
        return diff
