"""Shared step plumbing for planar-engine environments.

Splits an env step into physics + post-step so the population-batched
physics path (envs/physics/batched.py — population on the VPU lanes, ~6x
faster than vmap of the per-trajectory engine) can be swapped in without
duplicating any reward/observation logic:

- ``step(state, action)``: per-trajectory, physics via planar.step
- ``step_batched(states, actions)``: [P, ...] population, physics via
  batched.step_batched when the model supports it and the population is
  large enough to fill the vector lanes, else vmap fallback

Subclasses implement ``_post_step(state, new_state, action) -> (obs,
reward, done)``; the state layout contract is [q(ndof), qd(ndof), extra...]
(extra = non-dynamic state such as goal positions, passed through).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icem_tpu.envs.base import Env
from icem_tpu.envs.physics import batched, planar


class PlanarEnv(Env):
    """Env whose dynamics live on the planar engine."""

    batched_min_pop = 64  # below this, lane utilization doesn't pay for the relayout

    def _post_step(self, state, new_state, action):
        """(obs, reward, done) from the transition; action arrives clipped."""
        raise NotImplementedError

    def _physics(self, state, action):
        nd = self.model.ndof
        action = jnp.clip(action, -1.0, 1.0)
        q, qd = planar.step(self.model, state[: nd], state[nd: 2 * nd], action)
        return jnp.concatenate([q, qd, state[2 * nd:]])

    def step(self, state, action):
        new_state = self._physics(state, action)
        obs, reward, done = self._post_step(state, new_state,
                                            jnp.clip(action, -1.0, 1.0))
        return new_state, obs, reward, done

    def step_batched(self, states, actions):
        """Population step: (states [P,S], actions [P,A]) ->
        (new_states, obs, rewards, dones), physics on the fast path."""
        P = states.shape[0]
        if not (batched.supports_batched(self.model)
                and P >= self.batched_min_pop):
            return jax.vmap(self.step)(states, actions)

        nd = self.model.ndof
        acts = jnp.clip(actions, -1.0, 1.0)
        Q, QD = states[:, :nd], states[:, nd: 2 * nd]
        pad = (-P) % 8
        if pad:
            Q = jnp.concatenate([Q, Q[-pad:]], axis=0)
            QD = jnp.concatenate([QD, QD[-pad:]], axis=0)
            A = jnp.concatenate([acts, acts[-pad:]], axis=0)
        else:
            A = acts
        Q2, QD2 = batched.step_batched(self.model, Q, QD, A)
        if pad:
            Q2, QD2 = Q2[:P], QD2[:P]
        new_states = jnp.concatenate([Q2, QD2, states[:, 2 * nd:]], axis=1)
        obs, rewards, dones = jax.vmap(self._post_step)(states, new_states, acts)
        return new_states, obs, rewards, dones
