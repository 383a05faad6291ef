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
            # raw step: the constructor layers action repeat on top of this
            # method, so vmapping the wrapped step would repeat twice
            return jax.vmap(self._raw_step)(states, actions)

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

    def rollout_batched(self, states, actions):
        """Full open-loop rollout with the physics carry kept in the
        batched-scalar row layout across the WHOLE horizon scan — one
        relayout in, one out, instead of four per control step; obs/rewards
        are computed afterwards in one [h*P] batch.

        states: [P, S]; actions: [P, h, A]. Returns the rollout_open_loop
        contract: (obs_seq, next_obs_seq, actions_tm, rewards, final_states)
        with time-major [h, P, ...] sequences.
        """
        P, h = actions.shape[0], actions.shape[1]
        if not (batched.supports_batched(self.model)
                and P >= self.batched_min_pop
                and self.action_repeat == 1):
            # (action repeat is layered on env.step/step_batched by the base
            # constructor; this whole-horizon path bypasses those wrappers,
            # so repeated envs fall back to the generic scan)
            return None  # caller falls back to the generic scan
        nd = self.model.ndof
        acts = jnp.clip(actions, -1.0, 1.0)

        from icem_tpu.ops.planar_rollout import (
            BLOCK, PALLAS_MIN_POP, fits_vmem, pallas_available,
            rollout_planar_pallas)
        # fits_vmem: large (h, ndof) configs (e.g. humanoid_standup h=40)
        # would exceed the kernel's per-block VMEM budget and fail Mosaic
        # lowering — a config-dependent TPU-only crash; fall back to XLA
        use_pallas = (pallas_available() and P >= PALLAS_MIN_POP
                      and fits_vmem(h, nd, acts.shape[2]))

        def xla_rows(st, ap):
            """XLA row-scan rollout on a population slice (multiple of 8).
            Returns (qs, qds) as [h, Psub, nd]."""
            Pp = st.shape[0]
            B = (8, Pp // 8)
            q = batched.rows_from_cols(st[:, :nd], B)
            qd = batched.rows_from_cols(st[:, nd: 2 * nd], B)
            # [Pp, h, A] -> per-step row lists via one relayout: [h, A, 8, L]
            a_rows_tm = jnp.transpose(ap, (1, 2, 0)).reshape(
                (h, ap.shape[2]) + B)
            chains = batched._ancestors(self.model)

            def body(carry, a_t):
                q_, qd_ = carry
                a_list = [a_t[i] for i in range(a_t.shape[0])]
                q2, qd2 = batched.step_rows(self.model, q_, qd_, a_list, chains)
                return (q2, qd2), (jnp.stack(q2), jnp.stack(qd2))

            _, (qs, qds) = jax.lax.scan(body, (q, qd), a_rows_tm)
            # [h, nd, 8, L] -> [h, Psub, nd] (one relayout per tensor)
            qs = jnp.transpose(qs.reshape(h, nd, Pp), (0, 2, 1))
            qds = jnp.transpose(qds.reshape(h, nd, Pp), (0, 2, 1))
            return qs, qds

        if use_pallas:
            # pad the population UP to the next BLOCK multiple and run
            # everything VMEM-resident (ops/planar_rollout.py). Padding is
            # strictly cheaper than routing a sub-block tail through the XLA
            # row-scan: the kernel is ~6x faster per trajectory, so even a
            # nearly-empty 1024-row block (~0.4 ms) undercuts the slow-path
            # tail — measured: a tail-split variant cost +8 ms/plan at the
            # flagship config. Sub-BLOCK populations stay on the XLA path
            # (the P >= PALLAS_MIN_POP == BLOCK gate above): measured at
            # P=512 the padded kernel entry was SLOWER than XLA there.
            pad = (-P) % BLOCK
            # pad < BLOCK <= P (PALLAS_MIN_POP gate), so slicing is valid
            st = jnp.concatenate([states, states[-pad:]], axis=0) if pad else states
            ap = jnp.concatenate([acts, acts[-pad:]], axis=0) if pad else acts
            qs, qds = rollout_planar_pallas(
                self.model, st[:, :nd], st[:, nd: 2 * nd], ap)
            qs, qds = qs[:, :P], qds[:, :P]
        else:
            pad = (-P) % 8
            st = jnp.concatenate([states, states[-pad:]], axis=0) if pad else states
            ap = jnp.concatenate([acts, acts[-pad:]], axis=0) if pad else acts
            qs, qds = xla_rows(st, ap)
            qs, qds = qs[:, :P], qds[:, :P]
        extra = states[:, 2 * nd:]
        extra_seq = jnp.broadcast_to(extra, (h,) + extra.shape)
        next_states = jnp.concatenate([qs, qds, extra_seq], axis=2)
        prev_states = jnp.concatenate([states[None], next_states[:-1]], axis=0)
        final_states = next_states[-1]

        acts_tm = jnp.swapaxes(acts, 0, 1)  # [h, P, A]
        S, A_dim = states.shape[1], acts.shape[2]
        post = jax.vmap(self._post_step)
        next_obs_f, rewards_f, _ = post(prev_states.reshape(h * P, S),
                                        next_states.reshape(h * P, S),
                                        acts_tm.reshape(h * P, A_dim))
        obs_seq = self.observation(prev_states)
        next_obs_seq = next_obs_f.reshape(h, P, -1)
        rewards = rewards_f.reshape(h, P)
        return obs_seq, next_obs_seq, acts_tm, rewards, final_states
