"""Shared step plumbing for spatial-engine (3D) environments.

The 3D twin of envs/planar_base.py: splits an env step into physics +
post-step so the population-batched spatial path (envs/physics/
spatial_batched.py — population on the VPU lanes instead of [pop, 3]
minor axes, no autodiff in the traced graph) can be swapped in without
duplicating reward/observation logic:

- ``step(state, action)``: per-trajectory, physics via spatial.step
- ``step_batched(states, actions)``: [P, ...] population, physics via
  spatial_batched.step_batched above the lane-utilization threshold,
  else a vmap fallback
- ``rollout_batched(states, actions)``: whole-horizon scan with the
  physics carry kept in batched-scalar rows (one relayout in, one out),
  picked up by GroundTruthModel's rollout fast path exactly like the
  planar envs.

Subclasses implement ``_post_step(state, new_state, action) -> (obs,
reward, done)``; the state layout contract is [q(ndof), qd(ndof),
extra...] with extra passed through untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icem_tpu.envs.base import Env
from icem_tpu.envs.physics import spatial, spatial_batched


class SpatialEnv(Env):
    """Env whose dynamics live on the spatial 3D engine."""

    # The tile path wins at ANY planner population: even at partial lane
    # fill (pop 40 -> 5 of 128 lanes per [8, L] tile) the closed-form
    # no-autodiff formulation beats vmap(jacfwd-engine) on BOTH compile
    # time (minutes -> seconds: the traced graph has no ndof× jacfwd blowup)
    # and runtime (measured 38× at pop 4096, results/BENCH_SPATIAL_r04).
    # The threshold only exists so single-trajectory debugging paths (and
    # the equivalence tests' per-row reference) keep using the autodiff
    # engine directly.
    batched_min_pop = 8

    # Fused-episode budget consumed by RolloutManager's fuse_on_device=auto:
    # workloads above this many total episode steps per sample() call run
    # CHUNKED (runtime/rollout.py). The binding constraint is per-EXECUTION
    # wall time through the axon tunnel, not program size: r5 measured
    # 5x200-step standup calls (~48 s each) surviving repeatedly while
    # 5x334-step chunks (~80 s) and the r4 5x1000-step whole program
    # (~240 s) both died with "UNAVAILABLE: TPU worker crashed" — a
    # worker/tunnel execution deadline somewhere past ~1 minute. 1000 total
    # steps per call is the empirically proven shape for the 23-dof
    # humanoid; faster spatial envs just get slightly more host round-trips.
    fused_episode_step_limit = 1000

    def _post_step(self, state, new_state, action):
        """(obs, reward, done) from the transition; action arrives clipped."""
        raise NotImplementedError

    def _physics(self, state, action):
        nd = self.model.ndof
        action = jnp.clip(action, -1.0, 1.0)
        q, qd = spatial.step(self.model, state[:nd], state[nd: 2 * nd], action)
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
        if not (spatial_batched.supports_batched(self.model)
                and P >= self.batched_min_pop):
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
        Q2, QD2 = spatial_batched.step_batched(self.model, Q, QD, A)
        if pad:
            Q2, QD2 = Q2[:P], QD2[:P]
        new_states = jnp.concatenate([Q2, QD2, states[:, 2 * nd:]], axis=1)
        obs, rewards, dones = jax.vmap(self._post_step)(states, new_states, acts)
        return new_states, obs, rewards, dones

    def rollout_batched(self, states, actions):
        """Whole-horizon open-loop rollout with the physics carry kept in
        batched-scalar rows across the scan (planar_base.rollout_batched's
        contract: states [P, S], actions [P, h, A] -> (obs_seq, next_obs_seq,
        actions_tm, rewards, final_states), time-major sequences)."""
        P, h = actions.shape[0], actions.shape[1]
        if not (spatial_batched.supports_batched(self.model)
                and P >= self.batched_min_pop
                and self.action_repeat == 1):
            return None  # caller falls back to the generic scan
        nd = self.model.ndof
        acts = jnp.clip(actions, -1.0, 1.0)

        from icem_tpu.ops.spatial_rollout import (BLOCK, PALLAS_MIN_POP,
                                                  pallas_available,
                                                  rollout_spatial_pallas)
        if pallas_available() and P >= PALLAS_MIN_POP:
            # VMEM-resident Pallas rollout (ops/spatial_rollout.py): pad the
            # population up to a block multiple. PALLAS_MIN_POP < BLOCK, so
            # the pad can EXCEED P — wrap indices instead of slicing a tail
            # (a `states[-pad:]` tail maxes out at P rows and under-pads;
            # r5 on-device failure: pop 504 padded to 1008, not 1024)
            pad = (-P) % BLOCK
            if pad:
                idx = jnp.arange(P + pad) % P
                st, ap = states[idx], acts[idx]
            else:
                st, ap = states, acts
            qs, qds = rollout_spatial_pallas(
                self.model, st[:, :nd], st[:, nd: 2 * nd], ap)
            qs, qds = qs[:, :P], qds[:, :P]
            return self._assemble_rollout(states, acts, qs, qds, P, h)

        pad = (-P) % 8
        st = jnp.concatenate([states, states[-pad:]], axis=0) if pad else states
        ap = jnp.concatenate([acts, acts[-pad:]], axis=0) if pad else acts
        Pp = st.shape[0]
        B = (8, Pp // 8)
        q = spatial_batched.rows_from_cols(st[:, :nd], B)
        qd = spatial_batched.rows_from_cols(st[:, nd: 2 * nd], B)
        # [Pp, h, A] -> per-step row lists via one relayout: [h, A, 8, L]
        a_rows_tm = jnp.transpose(ap, (1, 2, 0)).reshape((h, ap.shape[2]) + B)
        chains = spatial_batched.rot_chains(self.model)

        def body(carry, a_t):
            q_, qd_ = carry
            a_list = [a_t[i] for i in range(a_t.shape[0])]
            q2, qd2 = spatial_batched.step_rows(self.model, q_, qd_, a_list,
                                                chains)
            return (q2, qd2), (jnp.stack(q2), jnp.stack(qd2))

        _, (qs, qds) = jax.lax.scan(body, (q, qd), a_rows_tm)
        qs = jnp.transpose(qs.reshape(h, nd, Pp), (0, 2, 1))[:, :P]
        qds = jnp.transpose(qds.reshape(h, nd, Pp), (0, 2, 1))[:, :P]
        return self._assemble_rollout(states, acts, qs, qds, P, h)

    def _assemble_rollout(self, states, acts, qs, qds, P, h):
        """obs/reward assembly shared by the Pallas and XLA rollout paths:
        qs, qds [h, P, nd] -> the rollout_open_loop output contract."""
        nd = self.model.ndof
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
