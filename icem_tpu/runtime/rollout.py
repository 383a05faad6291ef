"""Episode execution runtime.

Replaces the reference RolloutManager (icem/misc/rollout_utils.py:38-345)
with two execution paths:

1. ``sample`` / ``_sample`` — the canonical host-driven episode loop
   (rollout_utils.py:154-227): works with ANY controller via
   ``get_action(obs, state, mode)``, supports start-state injection,
   ``use_env_states``, ``only_final_reward`` masking, per-step success
   collection and render hooks. Each controller step is itself one compiled
   XLA program, so the host only sequences steps.

2. ``sample_on_device`` — the TPU-first path: the ENTIRE episode (planner +
   real env) runs as one ``lax.scan`` on device with zero host round-trips,
   and multiple episodes batch with ``vmap`` — this subsumes the reference's
   process-parallel ``par_sample`` (rollout_utils.py:129-152, worker pool at
   :312-345) with a single SPMD program. Requires a functional controller
   (one exposing ``functional_plan``/``init_plan_state``, i.e. the MPC
   planners).

Termination semantics: the reference breaks the loop at ``done``; under scan
we freeze the state and mask rewards after termination, and report the valid
episode length.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from icem_tpu.runtime.buffer import Rollout, RolloutBuffer
from icem_tpu.runtime.seeding import Seeding


class RolloutManager:
    """reference: misc/rollout_utils.py:38-114 (constructor + sample dispatch)."""

    def __init__(self, env, rollout_params):
        p = dict(rollout_params)
        self.env = env
        self.task_horizon = int(p.get("task_horizon", 200))
        self.use_env_states = bool(p.get("use_env_states", False))
        self.only_final_reward = bool(p.get("only_final_reward", False))
        self.render = bool(p.get("render", False))
        # record: falsy = off; True = "videos/"; str = target directory
        rec = p.get("record", False)
        self.record = rec if isinstance(rec, str) else ("videos" if rec else "")
        self.num_parallel = int(p.get("num_parallel", 0))
        # fuse_on_device: true | false | "auto" (default). Auto fuses unless
        # the env advertises a fused-program step budget and the requested
        # workload exceeds it — the escape hatch for the spatial (3D) envs,
        # whose fused many-episode programs can exceed what the TPU runtime
        # will take in one program (r4: 5×1000-step fused humanoid_standup
        # episodes crashed the worker; the host loop with jitted plan steps
        # runs the same config fine).
        self.fuse_on_device = p.get("fuse_on_device", "auto")
        if not isinstance(self.fuse_on_device, str):
            self.fuse_on_device = bool(self.fuse_on_device)
        self._episode_counter = 0
        self._epoch = 0
        # fused-episode compile cache: learned weights flow in as a runtime
        # argument (see functional_plan), so one compiled episode serves all
        # training iterations — entries only die with their policy object
        self._fused_cache = {}

    def set_epoch(self, epoch: int):
        """Fold the training iteration into episode PRNG keys so a resumed
        run does not replay the key stream of the first iterations."""
        self._epoch = int(epoch)

    # ------------------------------------------------------------------ #
    def sample(self, policy, render: bool = False, mode: str = "train",
               name: str = "", no_rollouts: int = 1, desc: str = "rollout"):
        """Collect ``no_rollouts`` episodes (rollout_utils.py:89-114)."""
        fuse = self.fuse_on_device
        chunk = None
        if fuse == "auto":
            limit = getattr(self.env, "fused_episode_step_limit", None)
            fuse = True
            if limit is not None and no_rollouts * self.task_horizon > int(limit):
                # CHUNK the episode scan instead of unfusing entirely: one
                # compiled C-step program called ceil(h/C) times with the
                # episode carry returned to the host between calls. This
                # bounds the traced program at <= limit total steps (the
                # r4 worker-crash trigger was the 5x1000-step fused standup
                # program) AND keeps device round-trips to a handful per
                # episode batch — the host-loop fallback this replaces made
                # task_horizon x episodes jitted plan-step calls (15,000 for
                # standup blitz), which the TPU tunnel did not survive either.
                n_chunks = -(-no_rollouts * self.task_horizon // int(limit))
                chunk = -(-self.task_horizon // n_chunks)
                if not getattr(self, "_warned_auto_chunk", False):
                    self._warned_auto_chunk = True
                    print(f"RolloutManager: fuse_on_device=auto chunking the "
                          f"fused episode scan into {n_chunks}x{chunk}-step "
                          f"programs ({no_rollouts}x{self.task_horizon} steps "
                          f"exceeds the env's fused-program budget of {limit})")
        can_fuse = (fuse and not render and not self.record
                    and hasattr(policy, "functional_plan"))
        if can_fuse:
            return self.sample_on_device(policy, mode=mode,
                                         no_rollouts=no_rollouts, chunk=chunk)
        return [self._sample(policy, render=render, mode=mode, name=name or mode)
                for _ in range(no_rollouts)]

    # ------------------------------------------------------------------ #
    def _episode_key(self, mode):
        self._episode_counter += 1
        return Seeding.key_for(
            f"rollout/{mode}/{self._epoch}/{self._episode_counter}")

    def _sample(self, policy, render: bool = False, mode: str = "train",
                start_state=None, name: str = "") -> Rollout:
        """Host-driven canonical env loop (rollout_utils.py:154-227)."""
        env = self.env
        key = self._episode_key(mode)
        recorder = None
        if self.record:
            from icem_tpu.runtime.video import VideoRecorder
            recorder = VideoRecorder(self.record,
                                     f"{name or mode}_{self._episode_counter:04d}",
                                     fps=env.get_fps())
        if start_state is not None:
            state = start_state
            obs = env.observation(state)
        else:
            state, obs = env.reset_with_mode(key, mode)

        if hasattr(policy, "beginning_of_rollout"):
            policy.beginning_of_rollout(
                observation=obs, state=state if self.use_env_states else None, mode=mode)

        step = getattr(env, "_jit_step", None)
        if step is None:
            step = jax.jit(env.step)
            env._jit_step = step

        transitions = []
        successes = []
        start_time = time.time()
        for t in range(self.task_horizon):
            if render or recorder is not None:
                frame = env.render_frame(state)
                if recorder is not None and frame is not None:
                    recorder.append(frame)
            env_state = state if self.use_env_states else None
            action = policy.get_action(np.asarray(obs), env_state, mode=mode)
            next_state, next_obs, reward, done = step(state, jnp.asarray(action))
            if not np.all(np.isfinite(np.asarray(next_obs))):
                # physics blow-up containment: end the episode here rather
                # than propagate NaNs (the MujocoException-skip analog,
                # reference rollout_utils.py:189-194)
                print(f"Warning: non-finite observation at step {t}; "
                      f"truncating episode")
                break
            succ = env.is_success(obs, action, next_obs)
            if succ is not None:
                successes.append(float(succ))
            transitions.append((np.asarray(obs), np.asarray(next_obs),
                                np.asarray(action), float(reward), float(done)))
            state, obs = next_state, next_obs
            if float(done):
                break

        if not transitions:  # first-step blow-up: empty rollout, not a crash
            z = np.zeros((0, env.obs_dim), np.float32)
            za = np.zeros((0, env.action_dim), np.float32)
            return Rollout(data=dict(observations=z, next_observations=z,
                                     actions=za, rewards=np.zeros(0, np.float32),
                                     dones=np.zeros(0, np.float32)))
        obs_a, nxt_a, act_a, rew_a, done_a = map(np.array, zip(*transitions))
        if self.only_final_reward:
            rew_a[:-1] = 0.0
        data = dict(observations=obs_a, next_observations=nxt_a, actions=act_a,
                    rewards=rew_a, dones=done_a)
        if successes:
            data["successes"] = np.array(successes, np.float32)

        if recorder is not None:
            path = recorder.close()
            if path:
                print(f"recorded episode video: {path}")
        if hasattr(policy, "end_of_rollout"):
            policy.end_of_rollout(time.time() - start_time, float(rew_a.sum()), mode)
        return Rollout(data=data)

    # ------------------------------------------------------------------ #
    def sample_on_device(self, policy, mode: str = "train", no_rollouts: int = 1,
                         chunk: Optional[int] = None):
        """Fused episodes: planner + env in one scan, episodes vmapped.

        The TPU replacement for par_sample's process pool — E independent
        episodes are one SPMD program over a batch axis.

        ``chunk`` (control steps, default whole horizon): split the episode
        scan into ceil(h/chunk) executions of ONE compiled chunk program,
        with the (env_state, obs, plan_state, done) carry round-tripping
        through the host between calls. Chunking bounds the traced program
        size for the big spatial envs (whose whole-episode programs can crash
        the TPU runtime) at a handful of device calls per batch — unlike the
        host episode loop, which makes task_horizon jitted calls per episode.
        The trailing chunk is NOT specialized: the same program runs past the
        horizon (frozen-after-done semantics make the extra steps harmless)
        and outputs are truncated to the horizon afterwards.
        """
        env = self.env
        keys = jax.random.split(self._episode_key(mode), no_rollouts)
        horizon = self.task_horizon
        if chunk is None or chunk >= horizon:
            chunk = horizon
        n_chunks = -(-horizon // chunk)

        # learned-model weights are a runtime input of the fused program (see
        # functional_plan) — always the LIVE params, so a cache hit after
        # train() replays the compiled episode with the new weights
        model_params = getattr(policy, "live_model_params", None)
        # key on id(policy) but hold a STRONG ref to the policy in the entry:
        # without it a garbage-collected controller's address can be reused by
        # a new controller of the same type and the cache would silently
        # replay the old jitted episode with the old config baked in
        cache_key = (id(policy), mode, no_rollouts, chunk)
        cached = self._fused_cache.get(cache_key)
        if cached is not None and cached[1] is policy:
            init_fn, chunk_fn = cached[0]
        else:
            init_fn, chunk_fn = self._build_fused(policy, mode, chunk)
            self._fused_cache[cache_key] = ((init_fn, chunk_fn), policy)

        carry = init_fn(keys, model_params)
        outs = []
        for _ in range(n_chunks):
            carry, out = chunk_fn(carry, model_params)
            outs.append(out)
        if n_chunks == 1:
            episodes = outs[0]
        else:
            # concatenate chunk outputs along time ([E, C, ...] each) and
            # truncate the past-horizon tail of the last chunk
            episodes = jax.tree_util.tree_map(
                lambda *xs: np.concatenate([np.asarray(x) for x in xs],
                                           axis=1)[:, :horizon], *outs)
        return self._episodes_to_rollouts(episodes, no_rollouts)

    def _build_fused(self, policy, mode: str, chunk: int):
        """Compile the fused-episode pair: init (reset + plan state) and one
        C-step planner+env scan, both vmapped over the episode batch."""
        env = self.env
        plan = policy.functional_plan()
        has_success = env.is_success(
            jnp.zeros(env.obs_dim), jnp.zeros(env.action_dim), jnp.zeros(env.obs_dim)
        ) is not None
        self._has_success_cache = has_success
        use_env_states = self.use_env_states

        def one_init(key, model_params):
            k_env, k_plan = jax.random.split(key)
            state, obs = env.reset_with_mode(k_env, mode)
            pstate = policy.init_plan_state(env.obs_dim, k_plan)
            return (state, obs, pstate, jnp.float32(0.0))

        def body(carry, _, model_params):
            env_state, ob, ps, done_before = carry
            # honor the configured observability: without use_env_states
            # the planner must reconstruct state from the observation,
            # exactly as on the host path (ground_truth.py:50-55)
            action, ps2 = plan(ps, ob,
                               env_state if use_env_states else None,
                               model_params)
            env_state2, ob2, rew, done = env.step(env_state, action)
            # physics blow-up containment, matching the host path's
            # truncation (rollout.py:121-127; the MujocoException-skip
            # analog, reference rollout_utils.py:189-194): a non-finite
            # next observation or state leaf is terminal AND its own
            # transition is invalid — the host breaks BEFORE appending,
            # so keep=0 for the blown step itself, not just after it.
            blown = ~jnp.all(jnp.isfinite(ob2))
            blown = blown | ~jax.tree_util.tree_reduce(
                lambda acc, leaf: acc & jnp.all(jnp.isfinite(leaf)),
                env_state2, jnp.bool_(True))
            blown_f = blown.astype(jnp.float32)
            # freeze after termination or blow-up (mask instead of
            # break); freezing to the last FINITE state keeps every
            # subsequent planner/env step NaN-free
            dead = (done_before > 0) | blown
            keep = (1.0 - done_before) * (1.0 - blown_f)
            env_state2 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(dead, old, new),
                env_state2, env_state)
            ob2 = jnp.where(dead, ob, ob2)
            rew = jnp.where(keep > 0, rew, 0.0)
            succ = env.is_success(ob, action, ob2) if has_success else jnp.float32(0)
            done_after = jnp.maximum(done_before, jnp.maximum(done, blown_f))
            out = (ob, ob2, action, rew, done_after, keep, succ)
            return (env_state2, ob2, ps2, done_after), out

        def one_chunk(carry, model_params):
            carry, outs = jax.lax.scan(partial(body, model_params=model_params),
                                       carry, None, length=chunk)
            return carry, outs

        init_fn = jax.jit(jax.vmap(one_init, in_axes=(0, None)))
        # per-episode outputs are time-major [C, ...]; the episode vmap axis
        # lands at 0, so chunk outputs are [E, C, ...] and chunks concatenate
        # along axis 1
        chunk_fn = jax.jit(jax.vmap(one_chunk, in_axes=(0, None)))
        return init_fn, chunk_fn

    def _episodes_to_rollouts(self, episodes, no_rollouts: int):
        obs_seq, nxt_seq, act_seq, rew_seq, done_seq, valid_seq, succ_seq = \
            [np.asarray(x) for x in episodes]
        rollouts = []
        for i in range(no_rollouts):
            t = int(valid_seq[i].sum())
            rew_i = rew_seq[i, :t]
            if self.only_final_reward and t > 0:
                rew_i = np.concatenate([np.zeros(t - 1, rew_i.dtype),
                                        rew_i[-1:]])
            data = dict(observations=obs_seq[i, :t], next_observations=nxt_seq[i, :t],
                        actions=act_seq[i, :t], rewards=rew_i,
                        dones=done_seq[i, :t])
            if getattr(self, "_has_success_cache", False):
                data["successes"] = succ_seq[i, :t]
            rollouts.append(Rollout(data=data))
        return rollouts


def compute_reward_info(rollouts: RolloutBuffer, prefix: str = "",
                        exec_time: Optional[float] = None) -> dict:
    """Per-iteration reward metrics (reference: misc/helpers.py:212-230)."""
    info = {
        prefix + "mean_avg_reward": rollouts.mean_avg_reward,
        prefix + "mean_max_reward": rollouts.mean_max_reward,
        prefix + "mean_return": rollouts.mean_return,
        prefix + "std_return": rollouts.std_return,
    }
    if exec_time is not None:
        info[prefix + "exec_time"] = exec_time
    # final-step success per rollout; iterate (not as_array) so ragged
    # episode lengths from early termination don't break the stack
    succ = [float(r["successes"][-1]) for r in rollouts
            if "successes" in r and len(r) > 0]
    if succ:
        info[prefix + "mean_success"] = float(np.mean(succ))
        info[prefix + "std_success"] = float(np.std(succ))
    return info
