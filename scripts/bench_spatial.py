"""Spatial-engine (3D) planner benchmark: Ant3D / HumanoidStandup3D plan_step.

Round-3's verdict flagged the 3D envs as having no TPU fast path (ant
i-cem-blitz measured at 2.67 env_steps/s on CPU through the generic
vmapped-autodiff engine). This benchmark measures the full iCEM plan step on
the spatial envs after the population-batched engine
(envs/physics/spatial_batched.py, picked up by SpatialEnv.rollout_batched):

- `fast`: the product path (rollout_batched -> batched-scalar rows)
- `generic`: the same plan step with the fast path disabled
  (batched_min_pop = inf), i.e. vmap over the autodiff engine — what
  round 3 shipped

and reports plan-step latency against the 50 ms real-time budget
(SURVEY §7: the reference's envs run at dt=0.05) plus the speedup.

Writes results/BENCH_SPATIAL_r{N}.json and prints one JSON line per env.

    python scripts/bench_spatial.py [--round 4] [--pop 4096] [--envs ant3d]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_env(name, env, pop, horizon, plan_steps, n_rep=3):
    import jax

    from icem_tpu.controllers import icem as ic
    from icem_tpu.models.ground_truth import GroundTruthModel

    n_act = env.action_space.shape[0]
    cfg = ic.ICemConfig(
        horizon=horizon, num_simulated_trajectories=pop,
        factor_decrease_num=1.25, noise_beta=1.0,
        elites_size=max(10, pop // 64),
        # shipped default for spatial envs (MpcICem cem_loop="auto"): the
        # single-shape scanned CEM loop — also what the quality campaign runs
        cem_loop="scan",
        action_dim=n_act, action_low=(-1.0,) * n_act,
        action_high=(1.0,) * n_act,
    )
    traj_per_plan_step = sum(cfg.population_schedule) + (
        cfg.elites_kept if cfg.shift_elites_over_time else 0)
    predict_fn = GroundTruthModel(env=env).predict_fn

    def episode(pstate, env_state, obs):
        def body(carry, _):
            es, ob, ps = carry
            res = ic.plan_step(cfg, predict_fn, env.cost_fn, ps, ob, es)
            es2, ob2, rew, _ = env.step(es, res.action)
            return (es2, ob2, res.state), rew

        (es, ob, ps), rews = jax.lax.scan(
            body, (env_state, obs, pstate), None, length=plan_steps)
        return rews

    run = jax.jit(episode)
    state = env.init_state(jax.random.key(0))
    obs = env.observation(state)
    pstate = ic.init_state(cfg, env.obs_dim, jax.random.key(1))

    t0 = time.perf_counter()
    rews = run(pstate, state, obs)
    jax.block_until_ready(rews)
    compile_s = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(rews))), "non-finite rewards"

    # distinct keys per rep: the axon tunnel memoizes identical executions
    rep_states = [ic.init_state(cfg, env.obs_dim, jax.random.key(100 + r))
                  for r in range(n_rep)]
    t0 = time.perf_counter()
    for r in range(n_rep):
        rews = run(rep_states[r], state, obs)
    jax.block_until_ready(rews)
    elapsed = (time.perf_counter() - t0) / n_rep

    plan_ms = elapsed / plan_steps * 1000.0
    rollouts_per_s = traj_per_plan_step * plan_steps / elapsed
    return {
        "population": pop,
        "horizon": horizon,
        # provenance: the benched env construction and loop flavor, so
        # cross-round timings are comparable without reading the script
        "env_kwargs": {k: v for k, v in env.init_kwargs.items()},
        "cem_loop": cfg.cem_loop,
        "traj_per_plan_step": traj_per_plan_step,
        "plan_step_ms": round(plan_ms, 2),
        "rollouts_per_s": round(rollouts_per_s, 1),
        "env_steps_per_s": round(rollouts_per_s * horizon, 0),
        "within_50ms_budget": bool(plan_ms <= 50.0),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    # two shipped operating points: reference-scale planning population
    # (~500 trajectories/iteration, the real-time-budget question) and the
    # throughput point used since r4
    ap.add_argument("--pop", default="504,4096",
                    help="comma-separated population sizes")
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--plan-steps", type=int, default=5)
    ap.add_argument("--envs", default="ant3d,humanoid_standup3d")
    ap.add_argument("--skip-generic", action="store_true",
                    help="only measure the fast path (generic is ~100x slower)")
    args = ap.parse_args()

    from icem_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    from icem_tpu.envs.ant3d import Ant3D
    from icem_tpu.envs.humanoid3d import HumanoidStandup3D

    # GT planning needs positions in the obs (Ant3D.cost_fn's x-velocity
    # delta and the GT-state round-trip both require them)
    from icem_tpu.envs.humanoid3d import Humanoid3D
    makers = {
        "ant3d": lambda: Ant3D(
            exclude_current_positions_from_observation=False),
        "humanoid_standup3d": HumanoidStandup3D,
        "humanoid3d": Humanoid3D,
    }
    pops = [int(p) for p in str(args.pop).split(",")]
    out = {"devices": [str(d) for d in jax.devices()], "envs": {}}
    for name in args.envs.split(","):
        res = {}
        for pop in pops:
            env = makers[name]()
            row = {"fast": bench_env(name, env, pop, args.horizon,
                                     args.plan_steps)}
            if not args.skip_generic and pop == max(pops):
                env_g = makers[name]()
                env_g.batched_min_pop = 1 << 60  # force the vmap fallback
                # the generic path is brutally slower: one plan step only
                row["generic"] = bench_env(name, env_g, pop, args.horizon,
                                           plan_steps=1, n_rep=1)
                row["speedup"] = round(row["generic"]["plan_step_ms"]
                                       / row["fast"]["plan_step_ms"], 1)
            res[f"pop{pop}"] = row
            print(json.dumps({"env": name, "pop": pop, **row}), flush=True)
        out["envs"][name] = res

    path = os.path.join("results", f"BENCH_SPATIAL_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
