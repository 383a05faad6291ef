"""Multi-chip scaling benchmark: population-sharded iCEM over a device mesh.

Measures plan-step throughput at increasing device counts to report the
scaling-efficiency target of BASELINE.md (>= 80% from 1 host to 2 hosts).

    python scripts/bench_scaling.py                  # all local devices
    BENCH_DEVICES=4 python scripts/bench_scaling.py  # subset

Across hosts, the env-gated jax.distributed bootstrap wires the cluster
(icem_tpu/parallel/multihost.py has the full 2-host launch line):

    ICEM_MULTIHOST=1 ICEM_COORDINATOR=host0:8476 ICEM_NUM_PROCESSES=2 \
        ICEM_PROCESS_ID=<0|1> python scripts/bench_scaling.py

Without TPU hardware, run on a CPU-simulated mesh (numbers are NOT
performance-meaningful, only the collectives/sharding path is exercised):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_devices(n_dev, pop, steps=5):
    import jax
    from jax.sharding import Mesh
    from icem_tpu.controllers import icem as ic
    from icem_tpu.envs.cheetah import HalfCheetah
    from icem_tpu.models.ground_truth import GroundTruthModel
    from icem_tpu.parallel.plan import plan_step_sharded

    env = HalfCheetah(exclude_current_positions_from_observation=True,
                      penalise_flipping=True)
    predict_fn = GroundTruthModel(env=env).predict_fn
    cfg = ic.ICemConfig(
        horizon=int(os.environ.get("BENCH_HORIZON", 30)),
        num_simulated_trajectories=pop, factor_decrease_num=1.25,
        noise_beta=0.25, elites_size=max(10, pop // 64),
        action_dim=6, action_low=(-1.0,) * 6, action_high=(1.0,) * 6)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("pop",))

    state = env.init_state(jax.random.key(0))
    obs = env.observation(state)
    pstate = ic.init_state(cfg, env.obs_dim, jax.random.key(1))

    plan = jax.jit(lambda p, o, s: plan_step_sharded(
        cfg, predict_fn, env.cost_fn, mesh, p, o, s))
    res = plan(pstate, obs, state)
    jax.block_until_ready(res.action)

    t0 = time.perf_counter()
    ps = res.state
    for _ in range(steps):
        res = plan(ps, obs, state)
        ps = res.state
    jax.block_until_ready(res.action)
    dt = (time.perf_counter() - t0) / steps
    traj = sum(cfg.population_schedule) + cfg.elites_kept
    return traj / dt, dt * 1e3


def main():
    from icem_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from icem_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()
    # honor a JAX_PLATFORMS request before backend init (the TPU plugin in
    # some images overrides the env var at import time)
    env_platform = os.environ.get("JAX_PLATFORMS") or os.environ.get("JAX_PLATFORM_NAME")
    import jax
    if env_platform:
        try:
            jax.config.update("jax_platforms", env_platform)
        except RuntimeError:
            pass
    n_all = len(jax.devices())
    n_max = int(os.environ.get("BENCH_DEVICES", n_all))
    pop = int(os.environ.get("BENCH_POP", 4096))
    results = {}
    n = 1
    while n <= min(n_max, n_all):
        # weak scaling: population grows with the mesh
        rps, ms = bench_devices(n, pop * n)
        results[n] = {"rollouts_per_s": round(rps), "plan_ms": round(ms, 2)}
        print(f"devices={n:3d} pop={pop*n:6d}: {rps:,.0f} rollouts/s "
              f"({ms:.1f} ms/plan)", file=sys.stderr)
        n *= 2
    base = results[1]["rollouts_per_s"]
    for n, r in results.items():
        r["scaling_efficiency"] = round(r["rollouts_per_s"] / (base * n), 3)
    print(json.dumps({"metric": "icem_scaling", "results": results}))


if __name__ == "__main__":
    main()
