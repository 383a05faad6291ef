"""iCEM vs vanilla CEM at equal sample budgets (the reference's headline).

The reference README claims iCEM needs 2.7-22x fewer samples than CEM
baselines (martius-lab/iCEM README.md:7). This script reproduces the
comparison shape on the pure-JAX HalfCheetah: both planners run fused
episodes at the SAME trajectory budget per step; iCEM's improvements
(colored noise, decay, elite memory, execute-best) should dominate at small
budgets and the gap should close as budgets grow.

    python scripts/compare_icem_cem.py            # ~5 budgets x 2 planners
    BUDGETS=16,64 EPISODES=2 python scripts/compare_icem_cem.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_planner(kind: str, budget: int, episodes: int, task_horizon: int,
                seed: int = 0):
    import jax
    from icem_tpu.controllers.cem_std import MpcCemStd
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.envs.cheetah import HalfCheetah
    from icem_tpu.models.ground_truth import GroundTruthModel
    from icem_tpu.runtime.rollout import RolloutManager
    from icem_tpu.runtime.seeding import Seeding

    Seeding.set_seed(seed)
    env = HalfCheetah(exclude_current_positions_from_observation=False,
                      penalise_flipping=True)
    model = GroundTruthModel(env=env)
    if kind == "icem":
        # i-cem-blitz structure at the given budget
        ctrl = MpcICem(env=env, forward_model=model, horizon=30,
                       num_simulated_trajectories=budget,
                       factor_decrease_num=1.25, seed=seed,
                       action_sampler_params=dict(
                           noise_beta=0.25, elites_size=max(2, budget // 4)))
    else:
        # vanilla CEM: white truncated-normal noise, fixed population,
        # no elite memory (reference mpc.py:142-327)
        ctrl = MpcCemStd(env=env, forward_model=model, horizon=30,
                         num_simulated_trajectories=budget, seed=seed,
                         action_sampler_params=dict(
                             opt_iterations=3,
                             elites_size=max(2, budget // 4)))
    man = RolloutManager(env, dict(task_horizon=task_horizon,
                                   use_env_states=True, fuse_on_device=True))
    rollouts = man.sample(ctrl, mode="train", no_rollouts=episodes)
    return float(np.mean([np.sum(r["rewards"]) for r in rollouts]))


def main():
    from icem_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    budgets = [int(b) for b in os.environ.get("BUDGETS", "8,16,32,64,128").split(",")]
    episodes = int(os.environ.get("EPISODES", 3))
    task_horizon = int(os.environ.get("TASK_HORIZON", 100))
    table = {}
    for b in budgets:
        r_icem = run_planner("icem", b, episodes, task_horizon)
        r_cem = run_planner("cem", b, episodes, task_horizon)
        table[b] = {"icem_return": round(r_icem, 1), "cem_return": round(r_cem, 1)}
        print(f"budget {b:4d} traj/step: iCEM {r_icem:8.1f}   CEM {r_cem:8.1f}",
              file=sys.stderr)
    print(json.dumps({"metric": "icem_vs_cem_halfcheetah",
                      "task_horizon": task_horizon, "episodes": episodes,
                      "results": table}))


if __name__ == "__main__":
    main()
