"""iCEM vs vanilla CEM at equal sample budgets (the reference's headline).

The reference README claims iCEM needs 2.7-22x fewer samples than CEM
baselines (martius-lab/iCEM README.md:7). This script reproduces the
comparison shape on two envs: the pure-JAX HalfCheetah (return vs budget)
and the Door manipulation task (success vs budget — the hard-exploration
regime where the iCEM budget schedule earns its keep). Both planners run
fused episodes at the SAME trajectory budget per step; iCEM's improvements
(colored noise, decay, elite memory, execute-best) should dominate at small
budgets and the gap should close as budgets grow.

    python scripts/compare_icem_cem.py                    # both envs
    ENVS=door BUDGETS=40,120 SEEDS=0,1,2 python scripts/compare_icem_cem.py

Writes results/ICEM_VS_CEM_r<N>.json (round from ICEM_ROUND, default 2).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_env(env_name: str):
    if env_name == "halfcheetah":
        from icem_tpu.envs.cheetah import HalfCheetah
        return HalfCheetah(exclude_current_positions_from_observation=False,
                           penalise_flipping=True)
    if env_name == "door":
        from icem_tpu.envs.adroit import Door
        return Door(shaped_reward=False)
    raise ValueError(env_name)


# per-env planner structure: i-cem-blitz / cem-std analogs of the shipped
# settings (noise_beta per settings/<env>/i-cem-blitz.json)
PLANNER = {
    "halfcheetah": dict(horizon=30, noise_beta=0.25, task_horizon=100),
    "door": dict(horizon=30, noise_beta=2.5, task_horizon=200),
}


def run_planner(kind: str, env_name: str, budget: int, episodes: int,
                task_horizon: int, seed: int = 0):
    from icem_tpu.controllers.cem_std import MpcCemStd
    from icem_tpu.controllers.icem import MpcICem
    from icem_tpu.models.ground_truth import GroundTruthModel
    from icem_tpu.runtime.rollout import RolloutManager
    from icem_tpu.runtime.seeding import Seeding

    Seeding.set_seed(seed)
    env = make_env(env_name)
    model = GroundTruthModel(env=env)
    spec = PLANNER[env_name]
    if kind == "icem":
        # i-cem-blitz structure at the given budget
        ctrl = MpcICem(env=env, forward_model=model, horizon=spec["horizon"],
                       num_simulated_trajectories=budget,
                       factor_decrease_num=1.25, seed=seed,
                       action_sampler_params=dict(
                           noise_beta=spec["noise_beta"],
                           elites_size=max(2, budget // 4)))
    else:
        # vanilla CEM: white truncated-normal noise, fixed population,
        # no elite memory (reference mpc.py:142-327)
        ctrl = MpcCemStd(env=env, forward_model=model, horizon=spec["horizon"],
                         num_simulated_trajectories=budget, seed=seed,
                         action_sampler_params=dict(
                             opt_iterations=3,
                             elites_size=max(2, budget // 4)))
    man = RolloutManager(env, dict(task_horizon=task_horizon,
                                   use_env_states=True, fuse_on_device=True))
    rollouts = man.sample(ctrl, mode="train", no_rollouts=episodes)
    returns = [float(np.sum(r["rewards"])) for r in rollouts]
    successes = None
    # task solved if ANY step of the episode meets the success predicate
    # (the reference's solve-metric convention for door: max door angle);
    # base Env.is_success returns None for envs with no success notion
    flags = [env.is_success(r["observations"], r["actions"],
                            r["next_observations"]) for r in rollouts]
    if all(f is not None for f in flags):
        successes = [float(np.max(np.asarray(f))) for f in flags]
    return returns, successes


def main():
    from icem_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    env_names = os.environ.get("ENVS", "halfcheetah,door").split(",")
    budgets = [int(b) for b in os.environ.get("BUDGETS", "8,16,32,64,128").split(",")]
    seeds = [int(s) for s in os.environ.get("SEEDS", "0,1,2").split(",")]
    episodes = int(os.environ.get("EPISODES", 3))
    round_no = int(os.environ.get("ICEM_ROUND", "2"))
    out_path = os.path.join(REPO, "results", f"ICEM_VS_CEM_r{round_no:02d}.json")

    out = {"metric": "icem_vs_cem",
           "episodes_per_seed": episodes, "seeds": seeds, "envs": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        out["envs"] = prev.get("envs", {})

    for env_name in env_names:
        task_horizon = int(os.environ.get("TASK_HORIZON",
                                          PLANNER[env_name]["task_horizon"]))
        table = {"task_horizon": task_horizon}
        for b in budgets:
            row = {}
            for kind in ("icem", "cem"):
                rets, succ = [], []
                for seed in seeds:
                    r, s = run_planner(kind, env_name, b, episodes,
                                       task_horizon, seed)
                    rets += r
                    if s is not None:
                        succ += s
                row[f"{kind}_return"] = round(float(np.mean(rets)), 1)
                row[f"{kind}_return_std"] = round(float(np.std(rets)), 1)
                if succ:
                    row[f"{kind}_success"] = round(float(np.mean(succ)), 3)
            table[b] = row
            print(f"[{env_name}] budget {b:4d}: {json.dumps(row)}",
                  file=sys.stderr, flush=True)
            out["envs"][env_name] = table
            with open(out_path, "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
