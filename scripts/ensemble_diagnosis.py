"""Diagnose the learned-model halfcheetah gap (VERDICT r4 Missing #1).

The quality table shows `halfcheetah_running/ensemble-icem` reaching ~460
return after 31 on-policy iterations while the GT twin (same planner family)
reaches 7080 in 3. The planner plans on the env's ANALYTIC cost applied to
imagined observations (models/base.trajectory_cost with
use_env_reward_as_cost=False), so the learned reward head is out of the
loop — the gap is dynamics fidelity and/or data coverage. This script
separates those two hypotheses with one controlled experiment:

  A. collect a mixed dataset: 5 random episodes (the protocol's bootstrap
     data) + 8 EXPERT episodes from the GT i-cem-blitz controller — i.e.
     the state distribution the learned-model planner would need to reach
     7080-class returns,
  B. train the shipped EnsembleModel (config hyperparameters) on it,
  C. measure (1) k-step open-loop prediction RMSE on held-out episodes —
     overall, and on the cost-relevant forward-velocity dim, (2) realized
     return when the iCEM planner plans through the trained model at the
     ensemble-icem budget, (3) the model-optimism gap: the model-imagined
     return of the EXECUTED action sequence vs the realized return.

Reading the result:
  - expert-trained planning >> on-policy quality row (~460)  => the blocker
    is DATA COVERAGE: the 36-episode on-policy bootstrap never visits
    fast-gait states, so the model can't support fast plans (the classic
    PETS slow-bootstrap regime; more iterations, not different code).
  - expert-trained planning ~ on-policy row, with a large optimism gap
    and k-step RMSE blowing up on velocities                 => the blocker
    is COMPOUNDING MODEL ERROR under distribution shift: CEM exploits
    h=30 open-loop optimism (the known PETS-class limitation).

Reference anchor: the reference ships only an 18-line ensemble stub
(icem/models/abstract_models.py:56-73) and no learned-model halfcheetah
number; the target here is the repo's own GT twin.

Usage (TPU, ~10-15 min warm):
    python scripts/ensemble_diagnosis.py
Writes results/ENSEMBLE_DIAGNOSIS_r05.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_RANDOM = 5
N_EXPERT = 8
N_HELDOUT_EXPERT = 2   # of the N_EXPERT, kept out of training
N_PLAN_EPISODES = 2
KS = (1, 3, 5, 10, 20, 30)


def main():
    from icem_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from icem_tpu.controllers import controller_from_string
    from icem_tpu.envs import env_from_string
    from icem_tpu.models.ensemble import EnsembleModel
    from icem_tpu.models.base import rollout_open_loop, broadcast_model_state
    from icem_tpu.runtime.buffer import RolloutBuffer
    from icem_tpu.runtime.config import resolve_settings
    from icem_tpu.runtime.rollout import RolloutManager, compute_reward_info
    from icem_tpu.runtime.seeding import Seeding

    Seeding.set_seed(0)
    gt_params = resolve_settings(
        os.path.join(REPO, "settings/halfcheetah_running/i-cem-blitz.json"))
    ens_params = resolve_settings(
        os.path.join(REPO, "settings/halfcheetah_running/ensemble-icem.json"))

    # the ensemble config's env (x-position in obs, flip penalty) for BOTH
    # data collection and planning, so the datasets share one obs layout
    env = env_from_string(ens_params.env, **ens_params.get("env_params", {}))
    task_horizon = int(ens_params.rollout_params["task_horizon"])
    rollout_man = RolloutManager(env, ens_params.rollout_params)

    out = {"what": __doc__.split("\n")[0],
           "env": ens_params.env, "task_horizon": task_horizon,
           "device": None, "phases": {}}
    import jax
    out["device"] = str(jax.devices()[0])

    # ---- A. data --------------------------------------------------------
    t0 = time.time()
    from icem_tpu.models import forward_model_from_string
    gt_model = forward_model_from_string(gt_params.forward_model)(env=env)
    gt_ctrl = controller_from_string(gt_params.controller)(
        env=env, forward_model=gt_model, **dict(gt_params.controller_params))
    rnd_ctrl = controller_from_string("random")(env=env)

    rollout_man.set_epoch(0)
    random_eps = rollout_man.sample(rnd_ctrl, mode="train", name="diag_rnd",
                                    no_rollouts=N_RANDOM)
    rollout_man.set_epoch(1)
    expert_eps = rollout_man.sample(gt_ctrl, mode="train", name="diag_exp",
                                    no_rollouts=N_EXPERT)
    exp_returns = [float(np.sum(r["rewards"])) for r in expert_eps]
    rnd_returns = [float(np.sum(r["rewards"])) for r in random_eps]
    out["phases"]["data"] = {
        "random_episodes": N_RANDOM, "expert_episodes": N_EXPERT,
        "expert_returns": [round(x, 1) for x in exp_returns],
        "random_returns": [round(x, 1) for x in rnd_returns],
        "wall_s": round(time.time() - t0, 1),
    }
    print("expert returns:", out["phases"]["data"]["expert_returns"])

    # ---- B. train -------------------------------------------------------
    t0 = time.time()
    train_buf = RolloutBuffer(
        rollouts=list(random_eps[:-1]) + list(expert_eps[:-N_HELDOUT_EXPERT]))
    held_eps = list(expert_eps[-N_HELDOUT_EXPERT:]) + [random_eps[-1]]
    model = EnsembleModel(env=env, seed=0,
                          **dict(ens_params.get("forward_model_params", {})))
    train_info = model.train(train_buf)
    out["phases"]["train"] = {**train_info,
                              "wall_s": round(time.time() - t0, 1)}
    print("train:", out["phases"]["train"])

    # ---- C1. k-step open-loop RMSE on held-out episodes ------------------
    t0 = time.time()
    vel_idx = env.observation_space.dim // 2  # qpos block then qvel block;
    # first qvel entry is the forward (x) velocity the running cost pays for
    per_k = {k: {"all": [], "fwd_vel": []} for k in KS}
    h = max(KS)
    model.propagation = "expectation"  # mean-of-members for the error metric
    for ep in held_eps:
        obs = np.asarray(ep["observations"], np.float32)
        acts = np.asarray(ep["actions"], np.float32)
        next_obs = np.asarray(ep["next_observations"], np.float32)
        starts = np.arange(0, len(obs) - h, 50)
        if not len(starts):
            continue
        a_batch = jnp.asarray(np.stack([acts[s:s + h] for s in starts]))
        o0 = jnp.asarray(obs[starts])
        ms = broadcast_model_state(model.init_model_state(None), len(starts))
        traj = rollout_open_loop(model.predict_fn, ms, o0, a_batch)
        pred = np.asarray(traj.next_observations)  # [h, p, obs]
        true = np.stack([next_obs[s:s + h] for s in starts], axis=1)
        err = pred - true
        for k in KS:
            per_k[k]["all"].append(np.sqrt(np.mean(err[k - 1] ** 2)))
            per_k[k]["fwd_vel"].append(
                np.sqrt(np.mean(err[k - 1][:, vel_idx] ** 2)))
    model.propagation = "ts1"
    true_vel_scale = float(np.sqrt(np.mean(
        np.asarray(held_eps[0]["observations"], np.float32)[:, vel_idx] ** 2)))
    out["phases"]["open_loop_rmse"] = {
        "heldout_episodes": len(held_eps), "starts_per_ep_every": 50,
        "fwd_vel_obs_index": int(vel_idx),
        "true_fwd_vel_rms": round(true_vel_scale, 3),
        "rmse_by_k": {str(k): {m: round(float(np.mean(v)), 4)
                               for m, v in per_k[k].items()} for k in KS},
        "wall_s": round(time.time() - t0, 1),
    }
    print("rmse:", json.dumps(out["phases"]["open_loop_rmse"]["rmse_by_k"]))

    # ---- C2. plan through the trained model ------------------------------
    t0 = time.time()
    ens_ctrl = controller_from_string(ens_params.controller)(
        env=env, forward_model=model, **dict(ens_params.controller_params))
    rollout_man.set_epoch(2)
    plan_eps = rollout_man.sample(ens_ctrl, mode="train", name="diag_plan",
                                  no_rollouts=N_PLAN_EPISODES)
    info = compute_reward_info(RolloutBuffer(rollouts=list(plan_eps)),
                               prefix="")
    realized = [float(np.sum(r["rewards"])) for r in plan_eps]

    # model-optimism gap: imagined return of the EXECUTED action sequence
    gaps = []
    for ep in plan_eps:
        obs0 = jnp.asarray(np.asarray(ep["observations"], np.float32)[0])
        acts = jnp.asarray(np.asarray(ep["actions"], np.float32))[None]
        ms = broadcast_model_state(model.init_model_state(None), 1)
        traj = rollout_open_loop(model.predict_fn, ms, obs0[None], acts)
        imag_cost = env.cost_fn(np.asarray(traj.observations)[:, 0],
                                np.asarray(traj.actions)[:, 0],
                                np.asarray(traj.next_observations)[:, 0])
        gaps.append({"imagined_return": round(float(-np.sum(imag_cost)), 1),
                     "realized_return": round(float(np.sum(ep["rewards"])), 1)})
    out["phases"]["plan_with_learned_model"] = {
        "budget": {"population":
                   int(ens_params.controller_params["num_simulated_trajectories"]),
                   "horizon": int(ens_params.controller_params["horizon"])},
        "episodes": N_PLAN_EPISODES,
        "realized_returns": [round(x, 1) for x in realized],
        "mean_return": round(float(info["mean_return"]), 1),
        "optimism_gap_per_episode": gaps,
        "wall_s": round(time.time() - t0, 1),
    }
    print("plan:", json.dumps(out["phases"]["plan_with_learned_model"]))

    # ---- verdict ----------------------------------------------------------
    onpolicy_row = 458.3  # best_mean_return, QUALITY_r05 ensemble-icem (31 it)
    gt_row = 7080.4       # QUALITY_r05 halfcheetah_running/i-cem-blitz
    mean_ret = float(info["mean_return"])
    out["reference_points"] = {"onpolicy_quality_row_best": onpolicy_row,
                               "gt_twin_final": gt_row}
    if mean_ret > 4 * onpolicy_row:
        verdict = ("DATA-COVERAGE blocker: the shipped model class supports "
                   "fast-gait planning once trained on expert-state data — "
                   "the on-policy protocol's 36 episodes simply haven't "
                   "bootstrapped that distribution yet (PETS-class sample "
                   "complexity, not a code defect).")
    else:
        verdict = ("COMPOUNDING-ERROR blocker: even expert-state training "
                   "does not make h=30 open-loop imagination faithful enough "
                   "for CEM not to exploit it (see optimism gap / k-step "
                   "velocity RMSE) — the known PETS-class limitation; levers "
                   "are shorter effective horizon, uncertainty-penalized "
                   "cost, or an RSSM-style latent model.")
    out["verdict"] = verdict
    print("VERDICT:", verdict)

    path = os.path.join(REPO, "results/ENSEMBLE_DIAGNOSIS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
