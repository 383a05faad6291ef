"""Per-config control-quality table: the round artifact for BASELINE.md's
Reporting row.

Runs every shipped settings/* experiment through the PRODUCT path
(icem_tpu.main.run -> factories -> fused episodes) and records, per config,
statistics over ICEM_QUALITY_SEEDS independent runs (default 3 seeds;
ground-truth-model configs additionally run >=3 episodes per iteration):
mean +/- std of final/best return, success rate, solve metric (where the
config defines one), and wall-clock episode throughput. Learned-model
configs (ensemble / RSSM) are truncated to a few training iterations unless
ICEM_QUALITY_FULL=1 — the table documents the truncation.

    python scripts/quality_table.py                 # all configs
    CONFIGS=pendulum/i-cem-blitz python scripts/quality_table.py
    ICEM_QUALITY_SEEDS=0 python scripts/quality_table.py   # quick single-seed

Writes results/QUALITY_r<N>.json (round number from ICEM_ROUND, default 2)
and prints the JSON to stdout.
"""

import glob
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# learned-model configs train for many iterations; cap them for the table
TRUNCATE_ITERS = {
    # 10 iterations ≈ 12k env steps: enough to show the post-data-starvation
    # learning trend at ~1/3 the wall of the full 30-iteration protocol
    "halfcheetah_running/ensemble-icem": 10,
    "pendulum/ensemble-icem": 5,
    # 20 iterations reaches the post-learning regime of the full 41-iter
    # protocol (r3 full run: -1565 -> -302, most of it in the first half)
    "planet/cartpole_swingup": 20,
    # past the r3 3-iteration stub (VERDICT r3 Missing #3): enough episodes
    # for the RSSM to see a few refits and show a learning trend
    "planet/cheetah_run": 8,
    "planet/reacher_easy": 8,
}


def run_config(path: str, out_root: str, seed: int, force_unfuse: bool = False):
    from icem_tpu.main import run
    from icem_tpu.runtime.config import resolve_settings

    name = os.path.relpath(path, os.path.join(REPO, "settings"))[:-len(".json")]
    params = resolve_settings(path)
    over = {"model_dir": os.path.join(out_root,
                                      f"{name.replace('/', '_')}_s{seed}"),
            "seed": seed,
            "checkpoints": {"load": False, "save": False}}
    if params.forward_model in ("GroundTruthModel", "ParallelGroundTruthModel"):
        # no training loop -> episodes are independent; >=3 per iteration
        # gives the per-seed mean some width at negligible extra compile cost
        over["number_of_rollouts"] = max(3, int(params.get("number_of_rollouts", 1)))
    rp_over = {}
    if force_unfuse or os.environ.get("ICEM_QUALITY_NO_FUSE"):
        # escape hatch for configs whose fused-episode program crashes the
        # axon remote-compile worker: host-driven episodes, jitted plan steps
        rp_over["fuse_on_device"] = False
    if os.environ.get("ICEM_QUALITY_TH"):
        # truncated episodes for very slow table entries (documented in-row)
        rp_over["task_horizon"] = int(os.environ["ICEM_QUALITY_TH"])
    if rp_over:
        over["rollout_params"] = {**params.rollout_params.get_pickleable(),
                                  **rp_over}
    truncated = None
    is_gt = params.forward_model in ("GroundTruthModel",
                                     "ParallelGroundTruthModel")
    if name in TRUNCATE_ITERS and not os.environ.get("ICEM_QUALITY_FULL"):
        truncated = TRUNCATE_ITERS[name]
        over["training_iterations"] = truncated
    elif is_gt and int(params.training_iterations) < 3:
        # GT episodes are independent: >=3 iterations x >=3 rollouts gives
        # each seed 9+ episodes, and steady-state throughput excludes the
        # compile-paying first iteration (VERDICT r4 #2)
        over["training_iterations"] = 3
    elif int(params.training_iterations) < 2:
        # at least two iterations so steady-state throughput excludes compile
        over["training_iterations"] = 2
    params = resolve_settings({**params.get_pickleable(), **over})

    t0 = time.time()
    info = run(params)
    wall = time.time() - t0

    th = params.rollout_params.get("task_horizon", 200)
    n_roll = params.get("number_of_rollouts", 1)
    iters = len(info.get("step", []))
    # steady-state throughput: iteration 0 pays the one-time XLA compile of
    # the fused episode, so rate from the later iterations when available
    exec_times = info.get("train_exec_time", [])
    steady = exec_times[1:] if len(exec_times) > 1 else exec_times
    steps_per_s = (n_roll * th / (sum(steady) / len(steady))) if steady else None
    import jax
    row = {
        "env": params.env,
        "controller": params.controller,
        "forward_model": params.forward_model,
        # returns/success are device-independent; wall_s/env_steps_per_s are
        # not — record the platform so CPU-fallback rows (run when the TPU
        # tunnel is down) aren't mistaken for TPU throughput
        "device": jax.devices()[0].platform,
        "task_horizon": th,
        "iterations_run": iters,
        "final_mean_return": round(float(info["train_mean_return"][-1]), 2),
        "best_mean_return": round(float(max(info["train_mean_return"])), 2),
        "wall_s": round(wall, 1),
        "compile_s": round(float(exec_times[0]), 1) if exec_times else None,
        "env_steps_per_s": round(steps_per_s, 1) if steps_per_s else None,
    }
    if truncated is not None:
        row["truncated_to_iters"] = truncated
    if not is_gt:
        # learned-model configs: the whole learning curve, not just its
        # endpoints — the reference reports per-iteration mean return
        # (misc/helpers.py:212-230) and the curve SHAPE is the diagnostic
        # (e.g. r5: ensemble cheetah best 143 at iter ~6 then -115 at 11
        # reads completely differently from a flat -115)
        row["return_curve"] = [round(float(r), 1)
                               for r in info["train_mean_return"]]
    if os.environ.get("ICEM_QUALITY_TH"):
        row["truncated_task_horizon"] = int(os.environ["ICEM_QUALITY_TH"])
    if force_unfuse or os.environ.get("ICEM_QUALITY_NO_FUSE"):
        row["unfused_episodes"] = True
    if "train_mean_success" in info:
        row["final_mean_success"] = round(float(info["train_mean_success"][-1]), 3)
    if "required_iterations_to_solve" in info:
        solve_at = int(info["required_iterations_to_solve"][-1])
        row["solved"] = bool(solve_at < params.training_iterations)
        row["solved_at_iteration"] = solve_at
    return name, row


def aggregate(rows):
    """Seed-aggregated row: mean +/- std of the per-seed statistics."""
    agg = dict(rows[0])            # env/controller/model/horizon metadata
    agg["seeds"] = len(rows)

    def stat(key):
        vals = [r[key] for r in rows if r.get(key) is not None]
        if not vals:
            return None, None
        return (round(float(np.mean(vals)), 2),
                round(float(np.std(vals)), 2))

    for key in ("final_mean_return", "best_mean_return", "final_mean_success"):
        if key in agg:
            agg[key], agg[key + "_std"] = stat(key)
    for key in ("wall_s", "compile_s", "env_steps_per_s"):
        if agg.get(key) is not None:
            agg[key] = stat(key)[0]
    if "solved" in agg:
        agg["solved"] = all(bool(r.get("solved")) for r in rows)
        agg["solved_seeds"] = sum(bool(r.get("solved")) for r in rows)
        agg["solved_at_iteration"] = [r.get("solved_at_iteration") for r in rows]
    agg["per_seed_final_return"] = [r.get("final_mean_return") for r in rows]
    curves = [r.get("return_curve") for r in rows if r.get("return_curve")]
    if curves:
        agg["per_seed_return_curve"] = curves
    return agg


def _one_seed_entry(config_name: str, seed: int, force_unfuse: bool):
    """Subprocess entry: run ONE (config, seed) and print the row as a
    marker-tagged JSON line. Isolation matters: a TPU worker crash poisons
    the whole JAX backend of its process (every later device call raises
    UNAVAILABLE), so the r4/r5 in-process 'retry unfused' was dead on
    arrival — only a fresh process can actually retry."""
    path = os.path.join(REPO, "settings", config_name + ".json")
    out_root = os.path.join(REPO, "results", "quality_runs")
    _, row = run_config(path, out_root, seed, force_unfuse=force_unfuse)
    print("QUALITY_ROW " + json.dumps(row), flush=True)


def _run_seed_subprocess(name: str, seed: int, force_unfuse: bool):
    """Run one (config, seed) in a fresh interpreter; return (row, err)."""
    import subprocess
    prog = ("import scripts.quality_table as q; "
            f"q._one_seed_entry({name!r}, {seed}, {force_unfuse})")
    proc = subprocess.Popen([sys.executable, "-c", prog], cwd=REPO,
                            stdout=subprocess.PIPE, stderr=sys.stderr,
                            text=True)
    try:
        out, _ = proc.communicate()
    except BaseException:
        proc.kill()
        proc.wait(timeout=30)
        raise
    for line in (out or "").splitlines():
        if line.startswith("QUALITY_ROW "):
            return json.loads(line[len("QUALITY_ROW "):]), None
    return None, f"seed subprocess rc={proc.returncode}"


def _save_config_rows(table, name, rows, seeds, out_path):
    """Write the config's row from the seeds done SO FAR — after every seed,
    not after the seed loop, so a cut-off campaign (round end, tunnel death,
    timeout) keeps every completed seed's result (r4 lost a full standup
    seed set this way)."""
    ok_rows = [r for r in rows if "error" not in r]
    err_rows = [r for r in rows if "error" in r]
    if ok_rows:
        table[name] = aggregate(ok_rows)
        if err_rows:
            table[name]["errors"] = err_rows
    else:
        table[name] = err_rows[0]
    with open(out_path, "w") as f:
        json.dump({"metric": "per_config_control_quality",
                   "seeds": seeds, "configs": table}, f, indent=1)


def main():
    only = os.environ.get("CONFIGS")
    seeds = [int(s) for s in os.environ.get("ICEM_QUALITY_SEEDS", "0,1,2").split(",")]
    round_no = int(os.environ.get("ICEM_ROUND", "2"))
    out_path = os.path.join(REPO, "results", f"QUALITY_r{round_no:02d}.json")
    table = {}
    if os.path.exists(out_path):
        # merge: partial re-runs (e.g. after a config fix or a transient
        # tunnel error) update their rows without dropping the rest
        with open(out_path) as f:
            table = json.load(f).get("configs", {})
    configs = sorted(glob.glob(os.path.join(REPO, "settings", "*", "*.json")))
    configs = [c for c in configs if "/defaults/" not in c
               and not c.endswith("/defaults.json")]
    if only:
        keys = only.split(",")
        configs = [c for c in configs if any(k in c for k in keys)]
    for path in configs:
        name = os.path.relpath(path, os.path.join(REPO, "settings"))[:-len(".json")]
        rows = []
        for seed in seeds:
            print(f"=== {name} seed {seed}", file=sys.stderr, flush=True)
            row, err = _run_seed_subprocess(name, seed, force_unfuse=False)
            if row is None:
                # a fused-episode program can crash the TPU runtime outright
                # (r4: humanoid_standup blitz, UNAVAILABLE worker crash);
                # the seed already paid for its compile, so retry it once
                # through the host episode loop — in a FRESH process, the
                # crashed one's backend is unrecoverable — and record the
                # degradation instead of losing the row to an error string
                print(f"=== {name} seed {seed}: retrying unfused after "
                      f"{err}", file=sys.stderr, flush=True)
                row, err2 = _run_seed_subprocess(name, seed,
                                                 force_unfuse=True)
                if row is not None:
                    row["fused_error"] = err
                else:
                    # append, don't replace: earlier seeds' completed results
                    # already paid full runtime and must survive a later crash
                    rows.append({"error": f"{err}; unfused retry: {err2}",
                                 "seed": seed})
                    _save_config_rows(table, name, rows, seeds, out_path)
                    continue
            rows.append(row)
            _save_config_rows(table, name, rows, seeds, out_path)
        print(json.dumps({name: table[name]}), file=sys.stderr, flush=True)
    print(json.dumps({"metric": "per_config_control_quality", "configs": table}))


if __name__ == "__main__":
    main()
