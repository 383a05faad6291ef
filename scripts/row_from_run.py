"""Fold an already-completed experiment run into results/QUALITY_r<N>.json.

The multi-seed table runner (scripts/quality_table.py) re-runs each config
from scratch; for the slowest learned-model experiments (PlaNet RSSM rows at
~2.5 min/training-iteration) a full run that already exists on disk is the
same evidence at zero extra TPU time. This script recomputes the table row
from the run directory's metrics.jsonl + resolved settings.json and merges
it, flagged with its provenance, so the artifact stays honest about the row
being a single seeded run rather than the default 3-seed aggregate.

    python scripts/row_from_run.py results/r3_planet_cartpole planet/cartpole_swingup

Passing several run directories (e.g. the per-seed dirs a timed-out
quality_table invocation left behind) aggregates them into one
mean +/- std row exactly like the table runner would have:

    python scripts/row_from_run.py results/quality_runs/ant_i-cem-blitz_s0 \
        results/quality_runs/ant_i-cem-blitz_s1 ant/i-cem-blitz
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def row_from_run(run_dir: str):
    with open(os.path.join(run_dir, "settings.json")) as f:
        params = json.load(f)
    info = {}
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            info.setdefault(rec["key"], []).append(rec["value"])

    th = params.get("rollout_params", {}).get("task_horizon", 200)
    n_roll = params.get("number_of_rollouts", 1)
    exec_times = info.get("train_exec_time", [])
    steady = exec_times[1:] if len(exec_times) > 1 else exec_times
    steps_per_s = (n_roll * th / (sum(steady) / len(steady))) if steady else None
    row = {
        "env": params["env"],
        "controller": params["controller"],
        "forward_model": params["forward_model"],
        "task_horizon": th,
        "iterations_run": len(info.get("train_mean_return", [])),
        "final_mean_return": round(float(info["train_mean_return"][-1]), 2),
        "best_mean_return": round(float(max(info["train_mean_return"])), 2),
        "wall_s": round(float(sum(exec_times)), 1),
        "compile_s": round(float(exec_times[0]), 1) if exec_times else None,
        "env_steps_per_s": round(steps_per_s, 1) if steps_per_s else None,
        "seeds": 1,
        "source_run": os.path.relpath(run_dir, REPO),
    }
    if os.environ.get("ICEM_ROW_DEVICE"):
        # platform the folded run executed on (not recoverable from the
        # run dir itself) — same honesty contract as quality_table rows
        row["device"] = os.environ["ICEM_ROW_DEVICE"]
    if "train_mean_success" in info:
        row["final_mean_success"] = round(float(info["train_mean_success"][-1]), 3)
    if "required_iterations_to_solve" in info:
        solve_at = int(info["required_iterations_to_solve"][-1])
        row["solved"] = bool(solve_at < int(params["training_iterations"]))
        row["solved_at_iteration"] = solve_at
    return row


def main():
    run_dirs, name = sys.argv[1:-1], sys.argv[-1]
    round_no = int(os.environ.get("ICEM_ROUND", "3"))
    out_path = os.path.join(REPO, "results", f"QUALITY_r{round_no:02d}.json")
    table = {"metric": "per_config_control_quality", "configs": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            table = json.load(f)
    rows = [row_from_run(d) for d in run_dirs]
    if len(rows) == 1:
        row = rows[0]
    else:
        from quality_table import aggregate
        row = aggregate(rows)
        row["seeds"] = len(rows)
        row["source_run"] = [r["source_run"] for r in rows]
    table.setdefault("configs", {})[name] = row
    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps({name: row}))


if __name__ == "__main__":
    main()
