"""Goal-conditioned campaign at the north-star grid (C11 goal mode).

Runs the 100×100 / ls-15 / budget-800 study protocol with MI planning
twice per seed: FREE path enumeration vs an alternating-headland
WAYPOINT schedule (goals marching up the field two rows per hop; each
hop costs ≥ ~101, and the step still has real route choices thanks to
the goal-mode route-aware dedup key).  The schedule deliberately
carries 8 goals against a budget that affords 7 hops (8 × 101 > 800):
the first 7 are reachable and the 8th is structurally past the budget,
so the run also exercises the free-step FALLBACK exactly when the
remaining slice drops below the hop cost — `goals_reached` = 7 and a
nonzero `goal_fallbacks` count are the DESIGNED outcome, not noise
(`goals_affordable` records the budget-feasible count).  Records
held-out RMSE, samples, goals reached, and wall per arm: the waypoint
arm demonstrates the reference's directed-transect workflow at scale,
and the free arm prices the coverage constraint.

    python benchmarks/goal_campaign_bench.py [--seeds 3]
        [--json benchmarks/goal_campaign_rNN.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from algp_tpu.config import (
        AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
        FitConfig, KernelSpec,
    )
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    nr = nc = 100
    records = []
    for seed in range(args.seeds):
        fieldc = FieldConfig(num_rows=nr, num_cols=nc, true_ls_spatial=15.0,
                             seed=seed)
        # pilot ends at index n-1 = (99, 99); goals march up the field
        # two rows per hop, alternating headlands — hop cost ≈ 101,
        # inside the ~114 budget slice (800 / 7).  8 goals vs 7
        # affordable hops BY DESIGN: the last goal forces the free-step
        # fallback (see module docstring).
        goals = tuple(
            (nr - 3 - 2 * k) * nc + (0 if k % 2 == 0 else nc - 1)
            for k in range(8)
        )
        goals_affordable = 7  # floor(800 / ~101-cost hop)
        for arm, wp in (("free", None), ("waypoints", goals)):
            cfg = ExperimentConfig(
                kernel=KernelSpec("matern32", ds=2),
                fit=FitConfig(iters=60, restarts=2),
                acquisition=AcquisitionConfig(strategy="mi"),
                field=fieldc,
                episode=EpisodeConfig(num_pilot=24, budget=800.0,
                                      num_waypoints=7, samples_per_step=8,
                                      refit_every=2, seed=seed,
                                      waypoint_goals=wp),
            )
            env = FieldEnv(fieldc, cfg.kernel)
            t0 = time.perf_counter()
            result = Agent(env, cfg).run(max_steps=40)
            wall = time.perf_counter() - t0
            rec = {
                "arm": arm, "seed": seed,
                "final_rmse_test": round(result.rmse_test, 4),
                "n_sampled": int(len(result.state.sampled_idx)),
                "steps": result.state.step,
                "goals_reached": int(result.state.goal_i) if wp else None,
                "goals_affordable": goals_affordable if wp else None,
                "goal_fallbacks": sum(
                    1 for h in result.history
                    if h.get("phase") == "goal_fallback"
                ),
                "wall_s": round(wall, 2),
            }
            records.append(rec)
            print(json.dumps(rec))

    summary = {}
    for arm in ("free", "waypoints"):
        vals = np.array([r["final_rmse_test"] for r in records
                         if r["arm"] == arm], float)
        summary[arm] = {"mean": round(float(vals.mean()), 4),
                        "per_seed": [round(float(v), 4) for v in vals]}
    d = (np.array(summary["waypoints"]["per_seed"])
         - np.array(summary["free"]["per_seed"]))
    summary["waypoints-free"] = {
        "mean": round(float(d.mean()), 4),
        "sem": round(float(d.std(ddof=1) / np.sqrt(len(d))), 4)
        if len(d) > 1 else 0.0,
    }
    print(json.dumps({"summary": summary}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"records": records, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
