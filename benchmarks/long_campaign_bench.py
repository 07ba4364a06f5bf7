"""Long-campaign episode benchmark (c5_long): the sampled set grows into
the thousands, and refits swap from the exact O(n³)-per-step MLL fit to
the collapsed SGPR bound (FitConfig.sparse_threshold) at the crossover.

Runs the campaign twice — sparse-refit (the preset) and exact-refit
(control) — and reports per-step wall, total/after-crossover refit time,
and final RMSE for both, as one JSON line.  Timing is honest: every
episode step ends in a host transfer of its metrics.

    python benchmarks/long_campaign_bench.py [--steps 100] [--json out]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def run_campaign(cfg, steps: int, n_cross: int):
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    env = FieldEnv(cfg.field, cfg.kernel)
    agent = Agent(env, cfg)
    t0 = time.perf_counter()
    result = agent.run(max_steps=steps)
    wall = time.perf_counter() - t0
    hist = result.history
    # refits are dispatched ASYNC: their device time is absorbed into the
    # NEXT plan's synchronizing read.  Step k's refit (fit_s > 0 at k)
    # lands in the plan logged at step k+1, so split the plan times by
    # whether they follow a refit — that difference IS the refit's
    # steady-state device cost.
    absorbed, plain = [], []
    for h_prev, h in zip(hist[1:], hist[2:]):
        if "plan_s" not in h:
            continue
        if h_prev.get("fit_s", 0) > 0.01:
            absorbed.append((h["plan_s"], h["n_sampled"]))
        else:
            plain.append(h["plan_s"])

    def med(v):
        return round(sorted(v)[len(v) // 2], 3) if v else 0

    absorbed_late = [p for p, n in absorbed if n > n_cross]
    return {
        "wall_s": round(wall, 2),
        "steps": result.state.step,
        "n_sampled": int(len(result.state.sampled_idx)),
        "per_step_ms": round(1e3 * wall / max(1, result.state.step), 1),
        "plan_ms_median": round(1e3 * med(plain), 1),
        "refit_step_ms_median": round(1e3 * med([p for p, _ in absorbed]), 1),
        "refit_step_ms_median_after_crossover": round(
            1e3 * med(absorbed_late), 1
        ),
        "rmse": round(result.rmse, 4),
        "rmse_test": round(result.rmse_test, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from algp_tpu.config import PRESETS

    base = PRESETS["c5_long"]
    # warm-up on a second seed (compiles for both fit programs)
    warm = dataclasses.replace(
        base,
        field=dataclasses.replace(base.field, seed=1),
        episode=dataclasses.replace(base.episode, seed=1),
    )
    n_cross = base.fit.sparse_threshold
    # the warm-up must CROSS the sparse threshold (n > 512 ⇒ ~46 steps
    # at 10 samples/step) so the SGPR refit program compiles here, not
    # inside the measured sparse campaign
    run_campaign(warm, min(args.steps, 60), n_cross)

    sparse = run_campaign(base, args.steps, n_cross)
    exact_cfg = dataclasses.replace(
        base, fit=dataclasses.replace(base.fit, sparse_threshold=0)
    )
    # same crossover filter for the control, so "after crossover"
    # compares the two fit programs on the SAME campaign phase
    exact = run_campaign(exact_cfg, args.steps, n_cross)

    rec = {
        "metric": "long_campaign_c5_long",
        "value": sparse["per_step_ms"],
        "unit": "ms/step",
        "sparse": sparse,
        "exact_control": exact,
        "refit_step_speedup_after_crossover": (
            round(
                exact["refit_step_ms_median_after_crossover"]
                / max(sparse["refit_step_ms_median_after_crossover"], 1e-9),
                2,
            )
            if sparse["refit_step_ms_median_after_crossover"] else None
        ),
    }
    line = json.dumps(rec)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
