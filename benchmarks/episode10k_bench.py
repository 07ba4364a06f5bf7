"""Config-5 informative-path episode at north-star scale (100×100 = 10k
grid) on the real TPU — the full sim loop with the implicit-precision MI
path (SURVEY.md §3.5, §6; VERDICT r1 missing #4).

Prints one JSON line with the total wall-clock (warm; compiles excluded by
a warm-up episode on a second seed) and per-step breakdown.  Timing is
honest by construction: every step ends in a synchronizing device→host
read (the full posterior field on ≤16k grids, the device-reduced metric
scalars past that), so wall-clock cannot under-report.  NOTE: per-step
figures amortize the one-time episode startup (pilot fit, initial seed,
first-execution stalls) over `steps`; `steady_state_per_step_ms` excludes
only the final posterior fetch.

    python benchmarks/episode10k_bench.py [--steps 12] [--json out.json]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--preset", default="c5_10k",
                    help="episode preset (c5_10k, or c5_20k for the "
                    "2x-scale headroom run)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--refit-iters", type=int, default=None,
                    help="override FitConfig.refit_iters (warm refits)")
    ap.add_argument("--refit-restarts", type=int, default=None,
                    help="override FitConfig.refit_restarts (warm refits)")
    ap.add_argument("--lagged-refit", action="store_true",
                    help="EpisodeConfig.lagged_refit: dispatch each refit "
                    "after its step's plan synced, consume it one plan "
                    "later (the refit drain then lands TWO records after "
                    "the fit record — see plan_ms_median_after_refit2)")
    args = ap.parse_args()

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS[args.preset]
    if args.refit_iters is not None or args.refit_restarts is not None:
        # 0 is a meaningful override (refit_iters=0 = full refits, the
        # warm-vs-full A/B control arm) — never `or` these defaults in
        fitc = dataclasses.replace(
            base.fit,
            refit_iters=(base.fit.refit_iters if args.refit_iters is None
                         else args.refit_iters),
            refit_restarts=(base.fit.refit_restarts
                            if args.refit_restarts is None
                            else args.refit_restarts),
        )
        base = dataclasses.replace(base, fit=fitc)
    if args.lagged_refit:
        base = dataclasses.replace(
            base, episode=dataclasses.replace(
                base.episode, lagged_refit=True))

    def run(seed: int):
        fieldc = dataclasses.replace(base.field, seed=seed)
        epc = dataclasses.replace(base.episode, seed=seed)
        cfg = dataclasses.replace(base, field=fieldc, episode=epc)
        env = FieldEnv(fieldc, cfg.kernel)
        agent = Agent(env, cfg)
        t0 = time.perf_counter()
        result = agent.run(max_steps=args.steps)
        wall = time.perf_counter() - t0
        return result, wall

    # warm-up episode compiles every jitted program (different seed so the
    # timed run's host-side rng work is equivalent but data differs)
    run(1)
    result, wall = run(0)

    steps = result.state.step
    plan_s = [h["plan_s"] for h in result.history if "plan_s" in h]
    fit_s = [h["fit_s"] for h in result.history[1:] if "fit_s" in h]

    def med_ms(key, hist=None):
        # hist=[] means "bucket is empty" → None, NOT the full history
        # (a fallthrough here mislabels a global median as a bucket's)
        src = result.history if hist is None else hist
        v = [h[key] for h in src if key in h]
        return round(1e3 * sorted(v)[len(v) // 2], 1) if v else None

    # plan_s is attributed to the step the plan is FOR (one record after
    # the body that ran it), so the plan that drains a refit's async
    # fit+seed device time is the record right after the fit record
    # (synchronous refits) or TWO records after (lagged refits: the plan
    # at the refit step precedes the fit dispatch, and the drain lands on
    # the NEXT body's plan) — split out both so the breakdown attributes
    # the drain wherever the mode puts it
    hist = result.history
    lag = bool(args.lagged_refit)
    fit_at = [h.get("fit_s", 0) > 0.001 for h in hist]
    # record 0 is the PILOT fit — the plan(s) draining it measure the
    # full pilot fit, not a warm refit, so both buckets start past it.
    # after_refit2 (drain two records past the fit) only exists in
    # lagged mode — in sync mode those records are ordinary plain plans
    # and publishing them under a drain key would mislabel them (null
    # there).  Conversely the plain bucket only needs the i-2 exclusion
    # in lagged mode.
    after_refit = [
        h for i, h in enumerate(hist)
        if i >= 2 and fit_at[i - 1] and "plan_s" in h
    ]
    after_refit2 = [
        h for i, h in enumerate(hist)
        if i >= 3 and fit_at[i - 2] and not fit_at[i - 1] and "plan_s" in h
    ] if lag else None
    plain = [
        h for i, h in enumerate(hist)
        if i >= 2 and not fit_at[i - 1]
        and (not lag or (i >= 3 and not fit_at[i - 2]))
        and "plan_s" in h
    ]
    final_fetch = [
        h["final_fetch_s"] for h in result.history if "final_fetch_s" in h
    ]
    rec = {
        "metric": f"episode_{args.preset}_wall_s"
        if args.preset != "c5_10k" else "episode10k_wall_s",
        "value": round(wall, 3),
        "unit": "s",
        "steps": steps,
        "n_sampled": int(len(result.state.sampled_idx)),
        "per_step_ms": round(1e3 * wall / max(1, steps), 1),
        # one-time end-of-episode posterior fetch (device-metrics mode) —
        # NOT a per-step cost; steady_state excludes it
        "final_fetch_ms": round(1e3 * sum(final_fetch), 1),
        "steady_state_per_step_ms": round(
            1e3 * (wall - sum(final_fetch)) / max(1, steps), 1
        ),
        "plan_ms_median": round(1e3 * sorted(plan_s)[len(plan_s) // 2], 1),
        "fit_ms_total": round(1e3 * sum(fit_s), 1),
        # per-phase breakdown (episode.Agent._plan_and_metrics profile):
        # enum = host path enumeration + batch assembly; seed = per-refit
        # precision-seed ENQUEUE; step = fused device step + sync;
        # sense = host sensing + state update
        "phase_ms_median": {
            "enum": med_ms("enum_s"),
            "seed": med_ms("seed_s"),
            "step": med_ms("step_s"),
            "sense": med_ms("sense_s"),
        },
        "plan_ms_median_after_refit": med_ms("plan_s", after_refit),
        "plan_ms_median_after_refit2": (
            med_ms("plan_s", after_refit2) if lag else None
        ),
        "plan_ms_median_plain": med_ms("plan_s", plain),
        "lagged_refit": bool(args.lagged_refit),
        "rmse": round(result.rmse, 4),
        "rmse_test": round(result.rmse_test, 4),
    }
    line = json.dumps(rec)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
