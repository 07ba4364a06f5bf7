"""Strategy-quality study — the reference's headline evaluation
(SURVEY.md §6: RMSE learning curves, not throughput).

Runs the full informative-path episode for every strategy (mi, entropy,
uniform, naive) over multiple seeds on a mid-size grid and records the
held-out-RMSE-vs-samples curves.  The scientific claim under test is the
reference paper's: information-driven sampling reaches a given field
accuracy with fewer measurements than uniform/boustrophedon baselines.

    python benchmarks/strategy_curves.py [--rows 40] [--cols 40]
        [--seeds 2] [--json benchmarks/strategy_curves_rNN.json]

Prints one JSON line per (strategy, seed) episode and a final summary
line with the mean final held-out RMSE per strategy.
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--rows", type=int, default=40)
    ap.add_argument("--cols", type=int, default=40)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--budget", type=float, default=160.0)
    ap.add_argument("--ls", type=float, default=6.0,
                    help="true spatial lengthscale (scale with the field: "
                    "strategy differentiation needs coverage commensurate "
                    "with the correlation length)")
    ap.add_argument("--max-steps", type=int, default=40)
    ap.add_argument("--preset", default=None,
                    help="start from a config preset (e.g. c5_100k for the "
                    "low-rank regime) instead of the ad-hoc grid flags; "
                    "--seeds still applies, strategy is swept")
    ap.add_argument("--strategies", default="mi,entropy,uniform,naive",
                    help="comma-separated strategies to sweep; a token "
                    "may carry a path-utility suffix, e.g. "
                    "'mi:per_sample' sweeps strategy=mi with the "
                    "yield-aware cost model (acquisition.path_set_argmax), "
                    "and '+'-separated refit modifiers: '+lagged' "
                    "(EpisodeConfig.lagged_refit), '+warmIxR' "
                    "(FitConfig.refit_iters=I/refit_restarts=R), "
                    "'+fullrefit' (force refit_iters=0) — e.g. "
                    "'mi+lagged,mi' is the paired lagged-vs-sync study")
    ap.add_argument("--max-samples", type=int, default=None,
                    help="pre-size EpisodeConfig.max_samples (static "
                    "buffer capacity): arms with different path "
                    "economics collect different totals, and outgrowing "
                    "the capacity mid-episode recompiles every step "
                    "program; one explicit cap keeps the arms' panel "
                    "residency and step cost comparable too")
    ap.add_argument("--num-traits", type=int, default=None,
                    help="multi-trait fields (FieldConfig.num_traits): "
                    "the episode plans on trait 0 and measures all "
                    "traits per plot; records/summary gain per-trait "
                    "held-out RMSE so transfer to NON-planning traits "
                    "is measured per strategy")
    ap.add_argument("--mi-ensemble", type=int, default=None,
                    help="z-ensemble MI: average scores over K k-center "
                    "design variants (applies to mi arms)")
    ap.add_argument("--min-cost-frac", type=float, default=None,
                    help="EpisodeConfig.min_cost_frac override: the "
                    "enumeration's minimum path cost as a fraction of "
                    "the budget slice (default 0.5) - the floor on the "
                    "cheapest sample price a step can buy")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (selections are "
                    "backend-exact — tests/oracle.py — so quality "
                    "numbers are valid either way; the r03 40x40 "
                    "study was CPU-run).  NOTE: must be decided "
                    "before any JAX device use; the JAX_PLATFORMS "
                    "env var is ignored in this environment")
    ap.add_argument("--json", default=None)
    ap.add_argument("--plot", default=None,
                    help="write the held-out-RMSE-vs-samples figure here")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from algp_tpu.config import (
        PRESETS, AcquisitionConfig, EpisodeConfig, ExperimentConfig,
        FieldConfig, FitConfig, KernelSpec,
    )
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    strategies = tuple(args.strategies.split(","))

    def parse_token(token):
        """'mi' -> ('mi', 'per_cost', ()); 'mi:per_sample' -> the
        yield-aware cost model; '+'-suffixed refit modifiers ('lagged',
        'warmIxR', 'fullrefit') ride along.  The full token stays the
        record/summary key, so arms differing only in modifiers pair."""
        head, *mods = token.split("+")
        strategy, _, util = head.partition(":")
        return strategy, util or "per_cost", tuple(mods)

    def apply_mods(cfg, mods):
        for mod in mods:
            if mod == "lagged":
                cfg = dataclasses.replace(
                    cfg, episode=dataclasses.replace(
                        cfg.episode, lagged_refit=True))
            elif mod == "fullrefit":
                cfg = dataclasses.replace(
                    cfg, fit=dataclasses.replace(
                        cfg.fit, refit_iters=0, refit_restarts=0))
            elif mod.startswith("warm"):
                iters, _, restarts = mod[4:].partition("x")
                if not (iters.isdigit() and restarts.isdigit()):
                    raise SystemExit(
                        f"malformed warm modifier {mod!r}: expected "
                        f"'warm<iters>x<restarts>', e.g. 'mi+warm100x3'")
                cfg = dataclasses.replace(
                    cfg, fit=dataclasses.replace(
                        cfg.fit, refit_iters=int(iters),
                        refit_restarts=int(restarts)))
            else:
                raise SystemExit(f"unknown strategy-token modifier {mod!r}")
        return cfg

    records = []
    for token in strategies:
        strategy, path_utility, mods = parse_token(token)
        for seed in range(args.seeds):
            trait_kw = (
                {"num_traits": args.num_traits} if args.num_traits else {}
            )
            if args.preset:
                base = PRESETS[args.preset]
                fieldc = dataclasses.replace(base.field, seed=seed,
                                             **trait_kw)
                cfg = dataclasses.replace(
                    base,
                    field=fieldc,
                    acquisition=dataclasses.replace(
                        base.acquisition, strategy=strategy,
                        path_utility=path_utility,
                        **({"mi_ensemble": args.mi_ensemble}
                           if args.mi_ensemble and strategy == "mi"
                           else {}),
                    ),
                    episode=dataclasses.replace(
                        base.episode, seed=seed,
                        **({"max_samples": args.max_samples}
                           if args.max_samples else {}),
                        **({"min_cost_frac": args.min_cost_frac}
                           if args.min_cost_frac is not None else {}),
                    ),
                )
            else:
                fieldc = FieldConfig(num_rows=args.rows, num_cols=args.cols,
                                     true_ls_spatial=args.ls, seed=seed,
                                     **trait_kw)
                cfg = ExperimentConfig(
                    kernel=KernelSpec("matern32", ds=2),
                    fit=FitConfig(iters=60, restarts=2),
                    acquisition=AcquisitionConfig(
                        strategy=strategy, path_utility=path_utility,
                        **({"mi_ensemble": args.mi_ensemble}
                           if args.mi_ensemble and strategy == "mi"
                           else {})),
                    field=fieldc,
                    episode=EpisodeConfig(num_pilot=24, budget=args.budget,
                                          num_waypoints=8, samples_per_step=8,
                                          refit_every=2, seed=seed,
                                          max_samples=args.max_samples,
                                          **({"min_cost_frac":
                                              args.min_cost_frac}
                                             if args.min_cost_frac
                                             is not None else {})),
                )
            cfg = apply_mods(cfg, mods)
            env = FieldEnv(fieldc, cfg.kernel)
            t0 = time.perf_counter()
            result = Agent(env, cfg).run(max_steps=args.max_steps)
            wall = time.perf_counter() - t0
            curve = [
                (h["n_sampled"], h["rmse_test"]) for h in result.history
                if "rmse_test" in h
            ]
            rec = {
                "strategy": token,
                "seed": seed,
                "final_rmse_test": round(result.rmse_test, 4),
                "final_rmse": round(result.rmse, 4),
                # predictive-uncertainty calibration of the final
                # posterior (held-out split): NLPD + 95% coverage
                "nlpd_test": round(result.calibration["nlpd_test"], 4),
                "cov95_test": round(result.calibration["cov95_test"], 4),
                "n_sampled": int(len(result.state.sampled_idx)),
                "steps": result.state.step,
                "wall_s": round(wall, 2),
                "curve": curve,
            }
            if result.trait_rmse_test is not None:
                # per-trait held-out RMSE (trait 0 = the planning trait)
                rec["trait_rmse_test"] = [
                    round(v, 4) for v in result.trait_rmse_test
                ]
            records.append(rec)
            print(json.dumps({k: v for k, v in rec.items() if k != "curve"}))

    # Two comparisons, because the baselines differ in KIND:
    #  * budget-matched (the reference's claim): among strategies that
    #    actually TRAVERSE the field (mi/entropy plan paths, naive sweeps
    #    row by row), informative planning should reach lower RMSE for
    #    the same travel budget.
    #  * sample-matched: RMSE interpolated at a common sample count —
    #    includes "uniform", which teleports to random plots (it pays no
    #    realistic travel cost, so it is NOT budget-comparable; it bounds
    #    what unconstrained random sampling achieves per sample).
    summary = {"budget_matched_final_rmse_test": {},
               "sample_matched_rmse_test": {}}
    n_common = min(r["n_sampled"] for r in records)
    finals = {}
    for strategy in strategies:
        recs = sorted(
            [r for r in records if r["strategy"] == strategy],
            key=lambda r: r["seed"],
        )
        vals = np.array([r["final_rmse_test"] for r in recs], float)
        finals[strategy] = vals
        if parse_token(strategy)[0] != "uniform":  # not budget-comparable
            summary["budget_matched_final_rmse_test"][strategy] = {
                "mean": round(float(vals.mean()), 4),
                "std": round(float(vals.std(ddof=1)), 4)
                if len(vals) > 1 else 0.0,
                "sem": round(float(vals.std(ddof=1) / np.sqrt(len(vals))), 4)
                if len(vals) > 1 else 0.0,
                "per_seed": [round(float(v), 4) for v in vals],
            }
        at_n = []
        for r in recs:
            ns = np.array([c[0] for c in r["curve"]], float)
            vs = np.array([c[1] for c in r["curve"]], float)
            at_n.append(float(np.interp(n_common, ns, vs)))
        summary["sample_matched_rmse_test"][strategy] = round(
            float(np.mean(at_n)), 4
        )
    summary["sample_matched_at_n"] = int(n_common)
    # PAIRED per-seed comparisons: strategies share the field per seed,
    # so the seed-to-seed field variance (which dwarfs the strategy gap
    # — round-2 VERDICT weak #5) cancels in the difference.  diff < 0
    # means the first strategy is better; |mean| > 2·sem ⇒ the gap is
    # real at ~95%.
    summary["paired_diffs"] = {}
    import itertools

    traversing = [t for t in strategies if parse_token(t)[0] != "uniform"]
    for a, b in itertools.combinations(traversing, 2):
        if a in finals and b in finals and len(finals[a]) == len(finals[b]):
            d = finals[a] - finals[b]
            if len(d) > 1:
                sem = float(d.std(ddof=1) / np.sqrt(len(d)))
            else:
                sem = 0.0
            summary["paired_diffs"][f"{a}-{b}"] = {
                "mean": round(float(d.mean()), 4),
                "sem": round(sem, 4),
                "significant": bool(
                    sem > 0 and abs(float(d.mean())) > 2 * sem
                ),
            }
    # calibration companions (round-4 VERDICT #6): the variance field is
    # half of a GP's product — per-strategy NLPD (proper scoring rule)
    # and 95% coverage of the final posterior, plus paired NLPD diffs so
    # a strategy buying RMSE with a miscalibrated posterior is visible
    calib = {
        token: {
            "nlpd_test_mean": round(float(np.mean(
                [r["nlpd_test"] for r in records
                 if r["strategy"] == token])), 4),
            "cov95_test_mean": round(float(np.mean(
                [r["cov95_test"] for r in records
                 if r["strategy"] == token])), 4),
        }
        for token in strategies
    }
    summary["calibration"] = calib
    nl = {
        token: np.array([
            r["nlpd_test"] for r in sorted(
                (r for r in records if r["strategy"] == token),
                key=lambda r: r["seed"])
        ])
        for token in strategies
    }
    summary["paired_nlpd_diffs"] = {}
    for a, b in itertools.combinations(traversing, 2):
        if len(nl[a]) == len(nl[b]) > 1:
            d = nl[a] - nl[b]
            sem = float(d.std(ddof=1) / np.sqrt(len(d)))
            summary["paired_nlpd_diffs"][f"{a}-{b}"] = {
                "mean": round(float(d.mean()), 4),
                "sem": round(sem, 4),
                "significant": bool(
                    sem > 0 and abs(float(d.mean())) > 2 * sem
                ),
            }
    # multi-trait transfer (round-5): planning happens on trait 0 only —
    # per-trait means + paired diffs show whether informative coverage
    # of the planning trait also serves the non-planning traits
    if any("trait_rmse_test" in r for r in records):
        tr = {
            token: np.array([
                r["trait_rmse_test"] for r in sorted(
                    (r for r in records if r["strategy"] == token),
                    key=lambda r: r["seed"])
            ])
            for token in strategies
        }
        summary["trait_rmse_test_mean"] = {
            token: [round(float(v), 4) for v in vals.mean(axis=0)]
            for token, vals in tr.items() if vals.size
        }
        summary["paired_trait_diffs"] = {}
        for a, b in itertools.combinations(traversing, 2):
            if len(tr[a]) == len(tr[b]) > 1:
                d = tr[a] - tr[b]  # (seeds, traits)
                sem = d.std(axis=0, ddof=1) / np.sqrt(len(d))
                summary["paired_trait_diffs"][f"{a}-{b}"] = [
                    {
                        "trait": t,
                        "mean": round(float(d[:, t].mean()), 4),
                        "sem": round(float(sem[t]), 4),
                        "significant": bool(
                            sem[t] > 0
                            and abs(float(d[:, t].mean())) > 2 * sem[t]
                        ),
                    }
                    for t in range(d.shape[1])
                ]
    summary["note"] = (
        "uniform teleports (no travel cost) — compare it only in the "
        "sample-matched view; the budget-matched view compares the "
        "traversing strategies (mi/entropy/naive)"
    )
    print(json.dumps({"summary": summary}))

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"records": records, "summary": summary}, f, indent=1)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.5, 4), constrained_layout=True)
        for strategy in strategies:
            recs = [r for r in records if r["strategy"] == strategy]
            if not recs:
                continue
            grid = np.arange(
                min(c[0] for r in recs for c in r["curve"]),
                min(r["n_sampled"] for r in recs) + 1,
            )
            curves = [
                np.interp(grid, [c[0] for c in r["curve"]],
                          [c[1] for c in r["curve"]])
                for r in recs
            ]
            mean = np.mean(curves, axis=0)
            label = strategy + (" (teleports)" if strategy == "uniform" else "")
            ax.plot(grid, mean, label=label,
                    linestyle="--" if strategy == "uniform" else "-")
        ax.set_xlabel("samples collected")
        ax.set_ylabel("held-out RMSE (mean over seeds)")
        where = (
            f"preset {args.preset}" if args.preset
            else f"{args.rows}x{args.cols} grid, budget {args.budget:g}"
        )
        ax.set_title(f"Informative path planning vs baselines ({where})")
        ax.legend()
        fig.savefig(args.plot, dpi=120)


if __name__ == "__main__":
    main()
