"""L6 — command-line experiment driver (reference `main.py`/`arguments.py`).

Capability parity (SURVEY.md §2 C13): strategy, kernel, budget, runs,
noise levels, dataset path, seeds, lr, iters — exposed as flags that fill
the typed dataclass configs (config.py), plus `--preset` for the five
acceptance configs of BASELINE.json.

    python -m algp_tpu.cli --preset c5_episode --runs 2
    python -m algp_tpu.cli --strategy mi --kernel matern52 --rows 25 \
        --cols 40 --budget 200 --restarts 4 --metrics-jsonl out.jsonl
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np

from algp_tpu.config import PRESETS, ExperimentConfig
from algp_tpu.episode import Agent
from algp_tpu.field import FieldEnv
from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.utils.metrics import MetricsLogger


def _round4(v):
    """4-digit rounding for summary JSON (None passes through)."""
    return None if v is None else round(float(v), 4)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="algp_tpu",
        description="TPU-native active-learning GP experiments",
    )
    p.add_argument("--preset", choices=sorted(PRESETS), default=None,
                   help="start from one of the five acceptance configs")
    p.add_argument("--mode", choices=("episode", "greedy"), default="episode",
                   help="'episode': informative-path sim loop (config 5); "
                   "'greedy': pure greedy selection over ALL grid "
                   "candidates for --acq-rounds rounds (configs 3-4, "
                   "teleporting sensor, no path constraints)")
    p.add_argument("--strategy",
                   choices=("mi", "entropy", "uniform", "naive", "auto"),
                   help="'auto' resolves to the measured-best arm for the "
                   "grid size (config.resolve_strategy: MI at reference-"
                   "scale grids <= ~2.5k, entropy through the exact-"
                   "planner range <= 16k, yield-aware mi:per_sample at "
                   "low-rank scales — see README decision table)")
    p.add_argument("--kernel", choices=("rbf", "matern32", "matern52"))
    p.add_argument("--feature-kernel", choices=("rbf", "matern32", "matern52"))
    p.add_argument("--rows", type=int, help="field rows")
    p.add_argument("--cols", type=int, help="ranges per row")
    p.add_argument("--features", type=int, help="feature dims (composite kernel)")
    p.add_argument("--feature-warp", choices=("none", "tanh", "sin"),
                   help="synthetic truth's nonlinear feature structure "
                   "(FieldConfig.feature_warp; the regime where "
                   "--deep-hidden has something to learn)")
    p.add_argument("--budget", type=float, help="episode travel budget")
    p.add_argument("--num-pilot", type=int)
    p.add_argument("--samples-per-step", type=int)
    p.add_argument("--min-cost-frac", type=float,
                   help="minimum path cost as a fraction of the budget "
                   "slice (default 0.5) — the floor on the cheapest "
                   "sample price a step can buy; lower it with "
                   "--path-utility per_sample for more, shorter steps")
    p.add_argument("--noise-std", type=float)
    p.add_argument("--modality", choices=("precise", "cheap", "mixed"),
                   help="sensing-modality policy for collected samples")
    p.add_argument("--waypoint-goals",
                   help="comma-separated grid indices the episode must "
                   "visit in order (goal-conditioned path enumeration "
                   "between pose and goal — C11); informative "
                   "strategies only")
    p.add_argument("--cheap-noise-mult", type=float)
    p.add_argument("--data-path", help="phenotype CSV (row,range,height,feat_*)")
    p.add_argument("--num-traits", type=int,
                   help="synthetic traits to phenotype (fit_multi batch)")
    p.add_argument("--value-cols",
                   help="comma-separated table value columns (multi-trait)")
    p.add_argument("--trait-obs-frac", type=float,
                   help="probability a SECONDARY trait is measured at a "
                   "visited plot (FieldConfig.trait_obs_frac; trait 0 is "
                   "always measured) — the expensive/destructive-assay "
                   "regime where --multi-fit icm transfers the dense "
                   "trait into the sparse ones")
    p.add_argument("--trait-corr", type=float,
                   help="cross-trait correlation of synthetic multi-trait "
                   "fields (FieldConfig.trait_corr; equicorrelation mix "
                   "of the independent GP draws — the ICM's generative "
                   "family; trait 0 unchanged)")
    p.add_argument("--multi-fit", choices=("independent", "icm"),
                   help="multi-trait model family for the per-trait "
                   "evaluation: 'independent' = batched per-trait exact "
                   "GPs (fit_multi, default); 'icm' = coregionalized "
                   "joint GP (models.coregional) fitting only genuinely "
                   "observed (plot, trait) cells — transfers dense "
                   "traits into sparse ones")
    p.add_argument("--icm-rank", type=int,
                   help="rank of the ICM trait-covariance factor A "
                   "(B = A Aᵀ + diag κ; default 1)")
    p.add_argument("--deep-hidden",
                   help="deep feature kernel: comma-separated MLP hidden "
                   "widths (e.g. 16,16); enables joint MLL training of a "
                   "feature embedding (needs --features > 0)")
    p.add_argument("--deep-out", type=int, default=4,
                   help="deep feature kernel: embedding width (default 4)")
    p.add_argument("--optimizer", choices=("adam", "lbfgs"))
    p.add_argument("--lr", type=float)
    p.add_argument("--iters", type=int)
    p.add_argument("--restarts", type=int)
    p.add_argument("--acq-rounds", type=int, help="greedy rounds (configs 3-4)")
    p.add_argument("--mi-ensemble", type=int,
                   help="z-ensemble MI: average scores over K distinct "
                   "k-center design variants (low-rank planner, single "
                   "chip) — the mitigation for inducing-design "
                   "sensitivity at ultra-sparse coverage; 1 = off")
    p.add_argument("--path-utility", choices=("per_cost", "per_sample"),
                   help="episode path cost model: 'per_cost' = info gain "
                   "per unit cost (default); 'per_sample' = yield-aware "
                   "(restrict to near-best cost-per-sample paths, rank "
                   "by info per expected sample — the fix for MI's "
                   "long-path budget pathology at ultra-sparse coverage)")
    p.add_argument("--num-inducing", type=int,
                   help="MI complement precision via M k-center inducing "
                   "points (low-rank path for very large grids); 0 = "
                   "force exact; unset = preset value or AUTO (exact "
                   "≤ 16k candidates, low-rank above the measured ~20k "
                   "crossover — config.resolve_num_inducing)")
    p.add_argument("--lagged-refit", action="store_true", default=None,
                   help="dispatch each refit AFTER the step's plan synced "
                   "and consume it one plan later (EpisodeConfig."
                   "lagged_refit): the refit program's device time "
                   "overlaps the next step's host work instead of "
                   "draining into the refit step's fused sync; plans at "
                   "refit steps use one-refit-stale hyperparameters")
    p.add_argument("--refit-iters", type=int,
                   help="warm refits: optimizer steps per post-pilot "
                   "refit (FitConfig.refit_iters; 0 = full refits)")
    p.add_argument("--refit-restarts", type=int,
                   help="warm refits: restart count per post-pilot refit "
                   "(restart 0 starts from the incumbent params)")
    p.add_argument("--runs", type=int, default=1, help="independent episodes")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--metrics-jsonl", help="stream per-round metrics to file")
    p.add_argument("--checkpoint", help="save final episode state to .npz")
    p.add_argument("--resume", help="resume an episode from a checkpoint .npz")
    p.add_argument("--plots", help="write field-map/curve/path figures here")
    p.add_argument("--profile-dir", help="capture a jax.profiler trace here")
    return p


def config_from_args(args) -> ExperimentConfig:
    cfg = PRESETS[args.preset] if args.preset else ExperimentConfig()
    kernel, fit, acqc, field, ep = (
        cfg.kernel, cfg.fit, cfg.acquisition, cfg.field, cfg.episode
    )

    def rep(obj, **kv):
        kv = {k: v for k, v in kv.items() if v is not None}
        return dataclasses.replace(obj, **kv) if kv else obj

    df = args.features if args.features is not None else kernel.df
    kernel = KernelSpec(
        spatial_kind=args.kernel or kernel.spatial_kind,
        feature_kind=args.feature_kernel or kernel.feature_kind,
        ds=kernel.ds, df=df,
    )
    fit = rep(fit, optimizer=args.optimizer, learning_rate=args.lr,
              iters=args.iters, restarts=args.restarts,
              refit_iters=args.refit_iters,
              refit_restarts=args.refit_restarts,
              multi_fit=args.multi_fit, icm_rank=args.icm_rank)
    acqc = rep(acqc, strategy=args.strategy, rounds=args.acq_rounds,
               num_inducing=args.num_inducing,
               path_utility=args.path_utility,
               mi_ensemble=args.mi_ensemble)
    field = rep(field, num_rows=args.rows, num_cols=args.cols,
                num_features=args.features, noise_std=args.noise_std,
                feature_warp=args.feature_warp,
                cheap_noise_mult=args.cheap_noise_mult,
                data_path=args.data_path, seed=args.seed,
                num_traits=args.num_traits, trait_corr=args.trait_corr,
                trait_obs_frac=args.trait_obs_frac,
                value_cols=(tuple(args.value_cols.split(","))
                            if args.value_cols else None))
    ep = rep(ep, budget=args.budget, num_pilot=args.num_pilot,
             samples_per_step=args.samples_per_step, seed=args.seed,
             modality=args.modality, min_cost_frac=args.min_cost_frac,
             lagged_refit=args.lagged_refit,
             waypoint_goals=(tuple(int(g) for g in
                             args.waypoint_goals.split(","))
                             if args.waypoint_goals else None))
    deep = cfg.deep
    if args.deep_hidden:
        from algp_tpu.config import MLPSpec

        if kernel.df == 0:
            raise SystemExit(
                "--deep-hidden needs feature dims: pass --features > 0 "
                "(a deep kernel over zero feature columns would learn a "
                "constant embedding)"
            )
        deep = MLPSpec(
            hidden=tuple(int(h) for h in args.deep_hidden.split(",")),
            out=args.deep_out,
        )
    return ExperimentConfig(kernel=kernel, fit=fit, acquisition=acqc,
                            field=field, episode=ep, deep=deep)


def run_greedy(cfg: ExperimentConfig, runs: int, stream=None) -> list[dict]:
    """Configs 3-4 driver: pilot → fit → `cfg.acquisition.rounds` greedy
    entropy/MI selections over every grid candidate → collect → refit →
    RMSE (the reference's non-path active-sampling experiments)."""
    import jax
    import jax.numpy as jnp

    from algp_tpu import acquisition as acq
    from algp_tpu.models import gp as gp_mod
    from algp_tpu.utils.metrics import MetricsLogger

    from algp_tpu.config import resolve_strategy

    # "auto" resolves against the candidate count (no path economics in
    # greedy mode, so the utility half of the rule does not apply);
    # resolved from env.n — the same size source resolve_num_inducing
    # uses below — so a field type whose candidate count differs from
    # num_rows*num_cols can never straddle the crossover (seeds only
    # differ between runs, so run 0's count is every run's count)
    strategy = None
    summaries = []
    for run in range(runs):
        fieldc = dataclasses.replace(cfg.field, seed=cfg.field.seed + run)
        env = FieldEnv(fieldc, cfg.kernel)
        if strategy is None:
            strategy, _ = resolve_strategy(cfg.acquisition.strategy, env.n)
        log = MetricsLogger(stream)
        num_pilot = cfg.episode.num_pilot
        pilot = np.unique(
            np.linspace(0, env.n - 1, num_pilot).round().astype(np.int64)
        )
        s = env.collect(pilot, "precise")
        key = jax.random.PRNGKey(cfg.episode.seed + run)

        if cfg.deep is not None:
            # deep feature kernel: joint MLP+hypers fit, then every
            # downstream consumer sees [spatial | φ(features)]
            from algp_tpu.models import networks as nets

            def fit_fn(idx, y, key):
                res = nets.fit_deep(
                    cfg.kernel, cfg.deep, cfg.fit,
                    env.X[jnp.asarray(idx)], jnp.asarray(y, jnp.float32),
                    key=key,
                )
                X_eff = nets.embed_inputs(cfg.deep, res.mlp, env.X,
                                          cfg.kernel.ds)
                return res, nets.deep_spec(cfg.kernel, cfg.deep), X_eff
        else:
            def fit_fn(idx, y, key):
                res = gp_mod.fit(
                    cfg.kernel, cfg.fit, env.X[jnp.asarray(idx)],
                    jnp.asarray(y, jnp.float32), key=key,
                )
                return res, cfg.kernel, env.X

        res, spec_eff, X_eff = fit_fn(s.indices, s.y, key)
        nv_base = float(np.maximum(
            np.exp(2 * np.asarray(res.params.log_noise)), cfg.fit.min_noise**2
        ))
        from algp_tpu.config import resolve_num_inducing

        m_ind = resolve_num_inducing(cfg.acquisition.num_inducing, env.n)
        K_ens = max(1, int(cfg.acquisition.mi_ensemble))
        if K_ens > 1 and (strategy != "mi" or not m_ind):
            raise ValueError(
                "mi_ensemble > 1 needs the low-rank planner "
                "(num_inducing > 0 or auto above the crossover) — "
                "the exact W seed has no design to vary"
            )
        if strategy == "mi" and m_ind:
            # large-grid MI: low-rank complement precision over a k-center
            # inducing design (acquisition_lowrank); --mi-ensemble K
            # stacks K deterministic design variants (same start-point
            # schedule as the episode's _lowrank_z) and averages scores
            from algp_tpu import acquisition_lowrank as acq_lr

            m_eff = min(m_ind, env.n)
            if K_ens > 1:
                z_arg = jnp.stack([
                    X_eff[acq_lr.kcenter_indices(
                        X_eff, m_eff, start=(j * env.n) // K_ens
                    )]
                    for j in range(K_ens)
                ])
            else:
                z_arg = X_eff[acq_lr.kcenter_indices(X_eff, m_eff)]
            sel = acq_lr.greedy_select_lowrank(
                spec_eff, res.params, X_eff,
                jnp.full((env.n,), nv_base, jnp.float32),
                jnp.asarray(s.indices, jnp.int32), z_arg,
                rounds=cfg.acquisition.rounds, num_pilot=len(s.indices),
            )
        else:
            sel = acq.greedy_select(
                spec_eff, res.params, X_eff,
                jnp.full((env.n,), nv_base, jnp.float32),
                jnp.asarray(s.indices, jnp.int32),
                rounds=cfg.acquisition.rounds, num_pilot=len(s.indices),
                strategy=strategy,
            )
        chosen = np.asarray(sel.selected)
        s2 = env.collect(chosen, "precise")
        all_idx = np.concatenate([s.indices, s2.indices])
        all_y = np.concatenate([s.y, s2.y])
        key2 = jax.random.fold_in(key, 1)
        res2, spec_eff, X_eff = fit_fn(all_idx, all_y, key2)
        post = gp_mod.posterior(
            spec_eff, res2.params, X_eff[jnp.asarray(all_idx)],
            jnp.asarray(all_y, jnp.float32),
        )
        mean, var = gp_mod.predict(spec_eff, res2.params, post, X_eff)
        rec = {
            "run": run, "mode": "greedy",
            "strategy": strategy,
            "rounds": cfg.acquisition.rounds,
            "n_sampled": int(len(all_idx)),
            "final_rmse": env.rmse(np.asarray(mean)),
            "final_rmse_test": env.rmse(np.asarray(mean), test_only=True),
            "mean_var": float(np.asarray(var).mean()),
        }
        if env.num_traits > 1:
            # multi-trait phenotyping: refit EVERY trait on the selected
            # plots as ONE batched program (traits × restarts × iters —
            # models.gp.fit_multi), then per-trait posterior fields.
            # Uses spec_eff/X_eff so a --deep-hidden run evaluates the
            # SAME model family as the headline RMSE (per-trait hypers
            # over the shared embedding learned on the primary trait) —
            # cfg.kernel/env.X here silently measured a plain stationary
            # model instead.
            from algp_tpu.models.multifit import multitrait_mean_fields

            _, Y, _, _ = env.collect_traits(all_idx, "precise")
            # family dispatch (FitConfig.multi_fit): batched fit_multi,
            # per-trait ragged fits under trait_obs_frac < 1 (NaN cells),
            # or the coregionalized ICM over observed cells
            M = multitrait_mean_fields(
                spec_eff, cfg.fit, X_eff, all_idx, Y, None,
                env.observed_traits, key2,
            )
            rec["multi_fit"] = cfg.fit.multi_fit
            rec["trait_rmse"] = env.rmse_traits(M)
            rec["trait_rmse_test"] = env.rmse_traits(M, test_only=True)
        log.log(**rec)
        summaries.append(rec)
        print(json.dumps(rec))
    return summaries


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    if args.mode == "greedy":
        # greedy mode scores every candidate by an information criterion;
        # the traversal baselines have no meaning here — fail clearly
        # instead of deep in greedy_select
        if cfg.acquisition.strategy not in ("mi", "entropy", "auto"):
            raise SystemExit(
                f"--mode greedy supports --strategy mi/entropy/auto (got "
                f"{cfg.acquisition.strategy!r}); 'uniform'/'naive' are "
                f"traversal baselines of --mode episode"
            )
        stream = open(args.metrics_jsonl, "w") if args.metrics_jsonl else None
        try:
            run_greedy(cfg, args.runs, stream)
        finally:
            if stream is not None:
                stream.close()
        return 0

    from algp_tpu.utils.profiling import trace

    resume_state = None
    if args.resume:
        from algp_tpu.utils import checkpoint as ckpt

        resume_state = ckpt.load(args.resume)

    stream = open(args.metrics_jsonl, "w") if args.metrics_jsonl else None
    summaries = []
    histories = {}
    try:
        for run in range(args.runs):
            fieldc = dataclasses.replace(cfg.field, seed=cfg.field.seed + run)
            epc = dataclasses.replace(cfg.episode, seed=cfg.episode.seed + run)
            run_cfg = dataclasses.replace(cfg, field=fieldc, episode=epc)
            env = FieldEnv(fieldc, run_cfg.kernel)
            agent = Agent(env, run_cfg, MetricsLogger(stream))
            with trace(args.profile_dir if run == 0 else None):
                result = agent.run(
                    resume_from=resume_state if run == 0 else None
                )
            histories[f"run{run}"] = result.history
            if args.plots:
                import os

                from algp_tpu.utils import plotting

                os.makedirs(args.plots, exist_ok=True)
                plotting.field_maps(
                    env, result.mean, result.var,
                    sampled_idx=result.state.sampled_idx,
                    path=os.path.join(args.plots, f"maps_run{run}.png"),
                )
            summaries.append({
                "run": run,
                "final_rmse": result.rmse,
                "final_rmse_test": result.rmse_test,
                "n_sampled": len(result.state.sampled_idx),
                "steps": result.state.step,
                "mean_var": float(np.mean(result.var)),
                # variance-field quality next to the RMSE headline —
                # rounded like strategy_curves.py; .get so a future
                # calibration-less result degrades to null, not a crash
                "nlpd_test": _round4(result.calibration.get("nlpd_test")),
                "cov95_test": _round4(result.calibration.get("cov95_test")),
                # multi-trait episodes: per-trait held-out RMSE of the
                # final batched fit_multi posteriors (None otherwise)
                **({"trait_rmse_test":
                    [_round4(v) for v in result.trait_rmse_test]}
                   if result.trait_rmse_test is not None else {}),
            })
            print(json.dumps(summaries[-1]))
            if args.checkpoint:
                import os

                from algp_tpu.utils import checkpoint as ckpt

                # normalize to .npz (np.savez appends it anyway) so
                # per-run names never collide on one surprise file
                root, ext = os.path.splitext(args.checkpoint)
                if ext != ".npz":
                    root += ext  # keep a non-npz "extension" as part of the stem
                path = f"{root}_run{run}.npz" if args.runs > 1 else root + ".npz"
                ckpt.save(path, result.state)
    finally:
        if stream is not None:
            stream.close()

    if args.plots and histories:
        import os

        from algp_tpu.utils import plotting

        plotting.learning_curves(
            histories, path=os.path.join(args.plots, "curves.png")
        )

    if len(summaries) > 1:
        rmses = [s["final_rmse"] for s in summaries]
        print(json.dumps({
            "runs": len(summaries),
            "rmse_mean": float(np.mean(rmses)),
            "rmse_std": float(np.std(rmses)),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
