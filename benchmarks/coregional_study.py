"""Coregionalized multi-trait GP quality study — when does the ICM
(models/coregional, beyond-reference model family) beat independent
per-trait fits (models.gp.fit_multi, the reference's family)?

Setup: synthetic multi-trait fields whose traits are drawn from the ICM's
own generative family (FieldConfig.trait_corr mixes T independent GP draws
through the equicorrelation Cholesky factor).  A training sample of plots
is measured; trait 0 (the cheap, dense trait — drone height) is observed
at every measured plot while traits 1..T-1 (expensive/destructive —
biomass) are observed at only `--obs-frac` of them.  Two arms fit the SAME
measurements, paired per seed:

  independent  per-trait exact GPs, each on its trait's own observed plots
  icm          coregionalized joint GP over observed (plot, trait) cells

and predict every trait over the full grid.  Cells swept: the transfer
regime (corr high, secondary traits sparse — where the ICM should win),
the parity regime (full observation), and the no-harm control (corr 0).

    python benchmarks/coregional_study.py [--seeds 10]
        [--json benchmarks/coregional_study_rNN.json]

Prints one JSON line per (cell, seed) and a paired summary per cell.
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
    ap.add_argument("--traits", type=int, default=3)
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--train", type=int, default=160)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--restarts", type=int, default=2)
    ap.add_argument("--icm-rank", type=int, default=1)
    ap.add_argument("--cells", default="0.8:0.2,0.8:1.0,0.0:0.2",
                    help="comma-separated trait_corr:obs_frac cells")
    ap.add_argument("--episode-seeds", type=int, default=0,
                    help="also run N paired informative-path CAMPAIGNS "
                    "(FieldConfig.trait_obs_frac=0.25, trait_corr=0.8, "
                    "mi strategy): one episode per seed, BOTH families "
                    "evaluated on the same final state (planning is "
                    "family-agnostic, so the pairing is exact)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from algp_tpu.config import FieldConfig, FitConfig
    from algp_tpu.field import FieldEnv
    from algp_tpu.models import coregional as icm_mod
    from algp_tpu.models import gp as gp_mod
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("matern32", ds=2, df=0)
    fitcfg = FitConfig(iters=args.iters, restarts=args.restarts)
    cells = [tuple(float(v) for v in c.split(":"))
             for c in args.cells.split(",")]
    T = args.traits

    records = []
    for corr, frac in cells:
        for seed in range(args.seeds):
            fieldc = FieldConfig(
                num_rows=args.rows, num_cols=args.cols,
                true_ls_spatial=6.0, num_traits=T, trait_corr=corr,
                seed=seed,
            )
            env = FieldEnv(fieldc, spec)
            rng = np.random.default_rng(1000 + seed)
            train_idx = np.sort(
                rng.choice(env.n, args.train, replace=False)
            ).astype(np.int64)
            _, Yn, ns, _ = env.collect_traits(train_idx, "precise")
            mask = np.ones((args.train, T), bool)
            for t in range(1, T):
                mask[:, t] = rng.uniform(size=args.train) < frac
                mask[:2, t] = True  # at least two anchor observations
            xtr = env.X[jnp.asarray(train_idx)]
            key = jax.random.PRNGKey(seed)

            # --- independent: each trait on ITS observed plots ----------
            t0 = time.perf_counter()
            ind_means = np.zeros((env.n, T))
            for t in range(T):
                sub = np.flatnonzero(mask[:, t])
                xs = env.X[jnp.asarray(train_idx[sub])]
                ys = jnp.asarray(Yn[sub, t], jnp.float32)
                nss = jnp.asarray(ns[sub], jnp.float32)
                res = gp_mod.fit(spec, fitcfg, xs, ys, noise_scale=nss,
                                 key=key)
                post = gp_mod.posterior(
                    spec, res.params, xs, ys, noise_scale=nss,
                    min_noise=fitcfg.min_noise, jitter=fitcfg.jitter,
                )
                m, _ = gp_mod.predict(spec, res.params, post, env.X)
                ind_means[:, t] = np.asarray(m)
            ind_wall = time.perf_counter() - t0
            ind_rmse = env.rmse_traits(ind_means, test_only=True)

            # --- ICM: one joint fit over observed (plot, trait) cells ---
            t0 = time.perf_counter()
            mean, _, fres = icm_mod.fit_predict_icm(
                spec, fitcfg, xtr, jnp.asarray(Yn, jnp.float32), env.X,
                jnp.asarray(mask), noise_scale=jnp.asarray(ns, jnp.float32),
                key=key, rank=args.icm_rank,
            )
            M_icm = np.asarray(mean)  # device→host sync ends the timing
            icm_wall = time.perf_counter() - t0
            icm_rmse = env.rmse_traits(M_icm, test_only=True)
            B = np.asarray(icm_mod.trait_cov(fres.params))
            corr01 = float(B[0, 1] / np.sqrt(B[0, 0] * B[1, 1]))

            rec = {
                "trait_corr": corr, "obs_frac": frac, "seed": seed,
                "ind_rmse_test": [round(v, 4) for v in ind_rmse],
                "icm_rmse_test": [round(v, 4) for v in icm_rmse],
                "icm_fitted_corr01": round(corr01, 3),
                "ind_wall_s": round(ind_wall, 2),
                "icm_wall_s": round(icm_wall, 2),
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

    summary = {"n_train": args.train, "traits": T,
               "icm_rank": args.icm_rank, "cells": {}}
    for corr, frac in cells:
        sel = [r for r in records
               if r["trait_corr"] == corr and r["obs_frac"] == frac]
        cell = {}
        for t in range(T):
            d = np.array([r["icm_rmse_test"][t] - r["ind_rmse_test"][t]
                          for r in sel])
            sem = (float(d.std(ddof=1) / np.sqrt(len(d)))
                   if len(d) > 1 else 0.0)
            cell[f"trait{t}_icm_minus_ind"] = {
                "mean": round(float(d.mean()), 4),
                "sem": round(sem, 4),
                "significant": bool(
                    sem > 0 and abs(float(d.mean())) > 2 * sem
                ),
            }
        cell["ind_rmse_mean"] = [
            round(float(np.mean([r["ind_rmse_test"][t] for r in sel])), 4)
            for t in range(T)
        ]
        cell["icm_rmse_mean"] = [
            round(float(np.mean([r["icm_rmse_test"][t] for r in sel])), 4)
            for t in range(T)
        ]
        cell["icm_fitted_corr01_mean"] = round(
            float(np.mean([r["icm_fitted_corr01"] for r in sel])), 3
        )
        summary["cells"][f"corr{corr}_frac{frac}"] = cell
    if args.episode_seeds:
        # in-episode cell: a full informative-path campaign under
        # trait under-observation; the model family only affects the final
        # per-trait evaluation, so ONE episode per seed serves both arms
        import dataclasses as dc

        from algp_tpu.config import (
            AcquisitionConfig, EpisodeConfig, ExperimentConfig,
        )
        from algp_tpu.episode import Agent
        from algp_tpu.models.multifit import multitrait_mean_fields

        ep_records = []
        for seed in range(args.episode_seeds):
            cfg = ExperimentConfig(
                kernel=spec,
                fit=fitcfg,
                acquisition=AcquisitionConfig(strategy="mi",
                                              num_inducing=0),
                field=FieldConfig(
                    num_rows=args.rows, num_cols=args.cols,
                    true_ls_spatial=6.0, num_traits=T, trait_corr=0.8,
                    trait_obs_frac=0.25, seed=seed,
                ),
                episode=EpisodeConfig(num_pilot=32, budget=200.0,
                                      num_waypoints=8,
                                      samples_per_step=10, seed=seed),
            )
            env = FieldEnv(cfg.field, cfg.kernel)
            agent = Agent(env, cfg)
            res = agent.run()
            st = res.state
            rec = {"episode_seed": seed,
                   "n_sampled": int(len(st.sampled_idx)),
                   "obs_frac_realized": round(float(
                       (~np.isnan(st.y_traits[:, 1:])).mean()), 3)}
            for fam in ("independent", "icm"):
                M = multitrait_mean_fields(
                    agent.spec, dc.replace(fitcfg, multi_fit=fam),
                    agent._Xdev, np.asarray(st.sampled_idx), st.y_traits,
                    st.noise_scale, env.observed_traits,
                    jax.random.PRNGKey(cfg.episode.seed),
                )
                rec[f"{fam}_rmse_test"] = [
                    round(v, 4)
                    for v in env.rmse_traits(M, test_only=True)
                ]
            ep_records.append(rec)
            print(json.dumps(rec), flush=True)
        cell = {}
        for t in range(T):
            d = np.array([r["icm_rmse_test"][t] - r["independent_rmse_test"][t]
                          for r in ep_records])
            sem = (float(d.std(ddof=1) / np.sqrt(len(d)))
                   if len(d) > 1 else 0.0)
            cell[f"trait{t}_icm_minus_ind"] = {
                "mean": round(float(d.mean()), 4),
                "sem": round(sem, 4),
                "significant": bool(
                    sem > 0 and abs(float(d.mean())) > 2 * sem
                ),
            }
        summary["episode_cell"] = cell
        records.extend(ep_records)

    print(json.dumps({"summary": summary}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"records": records, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
