"""Deep-feature-kernel quality study — does the learned MLP embedding
(models/networks.py, beyond-reference capability) actually buy accuracy?

Setup: synthetic fields whose truth depends on the genotype features
through a fixed random NONLINEAR map ψ (FieldConfig.feature_warp="tanh")
while every model sees only the RAW features — the stationary composite
kernel is then mis-specified exactly the way real genotype→phenotype
structure mis-specifies it.  Three arms fit the same noisy training
sample and predict the full field, paired per seed:

  spatial    Matérn52 over (x, y) only — features ignored
  composite  Matérn52(x,y) × RBF(raw features), the reference's C1 form
  deep       Matérn52(x,y) × RBF(MLP(features)), jointly MLL-trained

A "none" control (truth stationary in the raw features; pass
--ls-feature ~ sqrt(df) to keep it learnable) is run with --warp none.
MEASURED OUTCOME (benchmarks/README.md, deepkernel_r03*.json): deep
wins 0.42 vs 0.71 at n=800 under the factor warp, loses at n=320
(MLL overfitting; weight_decay mitigates), and loses on the
well-specified control — the joint training walks away from the
stationary optimum even though the architecture can represent it.

    python benchmarks/deepkernel_study.py [--seeds 6] [--warp tanh]
        [--json benchmarks/deepkernel_rNN.json]

Prints one JSON line per (arm, seed) and a paired summary.
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
    ap.add_argument("--features", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--train", type=int, default=320)
    ap.add_argument("--warp", default="tanh", choices=("none", "tanh", "sin"))
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--ls-feature", type=float, default=0.8,
                    help="true feature lengthscale (in warped space for "
                    "tanh/sin, raw space for none — at df raw dims the "
                    "typical sq-distance is ~2·df, so a 'none' control "
                    "needs ls ~ sqrt(df) to keep the signal learnable)")
    ap.add_argument("--wd", type=float, default=0.3,
                    help="MLP weight decay (MLPSpec.weight_decay)")
    ap.add_argument("--restarts", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from algp_tpu.config import FieldConfig, FitConfig, MLPSpec
    from algp_tpu.field import FieldEnv
    from algp_tpu.models import gp as gp_mod
    from algp_tpu.models import networks as nets
    from algp_tpu.ops.kernels import KernelSpec

    fitcfg = FitConfig(iters=args.iters, restarts=args.restarts)
    # out = df so the (linear) last layer can represent the identity —
    # with a bottleneck out < df the control comparison on a
    # well-specified stationary field measures the bottleneck, not DKL
    mspec = MLPSpec(hidden=(16,), out=args.features,
                    weight_decay=args.wd)
    spec_sp = KernelSpec("matern52", ds=2, df=0)
    spec_co = KernelSpec("matern52", "rbf", ds=2, df=args.features)

    def rmse_on(env, mean, train_idx):
        mask = np.ones(env.n, bool)
        mask[train_idx] = False
        err = np.asarray(mean, np.float64) - env.f
        return float(np.sqrt(np.mean(err[mask] ** 2)))

    records = []
    for seed in range(args.seeds):
        fieldc = FieldConfig(
            num_rows=args.rows, num_cols=args.cols,
            num_features=args.features, true_ls_spatial=6.0,
            true_ls_feature=args.ls_feature, feature_warp=args.warp,
            seed=seed,
        )
        env = FieldEnv(fieldc, spec_co)
        rng = np.random.default_rng(1000 + seed)
        train_idx = np.sort(
            rng.choice(env.n, args.train, replace=False)
        ).astype(np.int64)
        s = env.collect(train_idx, "precise")
        y = jnp.asarray(s.y, jnp.float32)
        key = jax.random.PRNGKey(seed)

        X_full = np.asarray(env.X)
        xy = jnp.asarray(X_full[:, :2])
        xall = jnp.asarray(X_full)

        arms = {}
        # spatial-only
        t0 = time.perf_counter()
        res = gp_mod.fit(spec_sp, fitcfg, xy[jnp.asarray(train_idx)], y,
                         key=key)
        post = gp_mod.posterior(
            spec_sp, res.params, xy[jnp.asarray(train_idx)], y
        )
        mean, _ = gp_mod.predict(spec_sp, res.params, post, xy)
        arms["spatial"] = (rmse_on(env, mean, train_idx),
                           time.perf_counter() - t0)
        # composite stationary
        t0 = time.perf_counter()
        res = gp_mod.fit(spec_co, fitcfg, xall[jnp.asarray(train_idx)], y,
                         key=key)
        post = gp_mod.posterior(
            spec_co, res.params, xall[jnp.asarray(train_idx)], y
        )
        mean, _ = gp_mod.predict(spec_co, res.params, post, xall)
        arms["composite"] = (rmse_on(env, mean, train_idx),
                             time.perf_counter() - t0)
        # deep feature kernel: fit jointly, embed, predict at deep_spec
        t0 = time.perf_counter()
        dres = nets.fit_deep(
            spec_co, mspec, fitcfg, xall[jnp.asarray(train_idx)], y, key=key
        )
        espec = nets.deep_spec(spec_co, mspec)
        etrain = nets.embed_inputs(
            mspec, dres.mlp, xall[jnp.asarray(train_idx)], spec_co.ds
        )
        eall = nets.embed_inputs(mspec, dres.mlp, xall, spec_co.ds)
        post = gp_mod.posterior(espec, dres.params, etrain, y)
        mean, _ = gp_mod.predict(espec, dres.params, post, eall)
        arms["deep"] = (rmse_on(env, mean, train_idx),
                        time.perf_counter() - t0)

        for arm, (r, w) in arms.items():
            rec = {"arm": arm, "seed": seed, "warp": args.warp,
                   "wd": args.wd, "ls_feature": args.ls_feature,
                   "rmse_test": round(r, 4), "wall_s": round(w, 2)}
            records.append(rec)
            print(json.dumps(rec), flush=True)

    summary = {"warp": args.warp, "n_train": args.train,
               "per_arm_rmse_test": {}}
    finals = {}
    for arm in ("spatial", "composite", "deep"):
        vals = np.array(
            [r["rmse_test"] for r in records if r["arm"] == arm], float
        )
        finals[arm] = vals
        summary["per_arm_rmse_test"][arm] = {
            "mean": round(float(vals.mean()), 4),
            "sem": round(float(vals.std(ddof=1) / np.sqrt(len(vals))), 4)
            if len(vals) > 1 else 0.0,
            "per_seed": [round(float(v), 4) for v in vals],
        }
    summary["paired_diffs"] = {}
    for a, b in (("deep", "composite"), ("composite", "spatial")):
        d = finals[a] - finals[b]
        sem = (float(d.std(ddof=1) / np.sqrt(len(d)))
               if len(d) > 1 else 0.0)
        summary["paired_diffs"][f"{a}-{b}"] = {
            "mean": round(float(d.mean()), 4),
            "sem": round(sem, 4),
            "significant": bool(sem > 0 and abs(float(d.mean())) > 2 * sem),
        }
    print(json.dumps({"summary": summary}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"records": records, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
