"""ICM-aware plot selection study — does planning on the JOINT trait
posterior beat planning on trait 0 alone when secondary traits are
under-observed?

Round-5 follow-up to `coregional_study.py` (which showed the ICM family
beats independent fits on sparsely-observed traits) and to
`strategy_curves_r05_multitrait.json` (which showed trait-0-planned MI
paths transfer to every trait).  Both left one question open: could a
selection policy that SEES the joint trait posterior do better than the
trait-0-only planner under under-observation?  This study answers it with
greedy variance (entropy-style) selection, the acquisition family the
episode planner reduces to per candidate:

  trait0   score(x) = Var[f_0(x) | D]            (what the episode plans on)
  joint    score(x) = Σ_t Var[f_t(x) | D] / B_tt (prior-normalized so every
                                                  trait votes equally)
  uniform  random unvisited plot                 (floor)

Paired per seed: same ICM-generative field (trait_corr mixing), same
pre-drawn per-plot measurement noise AND per-plot secondary-trait
missingness (a plot visited by any arm yields byte-identical data), same
refit schedule, same final ICM fit for evaluation — the arms differ ONLY
in which plots they pick.  Selection is sequential with posterior updates
between picks (hyperparameters refit every `--refit-every` picks); all
device programs are padded to the campaign capacity so each arm runs a
handful of compiled programs regardless of round count.

    python benchmarks/icm_planning_study.py [--seeds 10] [--cpu]
        [--json benchmarks/icm_planning_rNN.json]

Prints one JSON line per seed (all three arms' fields) and a paired
summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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
    ap.add_argument("--pilot", type=int, default=24)
    ap.add_argument("--picks", type=int, default=60)
    ap.add_argument("--obs-frac", type=float, default=0.25)
    ap.add_argument("--trait-corr", type=float, default=0.8)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--restarts", type=int, default=2)
    ap.add_argument("--refit-every", type=int, default=20)
    ap.add_argument("--icm-rank", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (selection fidelity is "
                    "backend-exact; must be decided before any JAX "
                    "device use — the JAX_PLATFORMS env var is ignored "
                    "in this environment)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from algp_tpu.config import FieldConfig, FitConfig
    from algp_tpu.field import FieldEnv
    from algp_tpu.models import coregional as icm_mod
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("matern32", ds=2, df=0)
    fitcfg = FitConfig(iters=args.iters, restarts=args.restarts)
    T = args.traits
    cap = args.pilot + args.picks  # padded campaign capacity

    def run_arm(env, arm, seed, pilot_idx, Y_all, ns_all, miss, key):
        """One greedy campaign; returns (final per-trait test RMSE,
        realized secondary-trait observation fraction)."""
        n = env.n
        X_np = np.asarray(env.X)  # ONE whole-field fetch per arm —
        # per-plot device reads would pay the ~27 ms relay floor each
        d = X_np.shape[1]
        xpad = np.zeros((cap, d), np.float32)
        Ypad = np.zeros((cap, T), np.float32)
        mpad = np.zeros((cap, T), bool)
        nspad = np.ones((cap,), np.float32)
        visited = np.zeros(n, bool)

        def ingest(slot, i):
            xpad[slot] = X_np[i]
            Ypad[slot] = np.where(miss[i], Y_all[i], 0.0)
            mpad[slot] = miss[i]
            nspad[slot] = ns_all[i]
            visited[i] = True

        for s, i in enumerate(pilot_idx):
            ingest(s, int(i))
        m = len(pilot_idx)

        rng = np.random.default_rng(9000 + seed)  # uniform-arm stream
        params = None
        for r in range(args.picks):
            if arm == "uniform":
                cand = np.flatnonzero(~visited)
                i = int(rng.choice(cand))
            else:
                if params is None or r % args.refit_every == 0:
                    res = icm_mod.fit_icm(
                        spec, fitcfg, jnp.asarray(xpad),
                        jnp.asarray(Ypad), jnp.asarray(mpad),
                        noise_scale=jnp.asarray(nspad), key=key,
                        rank=args.icm_rank,
                        num_valid=jnp.asarray(m, jnp.int32),
                    )
                    params = res.params
                post = icm_mod.posterior_icm(
                    spec, params, jnp.asarray(xpad), jnp.asarray(Ypad),
                    jnp.asarray(mpad), noise_scale=jnp.asarray(nspad),
                    min_noise=fitcfg.min_noise, jitter=fitcfg.jitter,
                    num_valid=jnp.asarray(m, jnp.int32),
                )
                _, var = icm_mod.predict_icm(spec, params, post, env.X)
                var = np.array(var, np.float32)  # (n, T), writable copy
                if arm == "trait0":
                    score = var[:, 0]
                else:  # joint: prior-normalized total variance
                    btt = np.asarray(jnp.diagonal(post.B), np.float32)
                    score = (var / np.maximum(btt, 1e-12)).sum(axis=1)
                score[visited] = -np.inf
                i = int(np.argmax(score))  # min-index tie-break
            ingest(m, i)
            m += 1

        # final evaluation: the SAME ICM fit procedure for every arm
        mean, _, _ = icm_mod.fit_predict_icm(
            spec, fitcfg, jnp.asarray(xpad), jnp.asarray(Ypad), env.X,
            jnp.asarray(mpad), noise_scale=jnp.asarray(nspad), key=key,
            rank=args.icm_rank, compute_var=False,
        )
        rmse = env.rmse_traits(np.asarray(mean), test_only=True)
        frac = float(mpad[: m, 1:].mean()) if T > 1 else 1.0
        return rmse, frac

    arms = ("trait0", "joint", "uniform")
    records = []
    for seed in range(args.seeds):
        fieldc = FieldConfig(
            num_rows=args.rows, num_cols=args.cols, true_ls_spatial=6.0,
            num_traits=T, trait_corr=args.trait_corr,
            trait_obs_frac=args.obs_frac, seed=seed,
        )
        env = FieldEnv(fieldc, spec)
        if cap > env.n:
            raise ValueError(
                f"pilot+picks = {cap} exceeds the {env.n}-plot grid"
            )
        # pre-draw EVERYTHING per plot so arms pair exactly: ONE collect
        # over the whole grid fixes the measurement noise AND the
        # per-plot secondary-trait missingness (the env's own
        # trait_obs_frac machinery — trait 0 always observed) regardless
        # of which order an arm visits plots in
        _, Y_all, ns_all, miss = env.collect_traits(
            np.arange(env.n), "precise"
        )
        miss = np.asarray(miss, bool)
        pilot_rng = np.random.default_rng(1000 + seed)
        pilot_idx = np.sort(
            pilot_rng.choice(env.n, args.pilot, replace=False)
        )
        key = jax.random.PRNGKey(seed)

        rec = {"seed": seed}
        for arm in arms:
            rmse, frac = run_arm(
                env, arm, seed, pilot_idx, np.asarray(Y_all),
                np.asarray(ns_all), miss, key
            )
            rec[f"{arm}_rmse_test"] = [round(v, 4) for v in rmse]
            rec[f"{arm}_obs_frac"] = round(frac, 3)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    summary = {
        "seeds": len(records), "picks": args.picks, "pilot": args.pilot,
        "obs_frac": args.obs_frac, "trait_corr": args.trait_corr,
        "traits": T,
    }
    for a, b in (("joint", "trait0"), ("trait0", "uniform"),
                 ("joint", "uniform")):
        block = {}
        for t in range(T):
            dd = np.array([
                r[f"{a}_rmse_test"][t] - r[f"{b}_rmse_test"][t]
                for r in records
            ])
            sem = (float(dd.std(ddof=1) / np.sqrt(len(dd)))
                   if len(dd) > 1 else 0.0)
            block[f"trait{t}"] = {
                "mean": round(float(dd.mean()), 4),
                "sem": round(sem, 4),
                "significant": bool(
                    sem > 0 and abs(float(dd.mean())) > 2 * sem
                ),
            }
        summary[f"{a}_minus_{b}"] = block
    for arm in arms:
        summary[f"{arm}_rmse_mean"] = [
            round(float(np.mean([r[f"{arm}_rmse_test"][t]
                                 for r in records])), 4)
            for t in range(T)
        ]
    print(json.dumps({"summary": summary}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"records": records, "summary": summary}, f,
                      indent=1)


if __name__ == "__main__":
    main()
