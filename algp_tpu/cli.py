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

from algp_tpu.config import (
    PRESETS,
    AcquisitionConfig,
    EpisodeConfig,
    ExperimentConfig,
    FieldConfig,
    FitConfig,
)
from algp_tpu.episode import Agent
from algp_tpu.field import FieldEnv
from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.utils.metrics import MetricsLogger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="algp_tpu",
        description="TPU-native active-learning GP experiments",
    )
    p.add_argument("--preset", choices=sorted(PRESETS), default=None,
                   help="start from one of the five acceptance configs")
    p.add_argument("--strategy", choices=("mi", "entropy", "uniform", "naive"))
    p.add_argument("--kernel", choices=("rbf", "matern32", "matern52"))
    p.add_argument("--feature-kernel", choices=("rbf", "matern32", "matern52"))
    p.add_argument("--rows", type=int, help="field rows")
    p.add_argument("--cols", type=int, help="ranges per row")
    p.add_argument("--features", type=int, help="feature dims (composite kernel)")
    p.add_argument("--budget", type=float, help="episode travel budget")
    p.add_argument("--num-pilot", type=int)
    p.add_argument("--samples-per-step", type=int)
    p.add_argument("--noise-std", type=float)
    p.add_argument("--modality", choices=("precise", "cheap", "mixed"),
                   help="sensing-modality policy for collected samples")
    p.add_argument("--cheap-noise-mult", type=float)
    p.add_argument("--data-path", help="phenotype CSV (row,range,height,feat_*)")
    p.add_argument("--optimizer", choices=("adam", "lbfgs"))
    p.add_argument("--lr", type=float)
    p.add_argument("--iters", type=int)
    p.add_argument("--restarts", type=int)
    p.add_argument("--acq-rounds", type=int, help="greedy rounds (configs 3-4)")
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
              iters=args.iters, restarts=args.restarts)
    acqc = rep(acqc, strategy=args.strategy, rounds=args.acq_rounds)
    field = rep(field, num_rows=args.rows, num_cols=args.cols,
                num_features=args.features, noise_std=args.noise_std,
                cheap_noise_mult=args.cheap_noise_mult,
                data_path=args.data_path, seed=args.seed)
    ep = rep(ep, budget=args.budget, num_pilot=args.num_pilot,
             samples_per_step=args.samples_per_step, seed=args.seed,
             modality=args.modality)
    return ExperimentConfig(kernel=kernel, fit=fit, acquisition=acqc,
                            field=field, episode=ep)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

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
                "n_sampled": len(result.state.sampled_idx),
                "steps": result.state.step,
                "mean_var": float(np.mean(result.var)),
            })
            print(json.dumps(summaries[-1]))
            if args.checkpoint:
                from algp_tpu.utils import checkpoint as ckpt

                path = args.checkpoint
                if args.runs > 1:
                    path = path.replace(".npz", f"_run{run}.npz")
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
