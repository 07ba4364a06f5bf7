"""Randomized episode-level integration fuzz (SURVEY.md §4 item 3).

The golden tests pin specific config combinations; this fuzz sweeps the
CROSS-PRODUCT the goldens cannot enumerate — strategy × planner
(exact / low-rank / ensemble) × path utility × modality policy ×
refit schedule (full / warm / sparse) × goal conditioning ×
device-metrics × hard-cap — on tiny CPU grids, and asserts the
invariants that must hold for EVERY configuration:

1. resume exactness: an episode interrupted after 2 steps and resumed
   from its checkpoint reproduces the uninterrupted run's sampled set
   and final RMSE (selection is a pure function of EpisodeState —
   SURVEY.md §5 checkpoint row);
2. budget accounting: budget_left is non-increasing and never spent
   below zero;
3. sample validity: every sampled index is a real grid cell and every
   recorded noise scale is one the modality policy can produce;
4. metric sanity: every logged RMSE / mean-variance is finite.

Draws are deterministic (seeded rng → parametrized list) so a failure
names its draw and reproduces exactly.
"""

import dataclasses

import numpy as np
import pytest

from algp_tpu.config import (
    AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig, FitConfig,
)
from algp_tpu.episode import Agent
from algp_tpu.field import FieldEnv
from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.utils import checkpoint as ckpt

N_DRAWS = 14


def _draw(rng: np.random.Generator) -> ExperimentConfig:
    """One random-but-valid episode configuration on a tiny grid."""
    rows = int(rng.integers(5, 9))
    cols = int(rng.integers(6, 11))
    n = rows * cols
    df = int(rng.choice([0, 2]))
    spatial = str(rng.choice(["rbf", "matern32", "matern52"]))
    feature = "rbf" if df else "none"
    strategy = str(rng.choice(["mi", "entropy", "uniform", "naive"]))

    # planner: exact / forced low-rank / auto (tiny grid → exact)
    num_inducing = [0, int(rng.integers(6, 12)), None][int(rng.integers(3))]
    mi_ensemble = 1
    if strategy == "mi" and num_inducing and rng.random() < 0.5:
        mi_ensemble = 2
    path_utility = str(rng.choice(["per_cost", "per_sample"]))

    warm = bool(rng.random() < 0.4)
    sparse = bool(rng.random() < 0.3)
    fit = FitConfig(
        iters=25, restarts=int(rng.integers(1, 3)),
        refit_iters=10 if warm else 0, refit_restarts=1 if warm else 0,
        sparse_threshold=20 if sparse else 0, sparse_inducing=8,
    )

    modality = str(rng.choice(["precise", "cheap", "mixed"]))
    goals = None
    # goals only steer the informative planners (uniform/naive ignore
    # them), so don't waste draws pairing goals with the baselines
    if strategy in ("mi", "entropy") and rng.random() < 0.5:
        goals = tuple(int(g) for g in rng.choice(n, 2, replace=False))
    device_metrics = [None, True, False][int(rng.integers(3))]
    hard_cap = bool(rng.random() < 0.25)
    k = int(rng.integers(3, 6))
    episode = EpisodeConfig(
        num_pilot=int(rng.integers(6, 11)),
        budget=float(rng.integers(18, 32)),
        num_waypoints=int(rng.integers(3, 6)),
        samples_per_step=k,
        min_cost_frac=float(rng.choice([0.25, 0.5])),
        waypoint_goals=goals,
        refit_every=int(rng.integers(1, 4)),
        modality=modality,
        device_metrics=device_metrics,
        max_samples=48 if hard_cap else None,
        hard_cap=hard_cap,
        seed=int(rng.integers(0, 100)),
    )
    # the field seed is drawn BEFORE the round-5 lagged draw so the
    # pre-round-5 stream (and thus every other axis of the existing
    # draws) is genuinely unchanged — the lagged Bernoulli is the LAST
    # consumer of the generator
    field_seed = int(rng.integers(0, 100))
    if rng.random() < 0.3:
        episode = dataclasses.replace(episode, lagged_refit=True)
    return ExperimentConfig(
        kernel=KernelSpec(spatial, feature, ds=2, df=df),
        fit=fit,
        acquisition=AcquisitionConfig(
            strategy=strategy, num_inducing=num_inducing,
            path_utility=path_utility, mi_ensemble=mi_ensemble,
        ),
        field=FieldConfig(num_rows=rows, num_cols=cols, num_features=df,
                          seed=field_seed),
        episode=episode,
    )


def _directed() -> list:
    """Hand-picked configs guaranteeing the combinations random draws
    can miss (mixed modality × device metrics; goal-directed informative
    planning on both planners)."""
    base_field = FieldConfig(num_rows=6, num_cols=9, seed=42)
    base_ep = dict(num_pilot=8, budget=24.0, num_waypoints=4,
                   samples_per_step=4, seed=3)
    fit = FitConfig(iters=25, restarts=1)
    return [
        # mixed modality through the device-metrics fused step (var_sites)
        ExperimentConfig(
            kernel=KernelSpec("matern32", ds=2),
            fit=fit, field=base_field,
            acquisition=AcquisitionConfig(strategy="mi", num_inducing=0),
            episode=EpisodeConfig(modality="mixed", device_metrics=True,
                                  **base_ep),
        ),
        # mixed modality, host metrics, low-rank planner
        ExperimentConfig(
            kernel=KernelSpec("rbf", ds=2),
            fit=fit, field=base_field,
            acquisition=AcquisitionConfig(strategy="mi", num_inducing=8),
            episode=EpisodeConfig(modality="mixed", device_metrics=False,
                                  **base_ep),
        ),
        # goal-directed entropy with warm refits
        ExperimentConfig(
            kernel=KernelSpec("rbf", ds=2),
            fit=dataclasses.replace(fit, refit_iters=10, refit_restarts=1),
            field=base_field,
            acquisition=AcquisitionConfig(strategy="entropy"),
            episode=EpisodeConfig(waypoint_goals=(53, 0), **base_ep),
        ),
        # goal-directed low-rank MI, per_sample utility
        ExperimentConfig(
            kernel=KernelSpec("matern52", ds=2),
            fit=fit, field=base_field,
            acquisition=AcquisitionConfig(strategy="mi", num_inducing=8,
                                          path_utility="per_sample"),
            episode=EpisodeConfig(waypoint_goals=(26,), **base_ep),
        ),
        # LAGGED refits × warm refits × exact MI, refitting every step —
        # the maximum-pending-churn case (a pending result every body)
        ExperimentConfig(
            kernel=KernelSpec("matern32", ds=2),
            fit=dataclasses.replace(fit, refit_iters=10, refit_restarts=1),
            field=base_field,
            acquisition=AcquisitionConfig(strategy="mi", num_inducing=0),
            episode=EpisodeConfig(lagged_refit=True, refit_every=1,
                                  **base_ep),
        ),
        # lagged refits × low-rank planner × device metrics × mixed
        ExperimentConfig(
            kernel=KernelSpec("rbf", ds=2),
            fit=fit, field=base_field,
            acquisition=AcquisitionConfig(strategy="mi", num_inducing=8),
            episode=EpisodeConfig(lagged_refit=True, refit_every=2,
                                  modality="mixed", device_metrics=True,
                                  **base_ep),
        ),
    ]


_DRAWS = [_draw(np.random.default_rng(1000 + i)) for i in range(N_DRAWS)]
_DRAWS += _directed()
N_DRAWS = len(_DRAWS)


def _check_invariants(env: FieldEnv, cfg: ExperimentConfig, result) -> None:
    st = result.state
    idx = np.asarray(st.sampled_idx)
    assert ((0 <= idx) & (idx < env.n)).all(), "sampled index off the grid"
    assert len(st.y) == len(idx) == len(st.noise_scale)
    cheap = env.cfg.cheap_noise_mult ** 2
    legal = {1.0, cheap}
    assert set(np.unique(st.noise_scale)).issubset(legal), (
        f"noise scales {np.unique(st.noise_scale)} outside {legal}")
    if cfg.episode.modality == "precise":
        assert (st.noise_scale == 1.0).all()
    budgets = [h["budget_left"] for h in result.history if "budget_left" in h]
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(budgets, budgets[1:]))
    assert budgets[-1] >= -1e-6, "budget overspent"
    for h in result.history:
        for key in ("rmse", "rmse_test", "mean_var"):
            if key in h:
                assert np.isfinite(h[key]), (key, h)
    assert np.isfinite(result.mean).all() and np.isfinite(result.var).all()
    # final-posterior calibration metrics: always present, finite, and
    # the coverage fractions are probabilities
    for key in ("nlpd", "cov90", "cov95", "nlpd_test", "cov90_test",
                "cov95_test"):
        assert np.isfinite(result.calibration[key]), key
    for key in ("cov90", "cov95", "cov90_test", "cov95_test"):
        assert 0.0 <= result.calibration[key] <= 1.0, key
    if cfg.episode.hard_cap:
        assert len(idx) <= cfg.episode.max_samples


@pytest.mark.parametrize("draw", range(N_DRAWS))
def test_episode_fuzz_invariants_and_resume(draw, tmp_path):
    cfg = _DRAWS[draw]
    fc = cfg.field

    # uninterrupted reference run
    full = Agent(FieldEnv(fc, cfg.kernel), cfg).run(max_steps=7)
    _check_invariants(FieldEnv(fc, cfg.kernel), cfg, full)
    assert len(full.state.sampled_idx) >= cfg.episode.num_pilot

    # determinism: a fresh env + agent reproduces the run exactly
    again = Agent(FieldEnv(fc, cfg.kernel), cfg).run(max_steps=7)
    np.testing.assert_array_equal(
        again.state.sampled_idx, full.state.sampled_idx)
    assert again.rmse == pytest.approx(full.rmse, abs=1e-6)

    if full.state.step < 3:
        return  # episode too short to interrupt mid-way

    # interrupted at step 2 → checkpoint → resumed run must be EXACT
    half = Agent(FieldEnv(fc, cfg.kernel), cfg).run(max_steps=2)
    path = str(tmp_path / "mid.npz")
    ckpt.save(path, half.state)
    resumed = Agent(FieldEnv(fc, cfg.kernel), cfg).run(
        max_steps=7, resume_from=ckpt.load(path))
    np.testing.assert_array_equal(
        resumed.state.sampled_idx, full.state.sampled_idx)
    np.testing.assert_allclose(resumed.state.y, full.state.y, rtol=0, atol=0)
    assert resumed.rmse == pytest.approx(full.rmse, abs=1e-5)
    assert resumed.state.budget_left == pytest.approx(
        full.state.budget_left, abs=1e-6)


def test_fuzz_draws_cover_the_surface():
    """The deterministic draw set actually exercises the intended axes
    (guards against a future edit silently collapsing the coverage)."""
    strategies = {d.acquisition.strategy for d in _DRAWS}
    assert {"mi", "entropy"} <= strategies
    assert any(d.acquisition.num_inducing for d in _DRAWS), "no low-rank draw"
    assert any(d.acquisition.num_inducing == 0 for d in _DRAWS)
    assert any(d.acquisition.mi_ensemble > 1 for d in _DRAWS), "no ensemble"
    assert any(d.acquisition.path_utility == "per_sample" for d in _DRAWS)
    assert any(d.episode.waypoint_goals for d in _DRAWS), "no goal draw"
    assert any(d.episode.modality == "mixed" for d in _DRAWS)
    assert any(d.fit.sparse_threshold for d in _DRAWS), "no sparse-refit draw"
    assert any(d.fit.refit_iters for d in _DRAWS), "no warm-refit draw"
    assert any(d.episode.hard_cap for d in _DRAWS)
    assert any(d.kernel.df > 0 for d in _DRAWS), "no composite-kernel draw"
    assert any(d.episode.lagged_refit for d in _DRAWS), "no lagged-refit draw"
