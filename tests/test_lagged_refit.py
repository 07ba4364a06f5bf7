"""EpisodeConfig.lagged_refit semantics (round-4 VERDICT #1).

A lagged refit is dispatched AFTER the refit step's plan synced and is
consumed one plan later (EpisodeState.pending_params).  These tests pin
the contract — pending lifecycle, checkpoint round-trip, end-of-episode
adoption, resume exactness at the pending boundary, and the quality
sanity that the lagged arm still learns the field — on tiny CPU grids;
the perf effect is measured on hardware (benchmarks/README.md).
"""

import dataclasses

import numpy as np
import pytest

from algp_tpu.config import (
    AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
    FitConfig, MLPSpec,
)
from algp_tpu.episode import Agent
from algp_tpu.field import FieldEnv
from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.utils import checkpoint as ckpt


def _cfg(lagged: bool, refit_every: int = 2, **acq) -> ExperimentConfig:
    return ExperimentConfig(
        kernel=KernelSpec("matern32", ds=2),
        fit=FitConfig(iters=25, restarts=2),
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=0, **acq),
        field=FieldConfig(num_rows=8, num_cols=12, seed=5),
        episode=EpisodeConfig(num_pilot=10, budget=40.0, num_waypoints=5,
                              samples_per_step=5, refit_every=refit_every,
                              lagged_refit=lagged, seed=5),
    )


def test_pending_lifecycle_and_interrupt_keeps_pending(tmp_path):
    cfg = _cfg(lagged=True, refit_every=2)
    # interrupt right AFTER a refit step (step 2 is refit-due): the refit
    # was dispatched but not yet consumed → it must survive as pending in
    # the state and round-trip through the checkpoint
    half = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=2)
    assert half.state.pending_params is not None
    path = str(tmp_path / "pending.npz")
    ckpt.save(path, half.state)
    loaded = ckpt.load(path)
    assert loaded.pending_params is not None
    for f in ("log_ls_spatial", "log_ls_feature", "log_outputscale",
              "log_noise"):
        np.testing.assert_array_equal(
            np.asarray(getattr(loaded.pending_params, f)),
            np.asarray(getattr(half.state.pending_params, f)), err_msg=f)
    # resume must replay the adopt point exactly
    full = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
    resumed = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(
        resume_from=loaded)
    np.testing.assert_array_equal(
        resumed.state.sampled_idx, full.state.sampled_idx)
    assert resumed.rmse == pytest.approx(full.rmse, abs=1e-6)


def test_completed_episode_adopts_pending_for_final_posterior():
    cfg = _cfg(lagged=True, refit_every=1)
    result = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
    # budget exhausted → the trailing refit is adopted, not dropped
    assert result.state.pending_params is None
    assert result.state.params is not None
    assert np.isfinite(result.rmse)


def test_refit_step_plan_uses_incumbent_params():
    """The refit step's plan must be computed from the params that were
    current BEFORE the refit: with refit_every=1, a lagged run's step-2
    plan uses the step-1 refit the synchronous run has already replaced —
    so the two runs' parameter TRAJECTORIES must lag by exactly one refit
    (fits themselves see identical data, so fit k is identical in both)."""
    sync = _cfg(lagged=False, refit_every=1)
    lag = _cfg(lagged=True, refit_every=1)
    r_sync = Agent(FieldEnv(sync.field, sync.kernel), sync).run(max_steps=3)
    r_lag = Agent(FieldEnv(lag.field, lag.kernel), lag).run(max_steps=3)
    # both start from the same pilot fit and sense the same first path
    # (the first plan precedes any refit in both modes)
    k = min(len(r_sync.state.sampled_idx), len(r_lag.state.sampled_idx))
    n_pilot = sync.episode.num_pilot
    first_step = r_sync.history[1]["n_new"]
    np.testing.assert_array_equal(
        r_sync.state.sampled_idx[: n_pilot + first_step],
        r_lag.state.sampled_idx[: n_pilot + first_step])
    assert k >= n_pilot + first_step
    # after step 1's refit: the lagged run's APPLIED params trail the
    # synchronous run's — the interrupted lagged state holds the sync
    # run's params as PENDING, not applied
    assert r_lag.state.pending_params is not None
    # value-level pin of the one-refit lag (would catch a regression
    # that adopts the refit at dispatch time): after TWO lagged steps
    # the applied params are exactly the step-1 refit — the params the
    # sync run applied one step EARLIER.  Fit 1 sees identical data in
    # both modes (both step-1 plans ran on the pilot fit), so equality
    # is exact, not approximate.
    r_lag2 = Agent(FieldEnv(lag.field, lag.kernel), lag).run(max_steps=2)
    r_sync1 = Agent(FieldEnv(sync.field, sync.kernel), sync).run(
        max_steps=1)
    fields = ("log_ls_spatial", "log_ls_feature", "log_outputscale",
              "log_noise")
    for f in fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(r_lag2.state.params, f)),
            np.asarray(getattr(r_sync1.state.params, f)), err_msg=f)
    # ... and they differ from the sync run's step-2 refit (the params a
    # non-lagging implementation would have applied before this plan)
    r_sync2 = Agent(FieldEnv(sync.field, sync.kernel), sync).run(
        max_steps=2)
    assert any(
        not np.array_equal(np.asarray(getattr(r_lag2.state.params, f)),
                           np.asarray(getattr(r_sync2.state.params, f)))
        for f in fields
    ), "sync step-2 refit unexpectedly equals the step-1 refit"


def test_lagged_refit_rejects_deep_kernel():
    cfg = ExperimentConfig(
        kernel=KernelSpec("rbf", "rbf", ds=2, df=2),
        deep=MLPSpec(hidden=(4,), out=2),
        field=FieldConfig(num_rows=6, num_cols=8, num_features=2, seed=0),
        episode=EpisodeConfig(lagged_refit=True),
    )
    with pytest.raises(ValueError, match="lagged_refit"):
        Agent(FieldEnv(cfg.field, cfg.kernel), cfg)


def test_lagged_quality_sanity():
    """Lagged plans use one-refit-stale hypers; the episode must still
    beat the prior by a wide margin (the real quality question — paired
    vs synchronous at scale — is measured in benchmarks/README.md)."""
    cfg = _cfg(lagged=True, refit_every=2)
    env = FieldEnv(cfg.field, cfg.kernel)
    result = Agent(env, cfg).run()
    prior = env.rmse(np.zeros(env.n))
    assert result.rmse < 0.6 * prior, (result.rmse, prior)
