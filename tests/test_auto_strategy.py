"""strategy="auto" resolution (round-4 VERDICT #3).

The measured decision table (see config.resolve_strategy's rationale and
README.md): MI at reference-scale grids (40×40 paired study: mi−entropy
−0.0232 ± 0.0097 significant), entropy through the exact-planner range
(10k: +0.0218 ± 0.0064 significant for entropy), yield-aware
mi:per_sample at low-rank scales (measured parity with entropy).  These
tests pin the rule and that an auto episode is decision-identical to the
explicitly-configured arm it resolves to.
"""

import dataclasses

import numpy as np
import pytest

from algp_tpu.config import (
    _EXACT_MAX_N, _MI_SMALL_MAX_N, AcquisitionConfig, EpisodeConfig,
    ExperimentConfig, FieldConfig, FitConfig, resolve_strategy,
)
from algp_tpu.episode import Agent
from algp_tpu.field import FieldEnv
from algp_tpu.ops.kernels import KernelSpec


def test_resolve_strategy_rule():
    # explicit strategies pass through, utility untouched
    assert resolve_strategy("mi", 10**6) == ("mi", "per_cost")
    assert resolve_strategy("entropy", 100, "per_sample") == (
        "entropy", "per_sample")
    assert resolve_strategy("naive", 10**6) == ("naive", "per_cost")
    # auto: MI at reference-scale grids
    assert resolve_strategy("auto", 40 * 40) == ("mi", "per_cost")
    assert resolve_strategy("auto", _MI_SMALL_MAX_N) == ("mi", "per_cost")
    # auto: entropy through the exact-planner range
    assert resolve_strategy("auto", _MI_SMALL_MAX_N + 1) == (
        "entropy", "per_cost")
    assert resolve_strategy("auto", 100 * 100) == ("entropy", "per_cost")
    assert resolve_strategy("auto", _EXACT_MAX_N) == ("entropy", "per_cost")
    # auto: yield-aware MI at low-rank scales (overrides the utility)
    assert resolve_strategy("auto", _EXACT_MAX_N + 1) == (
        "mi", "per_sample")
    assert resolve_strategy("auto", 2048 * 2048, "per_cost") == (
        "mi", "per_sample")


def _cfg(strategy: str) -> ExperimentConfig:
    return ExperimentConfig(
        kernel=KernelSpec("matern32", ds=2),
        fit=FitConfig(iters=25, restarts=2),
        acquisition=AcquisitionConfig(strategy=strategy),
        field=FieldConfig(num_rows=8, num_cols=12, seed=7),
        episode=EpisodeConfig(num_pilot=10, budget=36.0, num_waypoints=5,
                              samples_per_step=5, seed=7),
    )


def test_auto_episode_matches_resolved_arm_exactly():
    """On a 96-cell grid auto resolves to MI — the episode must be
    decision-identical to strategy="mi" (auto is pure dispatch, not a
    new scoring path)."""
    cfg_auto, cfg_mi = _cfg("auto"), _cfg("mi")
    r_auto = Agent(FieldEnv(cfg_auto.field, cfg_auto.kernel), cfg_auto).run()
    r_mi = Agent(FieldEnv(cfg_mi.field, cfg_mi.kernel), cfg_mi).run()
    np.testing.assert_array_equal(
        r_auto.state.sampled_idx, r_mi.state.sampled_idx)
    assert r_auto.rmse == pytest.approx(r_mi.rmse, abs=0)


def test_auto_resolves_entropy_above_small_grid_crossover():
    """Agent-level resolution (not just the helper): past the ~2.5k
    crossover an auto agent plans with entropy and no MI seed."""
    cfg = dataclasses.replace(
        _cfg("auto"),
        field=FieldConfig(num_rows=52, num_cols=52, seed=1),
        episode=EpisodeConfig(num_pilot=12, budget=60.0, num_waypoints=4,
                              samples_per_step=5, seed=1),
    )
    agent = Agent(FieldEnv(cfg.field, cfg.kernel), cfg)
    assert agent._strategy == "entropy"
    result = agent.run(max_steps=2)
    assert agent._P_cache is None and agent._lr_cache is None
    assert np.isfinite(result.rmse)


def test_auto_rejected_only_when_unresolvable():
    """'auto' must not trip the unknown-strategy validation."""
    cfg = _cfg("auto")
    Agent(FieldEnv(cfg.field, cfg.kernel), cfg)  # no raise
    bad = _cfg("both")
    with pytest.raises(ValueError, match="unknown strategy"):
        Agent(FieldEnv(bad.field, bad.kernel), bad)
