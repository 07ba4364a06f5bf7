"""Multi-trait config-5 episodes (round-4 VERDICT #5).

Multi-trait envs (FieldConfig.num_traits > 1 / table value_cols) drive
the SAME informative-path loop planned on the designated trait 0, while
every plot visit measures all traits (env.collect_traits) and a final
batched fit_multi produces per-trait posteriors + RMSE.  Pins: the
end-to-end golden (synthetic + table), checkpoint/resume exactness with
the (n, T) trait buffer, mesh ≡ single-chip decision equality, and that
trait 0's planning is unchanged by the extra traits.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax

from algp_tpu.config import (
    AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
    FitConfig, PRESETS,
)
from algp_tpu.episode import Agent
from algp_tpu.field import FieldEnv
from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.utils import checkpoint as ckpt


def _cfg(num_traits: int = 3, **ep) -> ExperimentConfig:
    return ExperimentConfig(
        kernel=KernelSpec("matern32", ds=2),
        fit=FitConfig(iters=25, restarts=2),
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=0),
        field=FieldConfig(num_rows=8, num_cols=12, num_traits=num_traits,
                          seed=11),
        episode=EpisodeConfig(num_pilot=10, budget=40.0, num_waypoints=5,
                              samples_per_step=5, seed=11, **ep),
    )


def test_multitrait_episode_end_to_end():
    cfg = _cfg(3)
    env = FieldEnv(cfg.field, cfg.kernel)
    result = Agent(env, cfg).run()
    assert result.trait_rmse is not None
    assert len(result.trait_rmse) == len(result.trait_rmse_test) == 3
    assert np.isfinite(result.trait_rmse).all()
    # the sampled Y buffer is row-aligned with the sampled set and its
    # planning column IS the episode's y stream
    st = result.state
    assert st.y_traits.shape == (len(st.sampled_idx), 3)
    np.testing.assert_array_equal(st.y_traits[:, 0], st.y)
    # each trait's posterior must beat the zero-mean prior on ITS truth
    for t in range(3):
        prior = float(np.sqrt(np.mean(env.traits[:, t] ** 2)))
        assert result.trait_rmse[t] < prior, (t, result.trait_rmse[t], prior)
    # the traits record lands in the episode history
    assert any(h.get("phase") == "traits" for h in result.history)


def test_planning_trait_decisions_match_its_own_single_trait_run():
    """Adding traits must not move the planner: a multi-trait episode's
    path decisions are a pure function of trait 0's stream.  (The
    measurement VALUES differ between num_traits=1 and 3 — the env rng
    draws (k, T) normals — so equality is asserted by re-running the
    multi-trait env and checking determinism plus planning-trait
    provenance, and separately that decisions ignore traits 1..T-1: two
    multi-trait envs differing ONLY in non-planning trait noise share
    trait 0, which the collect_traits draw ties to the same rng stream.)
    """
    cfg = _cfg(3)
    r1 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
    r2 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
    np.testing.assert_array_equal(r1.state.sampled_idx, r2.state.sampled_idx)
    np.testing.assert_array_equal(r1.state.y_traits, r2.state.y_traits)
    assert r1.trait_rmse == r2.trait_rmse


def test_multitrait_resume_exactness(tmp_path):
    cfg = _cfg(3, modality="mixed")
    full = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
    half = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=2)
    path = str(tmp_path / "mt.npz")
    ckpt.save(path, half.state)
    loaded = ckpt.load(path)
    np.testing.assert_array_equal(loaded.y_traits, half.state.y_traits)
    resumed = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(
        resume_from=loaded)
    np.testing.assert_array_equal(
        resumed.state.sampled_idx, full.state.sampled_idx)
    np.testing.assert_array_equal(resumed.state.y_traits,
                                  full.state.y_traits)
    assert resumed.trait_rmse == pytest.approx(full.trait_rmse, abs=1e-6)


def test_resume_trait_mismatch_rejected(tmp_path):
    """A single-trait checkpoint cannot seed a multi-trait episode (the
    pilot rows' traits are unrecoverable) and vice versa — the boundary
    raises a clear error instead of a shape crash mid-step (round-5
    review finding)."""
    cfg1 = _cfg(1)
    half = Agent(FieldEnv(cfg1.field, cfg1.kernel), cfg1).run(max_steps=1)
    path = str(tmp_path / "st.npz")
    ckpt.save(path, half.state)
    cfg3 = _cfg(3)
    agent3 = Agent(FieldEnv(cfg3.field, cfg3.kernel), cfg3)
    with pytest.raises(ValueError, match="trait mismatch"):
        agent3.run(resume_from=ckpt.load(path))
    # and the reverse direction
    half3 = Agent(FieldEnv(cfg3.field, cfg3.kernel), cfg3).run(max_steps=1)
    ckpt.save(path, half3.state)
    agent1 = Agent(FieldEnv(cfg1.field, cfg1.kernel), cfg1)
    with pytest.raises(ValueError, match="trait mismatch"):
        agent1.run(resume_from=ckpt.load(path))


def test_multitrait_mesh_matches_single_chip():
    from algp_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    cfg = _cfg(2)
    single = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
    mesh = make_mesh(len(jax.devices()))
    meshed = Agent(FieldEnv(cfg.field, cfg.kernel), cfg, mesh=mesh).run()
    np.testing.assert_array_equal(
        single.state.sampled_idx, meshed.state.sampled_idx)
    assert meshed.trait_rmse == pytest.approx(single.trait_rmse, abs=1e-5)


def test_multitrait_icm_mesh_matches_single_chip():
    """The ICM family over the mesh: the end-of-episode coregionalized
    fit shards its restart batch across the mesh's 'restarts' axis
    (models.coregional.fit_icm mesh path via multifit) — decisions AND
    per-trait RMSE must match the single-chip ICM episode, including
    under trait under-observation (the transfer regime the ICM exists
    for)."""
    from algp_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    cfg = _cfg(3)
    cfg = dataclasses.replace(
        cfg,
        fit=dataclasses.replace(cfg.fit, multi_fit="icm"),
        field=dataclasses.replace(cfg.field, trait_corr=0.8,
                                  trait_obs_frac=0.5),
    )
    single = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
    mesh = make_mesh(len(jax.devices()))
    meshed = Agent(FieldEnv(cfg.field, cfg.kernel), cfg, mesh=mesh).run()
    np.testing.assert_array_equal(
        single.state.sampled_idx, meshed.state.sampled_idx)
    assert meshed.trait_rmse == pytest.approx(single.trait_rmse, abs=1e-5)
    assert meshed.trait_rmse_test == pytest.approx(
        single.trait_rmse_test, abs=1e-5)


def test_multitrait_table_episode():
    """c10_table with explicit value_cols: the table loader's multi-trait
    columns reach the episode loop (per-trait masks included)."""
    base = PRESETS["c10_table"]
    df_cols = _table_value_cols(base.field.data_path)
    if len(df_cols) < 2:
        pytest.skip("sample table has a single value column")
    cfg = dataclasses.replace(
        base,
        field=dataclasses.replace(base.field, value_cols=tuple(df_cols[:2])),
        episode=dataclasses.replace(base.episode, budget=60.0),
        fit=FitConfig(iters=25, restarts=1),
    )
    env = FieldEnv(cfg.field, cfg.kernel)
    result = Agent(env, cfg).run(max_steps=4)
    assert result.trait_rmse_test is not None
    assert len(result.trait_rmse_test) == 2
    assert np.isfinite(result.trait_rmse_test).all()


def _table_value_cols(path):
    import pandas as pd

    df = pd.read_csv(path)
    return [c for c in df.columns
            if c not in ("row", "range") and not c.startswith("feat_")]


def test_trait_corr_mixing_and_planning_trait_unchanged():
    """FieldConfig.trait_corr mixes the synthetic trait draws through the
    equicorrelation Cholesky factor: trait 0 is unchanged (its factor row
    is e0 — the planning stream keeps its bits) and secondary traits gain
    the requested correlation with it."""
    cfg0 = _cfg(3)
    cfgc = dataclasses.replace(
        cfg0, field=dataclasses.replace(cfg0.field, trait_corr=0.8)
    )
    env0 = FieldEnv(cfg0.field, cfg0.kernel)
    envc = FieldEnv(cfgc.field, cfgc.kernel)
    np.testing.assert_array_equal(env0.traits[:, 0], envc.traits[:, 0])
    for t in (1, 2):
        r0 = np.corrcoef(env0.traits[:, 0], env0.traits[:, t])[0, 1]
        rc = np.corrcoef(envc.traits[:, 0], envc.traits[:, t])[0, 1]
        assert rc > max(r0, 0.5), (t, r0, rc)
    bad = dataclasses.replace(
        cfg0, field=dataclasses.replace(cfg0.field, trait_corr=1.5)
    )
    with pytest.raises(ValueError, match="trait_corr"):
        FieldEnv(bad.field, bad.kernel)


def test_multitrait_episode_icm_family():
    """FitConfig.multi_fit='icm' swaps the end-of-episode per-trait family
    for the coregionalized joint GP: same planning decisions (the swap
    only touches the final evaluation), finite per-trait RMSE, and on a
    correlated field the ICM must not be worse than independent fits
    (same sampled plots, all traits fully observed — parity regime)."""
    base = _cfg(2)
    base = dataclasses.replace(
        base, field=dataclasses.replace(base.field, trait_corr=0.9)
    )
    ind = Agent(FieldEnv(base.field, base.kernel), base).run()
    cfg_icm = dataclasses.replace(
        base, fit=dataclasses.replace(base.fit, multi_fit="icm")
    )
    icm = Agent(FieldEnv(cfg_icm.field, cfg_icm.kernel), cfg_icm).run()
    np.testing.assert_array_equal(
        ind.state.sampled_idx, icm.state.sampled_idx
    )
    assert np.isfinite(icm.trait_rmse).all()
    assert np.isfinite(icm.trait_rmse_test).all()
    # full observation + correlated truth: ICM is at worst ~neutral
    assert np.mean(icm.trait_rmse_test) < np.mean(ind.trait_rmse_test) * 1.15


def test_multi_fit_validated():
    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg, fit=dataclasses.replace(cfg.fit, multi_fit="bogus")
    )
    with pytest.raises(ValueError, match="multi_fit"):
        Agent(FieldEnv(cfg.field, cfg.kernel), cfg)


def test_trait_obs_frac_under_observation():
    """FieldConfig.trait_obs_frac < 1: secondary traits are measured at
    only a fraction of visited plots — trait 0 always measured, NaN marks
    the skipped cells (the mask IS the NaN pattern), and the episode's
    final per-trait evaluation handles partial buffers in BOTH families
    (ragged independent fits; masked ICM)."""
    base = _cfg(3)
    cfgf = dataclasses.replace(
        base,
        field=dataclasses.replace(base.field, trait_corr=0.8,
                                  trait_obs_frac=0.4),
    )
    env = FieldEnv(cfgf.field, cfgf.kernel)
    idx, Y, scale, obs = env.collect_traits(np.arange(0, env.n, 3))
    assert obs[:, 0].all() and not obs[:, 1:].all()
    np.testing.assert_array_equal(np.isnan(Y), ~obs)
    assert 0.1 < obs[:, 1:].mean() < 0.8

    # independent family: ragged per-trait fallback
    r_ind = Agent(FieldEnv(cfgf.field, cfgf.kernel), cfgf).run()
    assert np.isfinite(r_ind.trait_rmse_test).all()
    assert np.isnan(r_ind.state.y_traits[:, 1:]).any()
    assert not np.isnan(r_ind.state.y_traits[:, 0]).any()
    # ICM family on the same campaign
    cfg_icm = dataclasses.replace(
        cfgf, fit=dataclasses.replace(cfgf.fit, multi_fit="icm")
    )
    r_icm = Agent(FieldEnv(cfg_icm.field, cfg_icm.kernel), cfg_icm).run()
    np.testing.assert_array_equal(
        r_ind.state.sampled_idx, r_icm.state.sampled_idx
    )
    assert np.isfinite(r_icm.trait_rmse_test).all()


def test_trait_obs_frac_resume_exact(tmp_path):
    """The NaN observation pattern must survive checkpoint/resume: a
    resumed under-observed campaign reproduces the uninterrupted one
    cell-for-cell (env rng state carries the Bernoulli stream)."""
    base = _cfg(2)
    cfgf = dataclasses.replace(
        base,
        field=dataclasses.replace(base.field, trait_obs_frac=0.5),
        fit=dataclasses.replace(base.fit, multi_fit="icm"),
    )
    full = Agent(FieldEnv(cfgf.field, cfgf.kernel), cfgf).run()
    half = Agent(FieldEnv(cfgf.field, cfgf.kernel), cfgf).run(max_steps=2)
    path = str(tmp_path / "uo.npz")
    ckpt.save(path, half.state)
    resumed = Agent(FieldEnv(cfgf.field, cfgf.kernel), cfgf).run(
        resume_from=ckpt.load(path))
    np.testing.assert_array_equal(
        resumed.state.sampled_idx, full.state.sampled_idx)
    np.testing.assert_array_equal(
        np.isnan(resumed.state.y_traits), np.isnan(full.state.y_traits))
    np.testing.assert_array_equal(
        np.nan_to_num(resumed.state.y_traits),
        np.nan_to_num(full.state.y_traits))
    assert resumed.trait_rmse == pytest.approx(full.trait_rmse, abs=1e-6)


def test_trait_obs_frac_default_stream_unchanged():
    """trait_obs_frac=1.0 must not consume extra rng draws: the trait
    measurement stream keeps its bits vs a config without the field."""
    base = _cfg(2)
    env_a = FieldEnv(base.field, base.kernel)
    env_b = FieldEnv(
        dataclasses.replace(base.field, trait_obs_frac=1.0), base.kernel
    )
    _, Ya, _, _ = env_a.collect_traits([1, 5, 9])
    _, Yb, _, _ = env_b.collect_traits([1, 5, 9])
    np.testing.assert_array_equal(Ya, Yb)


def test_trait_obs_frac_validated_at_construction():
    """Out-of-range trait_obs_frac/trait_corr must fail at ENV
    CONSTRUCTION (pure config), not after an expensive synthesis or —
    worse — silently no-op past the `frac < 1` gate (review finding:
    --trait-obs-frac 25 read as percent used to run with full
    observation while the record claimed under-observation)."""
    base = _cfg(2)
    for frac in (25.0, 0.0, -0.1):
        bad = dataclasses.replace(
            base, field=dataclasses.replace(base.field, trait_obs_frac=frac)
        )
        with pytest.raises(ValueError, match="trait_obs_frac"):
            FieldEnv(bad.field, bad.kernel)


def test_zero_observation_trait_warns():
    """The ragged independent fallback warns when a trait ends with < 2
    observed cells (its posterior is the prior — a silently
    legitimate-looking RMSE otherwise; review finding)."""
    import warnings

    import jax as _jax

    from algp_tpu.models.multifit import multitrait_mean_fields

    base = _cfg(2)
    env = FieldEnv(base.field, base.kernel)
    idx = np.arange(0, env.n, 4)
    _, Y, ns, _ = env.collect_traits(idx)
    Y[:, 1] = np.nan  # trait 1 never measured
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        M = multitrait_mean_fields(
            base.kernel, base.fit, env.X, idx, Y, ns,
            env.observed_traits, _jax.random.PRNGKey(0),
        )
    assert any("observed cell" in str(x.message) for x in w)
    assert M.shape == (env.n, 2)
