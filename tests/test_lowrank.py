"""Low-rank (inducing-point) MI acquisition vs the f64 oracle and the
exact path (SURVEY.md §2 C7 scaled past the exact N³ ceiling).

Fidelity ladder:
  1. the seed's precision diagonal/columns match a dense f64 Woodbury;
  2. with Z = X the low-rank selections coincide with the EXACT device
     path and the exact f64 oracle (the factorization is exact up to the
     K_zz jitter);
  3. with a proper subset Z the selections match the low-rank f64 oracle
     index-for-index (same approximation, two implementations);
  4. quality: with a modest inducing set on a smooth field, round-0 MI
     scores stay close to the exact scores (the approximation is in the
     denominator background term only).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from algp_tpu import acquisition as acq
from algp_tpu import acquisition_lowrank as lr
from algp_tpu.ops.kernels import KernelParams, KernelSpec

import oracle

from test_acquisition import setup_field


def _params(ls, os_, noise, dim=2):
    return KernelParams(
        log_ls_spatial=jnp.full((dim,), np.log(ls), jnp.float32),
        log_ls_feature=jnp.zeros((0,), jnp.float32),
        log_outputscale=jnp.asarray(np.log(os_), jnp.float32),
        log_noise=jnp.asarray(np.log(noise), jnp.float32),
    )


def test_seed_matches_dense_woodbury(rng):
    spec, params, x, K, nv = setup_field(rng, n=200)
    zidx = np.arange(0, 200, 4)
    P_ref = oracle.lowrank_precision(K, zidx, nv)
    seed = lr.lowrank_precision_seed(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((200,), nv, jnp.float32), jnp.asarray(x[zidx], jnp.float32),
    )
    np.testing.assert_allclose(
        np.array(seed.pdiag), np.diag(P_ref), rtol=3e-3, atol=1e-3
    )
    # spot-check full columns via the implicit form
    for j in (0, 57, 131):
        col = np.array(lr._precision_col(seed, jnp.asarray(j, jnp.int32)))
        np.testing.assert_allclose(col, P_ref[:, j], rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("num_pilot", [0, 5])
def test_full_inducing_matches_exact_path(rng, num_pilot):
    """Z = X ⇒ the low-rank path must reproduce the exact MI selections
    (and hence the exact f64 oracle)."""
    spec, params, x, K, nv = setup_field(rng, n=220)
    rounds = 15
    pilot = rng.choice(len(x), size=num_pilot, replace=False).astype(np.int32)
    xj = jnp.asarray(x, jnp.float32)
    nvj = jnp.full((len(x),), nv, jnp.float32)
    res_exact = acq.greedy_select(
        spec, params, xj, nvj, jnp.asarray(pilot),
        rounds=rounds, num_pilot=num_pilot, strategy="mi",
    )
    res_lr = lr.greedy_select_lowrank(
        spec, params, xj, nvj, jnp.asarray(pilot), xj,
        rounds=rounds, num_pilot=num_pilot,
    )
    np.testing.assert_array_equal(
        np.array(res_lr.selected), np.array(res_exact.selected)
    )
    sel_ref, _ = oracle.greedy_mi_selection(K, nv, rounds, pilot)
    np.testing.assert_array_equal(np.array(res_lr.selected), sel_ref)
    np.testing.assert_allclose(
        np.array(res_lr.post_var), np.array(res_exact.post_var),
        rtol=1e-3, atol=1e-3,
    )


@pytest.mark.parametrize("num_pilot", [0, 6])
def test_subset_inducing_matches_lowrank_oracle(rng, num_pilot):
    spec, params, x, K, nv = setup_field(rng, n=240)
    rounds = 18
    pilot = rng.choice(len(x), size=num_pilot, replace=False).astype(np.int32)
    zidx = np.asarray(
        lr.kcenter_indices(jnp.asarray(x, jnp.float32), 60)
    )
    res = lr.greedy_select_lowrank(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32), jnp.asarray(pilot),
        jnp.asarray(x[zidx], jnp.float32),
        rounds=rounds, num_pilot=num_pilot, return_scores=True,
    )
    sel_ref, traces = oracle.greedy_mi_selection_lowrank(
        K, zidx, nv, rounds, pilot
    )
    dev_scores = np.array(res.scores)
    for r in range(rounds):
        live = np.isfinite(traces[r])
        np.testing.assert_allclose(
            dev_scores[r][live], traces[r][live], rtol=2e-3, atol=2e-3
        )
    np.testing.assert_array_equal(np.array(res.selected), sel_ref)


def test_duplicate_pilot_indices_stay_finite(rng):
    spec, params, x, K, nv = setup_field(rng, n=150)
    pilot = np.array([3, 17, 3, 99], np.int32)  # node 3 measured twice
    res = lr.greedy_select_lowrank(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32), jnp.asarray(pilot),
        jnp.asarray(x[:: 3], jnp.float32),
        rounds=10, num_pilot=4, return_scores=True,
    )
    assert np.isfinite(np.array(res.post_var)).all()
    sel = np.array(res.selected)
    assert len(np.unique(sel)) == len(sel)
    assert not np.isin(sel, pilot).any()


def test_kcenter_indices_deterministic_and_spread(rng):
    x = rng.uniform(0, 10, (500, 2)).astype(np.float32)
    i1 = np.array(lr.kcenter_indices(jnp.asarray(x), 32))
    i2 = np.array(lr.kcenter_indices(jnp.asarray(x), 32))
    np.testing.assert_array_equal(i1, i2)
    assert len(np.unique(i1)) == 32  # maximin never repeats while N > m
    # coverage: every point within a modest radius of an inducing center
    d = np.sqrt(((x[:, None, :] - x[i1][None, :, :]) ** 2).sum(-1)).min(1)
    assert d.max() < 2.5  # 500 pts in a 10×10 box, 32 centers

    # alignment-padding sentinels must never be chosen
    xp, _ = acq.pad_candidates(jnp.asarray(x), jnp.ones((500,)), align=512)
    ip = np.array(lr.kcenter_indices(xp, 32, jnp.asarray(500, jnp.int32)))
    assert (ip < 500).all()


def test_round0_scores_close_to_exact_on_smooth_field(rng):
    """Quality gate: on a field whose lengthscale the inducing design
    resolves, the low-rank MI scores stay within a few percent of exact."""
    spec, params, x, K, nv = setup_field(rng, n=300, ls=3.0)
    xj = jnp.asarray(x, jnp.float32)
    nvj = jnp.full((300,), nv, jnp.float32)
    exact = acq.greedy_select(
        spec, params, xj, nvj, jnp.zeros((0,), jnp.int32),
        rounds=1, num_pilot=0, strategy="mi", return_scores=True,
    )
    zidx = np.asarray(lr.kcenter_indices(xj, 75))
    approx = lr.greedy_select_lowrank(
        spec, params, xj, nvj, jnp.zeros((0,), jnp.int32),
        jnp.asarray(x[zidx], jnp.float32),
        rounds=1, num_pilot=0, return_scores=True,
    )
    s_e = np.array(exact.scores[0])
    s_a = np.array(approx.scores[0])
    live = np.isfinite(s_e)
    rel = np.abs(s_a[live] - s_e[live]) / np.abs(s_e[live])
    assert np.median(rel) < 0.05
    assert rel.max() < 0.35


def test_fused_fit_and_select_lowrank_matches_split(rng):
    from algp_tpu.config import FitConfig
    from algp_tpu.models import gp as gp_mod

    spec, params, x, K, nv = setup_field(rng, n=260)
    xj = jnp.asarray(x, jnp.float32)
    n_train = 40
    tr = rng.choice(260, size=n_train, replace=False).astype(np.int32)
    f = rng.standard_normal(260)
    y = jnp.asarray(f[tr], jnp.float32)
    x_train = xj[jnp.asarray(tr)]
    fitcfg = FitConfig(iters=30, restarts=2)

    fit_res, sel = lr.fit_and_select_lowrank(
        spec, fitcfg, x_train, y, xj, jnp.asarray(tr),
        rounds=12, num_pilot=n_train, num_inducing=64,
    )
    # split pipeline with the same fitted params / nv / inducing design
    fit_ref = gp_mod.fit(spec, fitcfg, x_train, y)
    np.testing.assert_allclose(
        float(fit_res.nll), float(fit_ref.nll), rtol=1e-5
    )
    nv_base = float(
        np.maximum(np.exp(2.0 * fit_ref.params.log_noise),
                   fitcfg.min_noise**2)
    )
    xp, _ = acq.pad_candidates(xj, jnp.ones((260,)))
    zidx = lr.kcenter_indices(xp, 64, jnp.asarray(260, jnp.int32))
    sel_ref = lr.greedy_select_lowrank(
        spec, fit_ref.params, xj, jnp.full((260,), nv_base, jnp.float32),
        jnp.asarray(tr), xp[zidx],
        rounds=12, num_pilot=n_train,
        pilot_nv=jnp.full((n_train,), nv_base, jnp.float32),
    )
    np.testing.assert_array_equal(
        np.array(sel.selected), np.array(sel_ref.selected)
    )


def test_cli_greedy_lowrank_smoke(capsys):
    """--num-inducing routes the greedy MI driver through the low-rank
    path end-to-end (fit → k-center design → selection → refit → RMSE)."""
    import json

    from algp_tpu.cli import main

    rc = main([
        "--mode", "greedy", "--rows", "10", "--cols", "12",
        "--acq-rounds", "8", "--num-pilot", "10", "--iters", "25",
        "--restarts", "2", "--strategy", "mi", "--num-inducing", "24",
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_sampled"] >= 18 and np.isfinite(rec["final_rmse"])


def test_score_sets_lowrank_matches_dense_after_deletes(rng):
    """Low-rank MI set scoring must reproduce a dense f64 reference built
    from the SAME FITC precision, including deletions and the inert
    diag-1 marker for sets revisiting a deleted node."""
    spec, params, x, K, nv = setup_field(rng, n=80)
    x32 = jnp.asarray(x, jnp.float32)
    nvec = jnp.full((80,), nv, jnp.float32)
    zidx = np.arange(0, 80, 2)
    deleted = np.array([6, 41, 70], np.int32)
    # dense reference: FITC seed + sequential Schur deletes (f64)
    Pd = oracle.lowrank_precision(K, zidx, nv)
    for j in deleted:
        Pd = Pd - np.outer(Pd[:, j], Pd[j, :]) / Pd[j, j]
        Pd[j, :] = 0.0
        Pd[:, j] = 0.0
        Pd[j, j] = 1.0
    seed = lr.lowrank_precision_seed(
        spec, params, x32, nvec, jnp.asarray(x[zidx], jnp.float32)
    )
    F, ZT = lr.lowrank_corrections(
        seed, jnp.asarray(np.concatenate([deleted, [0]])),
        jnp.asarray(3, jnp.int32),
    )
    taken = jnp.zeros((80,), bool).at[jnp.asarray(deleted)].set(True)
    basis = jnp.zeros((4, 80), jnp.float32)
    sets = np.array([[5, 6, 7], [40, 41, 60], [10, 20, 30]], np.int32)
    sizes = np.array([3, 3, 2], np.int32)  # sets 0/1 contain deleted nodes
    scores_lr = np.array(
        acq.score_candidate_sets(
            spec, params, x32, nvec, basis,
            jnp.asarray(sets), jnp.asarray(sizes),
            P_lowrank=(seed.VT, seed.dinv, F, ZT, taken), strategy="mi",
        )
    )
    scores_dense = np.array(
        acq.score_candidate_sets(
            spec, params, x32, nvec, basis,
            jnp.asarray(sets), jnp.asarray(sizes),
            P=jnp.asarray(Pd, jnp.float32), strategy="mi",
        )
    )
    np.testing.assert_allclose(scores_lr, scores_dense, rtol=2e-3, atol=2e-4)
    assert np.isfinite(scores_lr).all()


def test_lowrank_field_synthesis(rng):
    """FITC-sampled synthetic fields: deterministic, finite, correctly
    scaled, and spatially correlated at the true lengthscale."""
    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv
    from algp_tpu.ops.kernels import KernelSpec

    cfg = FieldConfig(num_rows=40, num_cols=40, true_ls_spatial=6.0,
                      synth_inducing=220, seed=3)
    env1 = FieldEnv(cfg, KernelSpec("rbf", ds=2))
    env2 = FieldEnv(cfg, KernelSpec("rbf", ds=2))
    np.testing.assert_array_equal(env1.f, env2.f)
    assert np.isfinite(env1.f).all()
    # marginal variance ≈ outputscale (loose: a correlated field's sample
    # variance fluctuates)
    v = float(np.var(env1.f))
    assert 0.25 < v < 4.0
    # neighbors correlate far more than distant pairs
    F = env1.f.reshape(40, 40)
    r_near = np.corrcoef(F[:, :-1].ravel(), F[:, 1:].ravel())[0, 1]
    assert r_near > 0.9  # rbf ls=6 ⇒ theoretical neighbor corr ≈ 0.986


def test_lowrank_field_synthesis_chunked(rng, monkeypatch):
    """The streamed (chunked-candidate-axis) FITC synthesis — the path
    grids past ~2.6M points take (the monolithic (m, n) Kzx buffer OOMed
    a 16 GB v5e at 4.19M) — draws the SAME field as the monolithic
    program up to float-level reassociation."""
    from algp_tpu import field as field_mod
    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv
    from algp_tpu.ops.kernels import KernelSpec

    cfg = FieldConfig(num_rows=40, num_cols=40, true_ls_spatial=6.0,
                      synth_inducing=220, seed=3)
    env_mono = FieldEnv(cfg, KernelSpec("rbf", ds=2))
    # force the streamed path with a chunk that does NOT divide n = 1600
    # (exercises the inert-row padding of the last chunk)
    monkeypatch.setattr(field_mod, "_SYNTH_CHUNK_BYTES", 0)
    monkeypatch.setattr(field_mod, "_SYNTH_CHUNK", 704)
    env_chunk = FieldEnv(cfg, KernelSpec("rbf", ds=2))
    np.testing.assert_allclose(env_chunk.f, env_mono.f, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(env_chunk.test_mask, env_mono.test_mask)


def test_episode_lowrank_smoke(rng):
    """A full informative-path MI episode through the low-rank planning
    path (num_inducing > 0): runs to budget, finite metrics, and the
    posterior improves on the pilot-only state."""
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    cfg = dataclasses.replace(
        base,
        field=dataclasses.replace(base.field, num_rows=12, num_cols=16,
                                  true_ls_spatial=3.0),
        acquisition=dataclasses.replace(base.acquisition, num_inducing=48),
        episode=dataclasses.replace(base.episode, num_pilot=16, budget=60.0,
                                    samples_per_step=6),
    )
    env = FieldEnv(cfg.field, cfg.kernel)
    result = Agent(env, cfg).run(max_steps=8)
    assert result.state.step >= 2
    assert np.isfinite(result.rmse) and np.isfinite(result.rmse_test)
    # the episode actually traversed and collected: samples grew past the
    # pilot set and budget was spent (variance/RMSE monotonicity is NOT
    # asserted — refits re-scale the posterior between steps)
    assert len(result.state.sampled_idx) > 16
    assert result.state.budget_left < cfg.episode.budget


def test_episode_lowrank_resume_continues_exactly(tmp_path):
    """Resume exactness for the LOW-RANK episode path: the inducing-point
    precision seed is rebuilt from the checkpointed params, so a resumed
    run must reproduce the uninterrupted one decision-for-decision."""
    import dataclasses

    from algp_tpu.config import (
        AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
        FitConfig,
    )
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv
    from algp_tpu.utils import checkpoint as ckpt

    cfg = ExperimentConfig(
        fit=FitConfig(iters=25, restarts=1),
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=32),
        episode=EpisodeConfig(num_pilot=8, budget=30.0, num_waypoints=4,
                              samples_per_step=4, seed=5, refit_every=2),
        field=FieldConfig(num_rows=7, num_cols=11, seed=13,
                          true_ls_spatial=2.5),
    )

    def fresh_env():
        return FieldEnv(cfg.field, cfg.kernel)

    full = Agent(fresh_env(), cfg).run(max_steps=8)
    half = Agent(fresh_env(), cfg).run(max_steps=3)
    path = str(tmp_path / "mid_lr.npz")
    ckpt.save(path, half.state)
    st = ckpt.load(path)
    resumed = Agent(fresh_env(), cfg).run(max_steps=8, resume_from=st)
    np.testing.assert_array_equal(
        resumed.state.sampled_idx, full.state.sampled_idx
    )
    assert abs(resumed.rmse - full.rmse) < 1e-5


def test_episode_lowrank_with_deep_kernel(rng):
    """Deep feature kernel + low-rank MI planning combined: each refit
    re-embeds the candidate matrix, which must refresh BOTH the
    precision seed and the episode-cached k-center design."""
    import dataclasses

    from algp_tpu.config import (
        AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
        FitConfig, KernelSpec, MLPSpec,
    )
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    cfg = ExperimentConfig(
        kernel=KernelSpec("matern32", "rbf", ds=2, df=2),
        deep=MLPSpec(hidden=(8,), out=3),
        fit=FitConfig(iters=20, restarts=1),
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=32),
        episode=EpisodeConfig(num_pilot=10, budget=30.0, num_waypoints=4,
                              samples_per_step=4, seed=1, refit_every=2),
        field=FieldConfig(num_rows=8, num_cols=10, num_features=2, seed=4,
                          true_ls_spatial=2.5),
    )
    env = FieldEnv(cfg.field, cfg.kernel)
    agent = Agent(env, cfg)
    result = agent.run(max_steps=6)
    assert result.state.step >= 2
    assert np.isfinite(result.rmse_test)
    # a k-center design was computed over an EMBEDDED candidate matrix
    # ([spatial | φ(features)]), and stays in sync with the matrix it was
    # computed from (the cache may lag one refit if the episode ends on
    # an empty-plan step, which skips the MI planner)
    z_src, z = agent._z_cache
    assert z.shape == (32, 2 + 3)  # ds + MLP out dims
    assert z_src.shape == agent._Xdev.shape


@pytest.mark.parametrize("num_inducing", [0, 40])
def test_device_metrics_equivalent_to_host(rng, num_inducing):
    """Forcing device-reduced metrics must not change any DECISION, and
    the logged RMSE/mean-var must agree with the host-computed values
    to f32 tolerance — for both the exact and low-rank MI planners,
    mixed modality included (the precise-site choice now reads the
    path's site variances instead of the full field)."""
    import dataclasses

    from algp_tpu.config import (
        AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
        FitConfig,
    )
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = ExperimentConfig(
        fit=FitConfig(iters=20, restarts=1),
        acquisition=AcquisitionConfig(strategy="mi",
                                      num_inducing=num_inducing),
        episode=EpisodeConfig(num_pilot=10, budget=36.0, num_waypoints=4,
                              samples_per_step=5, seed=3, refit_every=2,
                              modality="mixed"),
        field=FieldConfig(num_rows=8, num_cols=12, seed=9,
                          true_ls_spatial=2.5),
    )
    results = {}
    for dm in (False, True):
        cfg = dataclasses.replace(
            base, episode=dataclasses.replace(base.episode,
                                              device_metrics=dm),
        )
        env = FieldEnv(cfg.field, cfg.kernel)
        results[dm] = Agent(env, cfg).run(max_steps=6)
    np.testing.assert_array_equal(
        results[True].state.sampled_idx, results[False].state.sampled_idx
    )
    def metric_records(r):
        return [h for h in r.history if "rmse" in h]

    for ha, hb in zip(metric_records(results[False]),
                      metric_records(results[True])):
        assert abs(ha["rmse"] - hb["rmse"]) < 2e-4
        assert abs(ha["rmse_test"] - hb["rmse_test"]) < 2e-4
        assert abs(ha["mean_var"] - hb["mean_var"]) < 2e-4
    assert abs(results[True].rmse - results[False].rmse) < 2e-4


def test_lowrank_corrections_at_matches_full(rng):
    """Row-restricted correction factors must equal rows of the full
    ones (same algebra, no full (N, C) build) — incl. duplicate sampled
    indices and rows that revisit sampled nodes."""
    spec, params, x, K, nv = setup_field(rng, n=160)
    seed = lr.lowrank_precision_seed(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((160,), nv, jnp.float32),
        jnp.asarray(x[::3], jnp.float32),
    )
    idx = jnp.asarray(np.array([5, 40, 5, 99, 0, 0], np.int32))
    count = jnp.asarray(4, jnp.int32)  # slots 4-5 padded, slot 2 a dup
    F, ZT = lr.lowrank_corrections(seed, idx, count)
    rows = jnp.asarray(np.array([0, 5, 17, 40, 99, 150, 17], np.int32))
    F_r, ZT_r = lr.lowrank_corrections_at(seed, idx, count, rows)
    np.testing.assert_allclose(np.array(F_r), np.array(F)[np.array(rows)],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.array(ZT_r), np.array(ZT)[np.array(rows)],
                               rtol=1e-5, atol=1e-6)


def test_v_rows_at_matches_full_seed(rng):
    """The small-factor seed reproduces any rows of VT/dinv with the
    full seed's per-row arithmetic."""
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.3, noise=0.12)
    n = 150
    x = jnp.asarray(rng.uniform(0, 10, (n, 2)), jnp.float32)
    nv = jnp.full((n,), 0.12**2, jnp.float32)
    z = x[lr.kcenter_indices(x, 40)]
    full = lr.lowrank_precision_seed(spec, params, x, nv, z)
    fac = lr.lowrank_factors_seed(
        spec, params, x, z, min_noise=1e-3, nv_mult=1.0,
    )
    # nv above must equal what the factors seed derives: base = noise²
    rows = jnp.asarray(
        rng.choice(n, 30, replace=False).astype(np.int32)
    )
    VT_r, dinv_r = lr.v_rows_at(spec, params, fac, x[rows], nv[rows])
    # per-row equality is to f32 tolerance, not bitwise: XLA's trisolve
    # accumulation order varies with RHS width, and 1/d amplifies ulp
    # differences for rows near inducing points (d → nv).  Decision-level
    # equality is asserted tight in test_plan_step_factors_matches_full_seed.
    np.testing.assert_allclose(
        np.asarray(VT_r), np.asarray(full.VT)[np.asarray(rows)],
        rtol=5e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(dinv_r), np.asarray(full.dinv)[np.asarray(rows)],
        rtol=5e-3,
    )


def test_factors_seed_chunked_matches_monolithic(rng, monkeypatch):
    """The streamed B-assembly (taken once the (M, N) Ut buffer would
    blow HBM — the 4.19M-grid regime) produces the same small factors as
    the monolithic pass up to f32 reassociation, including a tail chunk
    that needs inert padding.

    The streamed branch gates its per-chunk solve on the same GLOBAL
    candidate count as _seed_solve (for M ≤ 1280 streaming only ever
    triggers past the gate; a larger explicit M streams from smaller N
    and must stay in the sub-gate trisolve family with v_rows_at).
    Forcing the gate ON here makes both passes run the explicit-inverse
    arithmetic the production streamed regime uses — where chunked and
    monolithic are per-column bit-comparable (the trisolve's bits vary
    with RHS width, so the sub-gate pairing is only family-equal)."""
    import jax

    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.3, noise=0.12)
    n = 150
    x = jnp.asarray(rng.uniform(0, 10, (n, 2)), jnp.float32)
    z = x[lr.kcenter_indices(x, 40)]
    monkeypatch.setattr(acq, "COND_MATMUL_N", 1)
    jax.clear_caches()
    try:
        fac_mono = lr.lowrank_factors_seed(spec, params, x, z, nv_mult=1.5)
        monkeypatch.setattr(lr, "_SEED_CHUNK_BYTES", 0)
        monkeypatch.setattr(lr, "_SEED_CHUNK", 64)  # 64 ∤ 150 → padded tail
        lr.lowrank_factors_seed.clear_cache()
        fac_chunk = lr.lowrank_factors_seed(spec, params, x, z, nv_mult=1.5)
    finally:
        lr.lowrank_factors_seed.clear_cache()
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(fac_mono.Lzz),
                                  np.asarray(fac_chunk.Lzz))
    np.testing.assert_allclose(np.asarray(fac_mono.LB),
                               np.asarray(fac_chunk.LB),
                               rtol=1e-5, atol=2e-6)


def test_factors_seed_streamed_solve_family_follows_gate(rng, monkeypatch):
    """The streamed B-assembly must pick its per-chunk solve by the SAME
    global-count gate as _seed_solve: below COND_MATMUL_N the trisolve
    (the family v_rows_at and the mesh seeds use there), above it the
    explicit-inverse matmul.  A large explicit M (e.g. 2048) streams
    from N ≈ 655k — below the gate — where the old hard-wired matmul
    silently broke the 'identical per-row arithmetic' contract."""
    import jax

    from algp_tpu.ops import linalg as la_mod
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.0, noise=0.1)
    x = jnp.asarray(rng.uniform(0, 10, (150, 2)), jnp.float32)
    z = x[lr.kcenter_indices(x, 24)]
    calls = []
    orig = la_mod.solve_triangular
    monkeypatch.setattr(
        la_mod, "solve_triangular",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
    )
    monkeypatch.setattr(lr, "_SEED_CHUNK_BYTES", 0)
    monkeypatch.setattr(lr, "_SEED_CHUNK", 64)
    try:
        lr.lowrank_factors_seed.clear_cache()
        jax.clear_caches()
        fac = lr.lowrank_factors_seed(spec, params, x, z)  # N=150 < gate
        assert calls, "sub-gate streamed seed must use the trisolve family"
        assert np.isfinite(np.asarray(fac.LB)).all()
        calls.clear()
        monkeypatch.setattr(acq, "COND_MATMUL_N", 1)
        lr.lowrank_factors_seed.clear_cache()
        jax.clear_caches()
        lr.lowrank_factors_seed(spec, params, x, z)  # N=150 ≥ forced gate
        assert not calls, "gated streamed seed must use the matmul family"
    finally:
        lr.lowrank_factors_seed.clear_cache()
        jax.clear_caches()


def test_plan_step_factors_matches_full_seed(rng):
    """plan_episode_step_lowrank_factors ≡ plan_episode_step_lowrank:
    same choice, same posterior fields, same set scores."""
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.3, noise=0.12)
    n, cap, S_sets, k = 180, 16, 10, 5
    x = jnp.asarray(rng.uniform(0, 11, (n, 2)), jnp.float32)
    idx = rng.choice(n, 11, replace=False).astype(np.int32)
    idx_pad = jnp.asarray(np.pad(idx, (0, cap - 11)))
    count = jnp.asarray(11, jnp.int32)
    ns_pad = jnp.asarray(
        np.pad(rng.uniform(1.0, 4.0, 11).astype(np.float32),
               (0, cap - 11), constant_values=1.0)
    )
    y_pad = jnp.asarray(
        np.pad(rng.standard_normal(11).astype(np.float32), (0, cap - 11))
    )
    sets = jnp.asarray(rng.integers(0, n, (S_sets, k)).astype(np.int32))
    sizes = jnp.asarray(rng.integers(1, k + 1, S_sets).astype(np.int32))
    costs = jnp.asarray(rng.uniform(2.0, 6.0, S_sets).astype(np.float32))
    z = x[lr.kcenter_indices(x, 36)]

    seed_full = lr.lowrank_seed_with_z(spec, params, x, z, nv_mult=1.5)
    b1, mean1, d1, s1 = lr.plan_episode_step_lowrank(
        spec, params, x, idx_pad, count, ns_pad, y_pad, sets, sizes,
        costs, seed_full, nv_mult=1.5,
    )
    fac = lr.lowrank_factors_seed(spec, params, x, z, nv_mult=1.5)
    b2, mean2, d2, s2 = lr.plan_episode_step_lowrank_factors(
        spec, params, x, idx_pad, count, ns_pad, y_pad, sets, sizes,
        costs, fac, nv_mult=1.5,
    )
    assert int(b1) == int(b2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(mean1), np.asarray(mean2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_kcenter_start_variants_distinct_valid(rng):
    """kcenter_indices(start=j): deterministic, starts at j, all-distinct
    maximin designs; start=0 is the long-standing default bit-for-bit."""
    from algp_tpu import acquisition_lowrank as acq_lr

    x = jnp.asarray(rng.uniform(0, 20, (300, 2)), jnp.float32)
    z_default = np.asarray(acq_lr.kcenter_indices(x, 24))
    z0 = np.asarray(acq_lr.kcenter_indices(x, 24, start=0))
    np.testing.assert_array_equal(z_default, z0)
    designs = []
    for start in (0, 100, 299):
        zi = np.asarray(acq_lr.kcenter_indices(x, 24, start=start))
        assert zi[0] == start
        assert len(np.unique(zi)) == 24  # no duplicates
        designs.append(tuple(zi))
    assert len(set(designs)) == 3  # genuinely distinct variants


def test_ensemble_step_identical_designs_matches_plain(rng):
    """The z-ensemble step with K IDENTICAL stacked seeds must reproduce
    the single-design step exactly (mean of equal scores) — pins the
    vmap path's arithmetic to the plain path."""
    import jax

    from algp_tpu import acquisition_lowrank as acq_lr

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.3, noise=0.12)
    n, cap, S_sets, k, M = 220, 16, 12, 5, 32
    x = jnp.asarray(rng.uniform(0, 11, (n, 2)), jnp.float32)
    idx = rng.choice(n, 10, replace=False).astype(np.int32)
    idx_pad = jnp.asarray(np.pad(idx, (0, cap - 10)))
    count = jnp.asarray(10, jnp.int32)
    ns_pad = jnp.ones((cap,), jnp.float32)
    y_pad = jnp.asarray(
        np.pad(rng.standard_normal(10).astype(np.float32), (0, cap - 10))
    )
    sets = jnp.asarray(rng.integers(0, n, (S_sets, k)).astype(np.int32))
    sizes = jnp.asarray(np.full(S_sets, k, np.int32))
    costs = jnp.asarray(rng.uniform(2, 9, S_sets).astype(np.float32))

    z = x[acq_lr.kcenter_indices(x, M)]
    fac = acq_lr.lowrank_factors_seed(spec, params, x, z)
    args = (spec, params, x, idx_pad, count, ns_pad, y_pad,
            sets, sizes, costs)
    b1, m1, d1, s1 = acq_lr.plan_episode_step_lowrank_factors(*args, fac)
    fac2 = jax.tree_util.tree_map(lambda l: jnp.stack([l, l]), fac)
    b2, m2, d2, s2 = acq_lr.plan_episode_step_lowrank_factors(
        *args, fac2, ensemble=2,
    )
    assert int(b1) == int(b2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_episode_mi_ensemble_runs_and_is_deterministic():
    """A full informative episode through the z-ensemble MI path
    (mi_ensemble=3): runs to budget, finite metrics, decisions
    reproducible run-to-run; config validation rejects the exact
    planner (the mesh episode supports the ensemble — see
    tests/test_sharded.py)."""
    import dataclasses

    import pytest

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    cfg = dataclasses.replace(
        base,
        field=dataclasses.replace(base.field, num_rows=12, num_cols=16,
                                  true_ls_spatial=3.0),
        acquisition=dataclasses.replace(base.acquisition, num_inducing=48,
                                        mi_ensemble=3),
        episode=dataclasses.replace(base.episode, num_pilot=16, budget=60.0,
                                    samples_per_step=6),
    )
    r1 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=8)
    r2 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=8)
    assert r1.state.step >= 2
    assert np.isfinite(r1.rmse) and np.isfinite(r1.rmse_test)
    np.testing.assert_array_equal(r1.state.sampled_idx, r2.state.sampled_idx)

    bad = dataclasses.replace(
        cfg, acquisition=dataclasses.replace(cfg.acquisition,
                                             num_inducing=0),
    )
    with pytest.raises(ValueError, match="mi_ensemble"):
        Agent(FieldEnv(bad.field, bad.kernel), bad)


def test_lowrank_selection_matches_oracle_under_matmul_seed(monkeypatch):
    """Force the ≥1M seed fast path (COND_MATMUL_N = 1 → the seeds'
    (M, N) triangular solves run as tri_inv matmuls) and re-assert
    oracle-exact low-rank MI selections plus the factor-seed episode
    step's agreement with the full seed — the gate may move the
    arithmetic but not a selection."""
    import jax

    rng = np.random.default_rng(7)
    monkeypatch.setattr(acq, "COND_MATMUL_N", 1)
    jax.clear_caches()
    try:
        spec, params, x, K, nv = setup_field(rng, n=240)
        pilot = rng.choice(len(x), size=6, replace=False).astype(np.int32)
        zidx = np.asarray(
            lr.kcenter_indices(jnp.asarray(x, jnp.float32), 60)
        )
        res = lr.greedy_select_lowrank(
            spec, params, jnp.asarray(x, jnp.float32),
            jnp.full((len(x),), nv, jnp.float32), jnp.asarray(pilot),
            jnp.asarray(x[zidx], jnp.float32),
            rounds=18, num_pilot=6,
        )
        sel_ref, _ = oracle.greedy_mi_selection_lowrank(
            K, zidx, nv, 18, pilot
        )
        np.testing.assert_array_equal(np.array(res.selected), sel_ref)
    finally:
        jax.clear_caches()


def test_greedy_ensemble_identical_designs_match_single(rng):
    """A (K, M, d) z stack of K COPIES of one design must select exactly
    what the single-design path selects (the averaged score of identical
    seeds is the single score up to last-ulp mean rounding)."""
    spec, params, x, K, nv = setup_field(rng, n=200)
    pilot = rng.choice(len(x), size=6, replace=False).astype(np.int32)
    zidx = np.asarray(lr.kcenter_indices(jnp.asarray(x, jnp.float32), 50))
    z = jnp.asarray(x[zidx], jnp.float32)
    single = lr.greedy_select_lowrank(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32), jnp.asarray(pilot), z,
        rounds=15, num_pilot=6,
    )
    ens = lr.greedy_select_lowrank(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32), jnp.asarray(pilot),
        jnp.stack([z, z, z]), rounds=15, num_pilot=6,
    )
    np.testing.assert_array_equal(
        np.array(ens.selected), np.array(single.selected)
    )


def test_greedy_ensemble_matches_f64_oracle(rng):
    """K = 2 DISTINCT k-center design variants through the flat ensemble
    loop vs the f64 ensemble oracle (averaged ratio scores): index-exact
    — the flat-greedy analogue of the fused step's ensemble mode."""
    spec, params, x, K, nv = setup_field(rng, n=220)
    rounds = 16
    pilot = rng.choice(len(x), size=5, replace=False).astype(np.int32)
    xj = jnp.asarray(x, jnp.float32)
    zidx = [
        np.asarray(lr.kcenter_indices(xj, 55, start=s))
        for s in (0, len(x) // 2)
    ]
    res = lr.greedy_select_lowrank(
        spec, params, xj, jnp.full((len(x),), nv, jnp.float32),
        jnp.asarray(pilot),
        jnp.stack([jnp.asarray(x[zi], jnp.float32) for zi in zidx]),
        rounds=rounds, num_pilot=5,
    )
    sel_ref = oracle.greedy_mi_selection_lowrank_ensemble(
        K, zidx, nv, rounds, pilot
    )
    np.testing.assert_array_equal(np.array(res.selected), sel_ref)
