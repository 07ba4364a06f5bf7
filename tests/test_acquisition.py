"""Acquisition tests: device greedy selection must match the f64 oracle
index-for-index (the BASELINE.json:5 fidelity contract), plus property
tests (monotone variance reduction, padding invariance) — SURVEY.md §4."""

import numpy as np
import pytest

import jax.numpy as jnp

from algp_tpu import acquisition as acq
from algp_tpu.ops.kernels import KernelParams, KernelSpec

import oracle


def setup_field(rng, n=300, ls=2.0, os_=1.5, noise=0.15, dim=2):
    x = rng.uniform(0, 12, (n, dim))
    spec = KernelSpec("rbf", ds=dim)
    params = KernelParams(
        log_ls_spatial=jnp.full((dim,), np.log(ls), jnp.float32),
        log_ls_feature=jnp.zeros((0,), jnp.float32),
        log_outputscale=jnp.asarray(np.log(os_), jnp.float32),
        log_noise=jnp.asarray(np.log(noise), jnp.float32),
    )
    K = oracle.gram(x, x, ls_spatial=ls, outputscale=os_, ds=dim)
    return spec, params, x, K, noise**2


@pytest.mark.parametrize("num_pilot", [0, 5])
def test_entropy_selection_matches_oracle(rng, num_pilot):
    spec, params, x, K, nv = setup_field(rng)
    rounds = 25
    pilot = rng.choice(len(x), size=num_pilot, replace=False).astype(np.int32)
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32),
        jnp.asarray(pilot), rounds=rounds, num_pilot=num_pilot,
        strategy="entropy",
    )
    sel_ref, d_ref = oracle.greedy_variance_selection(K, nv, rounds, pilot)
    np.testing.assert_array_equal(np.array(res.selected), sel_ref)
    np.testing.assert_allclose(np.array(res.post_var), d_ref, atol=2e-3)


@pytest.mark.parametrize("num_pilot", [0, 5])
def test_mi_selection_matches_oracle(rng, num_pilot):
    spec, params, x, K, nv = setup_field(rng, n=250)
    rounds = 20
    pilot = rng.choice(len(x), size=num_pilot, replace=False).astype(np.int32)
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32),
        jnp.asarray(pilot), rounds=rounds, num_pilot=num_pilot,
        strategy="mi", return_scores=True,
    )
    sel_ref, traces = oracle.greedy_mi_selection(K, nv, rounds, pilot)
    sel_dev = np.array(res.selected)
    # scores must agree numerically round-by-round …
    dev_scores = np.array(res.scores)
    for r in range(rounds):
        finite = np.isfinite(traces[r])
        np.testing.assert_allclose(
            dev_scores[r][finite], traces[r][finite], rtol=5e-3, atol=5e-3
        )
    # … and the selected index sequence must match exactly
    np.testing.assert_array_equal(sel_dev, sel_ref)


def test_heteroscedastic_mi_prefers_low_noise_region(rng):
    # two copies of the same grid; one with 100x noisier sensing —
    # MI-greedy should overwhelmingly sample the precise half
    spec, params, x, K, nv = setup_field(rng, n=200)
    nvec = np.full(200, nv)
    nvec[:100] *= 100.0
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.asarray(nvec, jnp.float32),
        jnp.zeros((0,), jnp.int32), rounds=20, num_pilot=0, strategy="mi",
    )
    sel_ref, _ = oracle.greedy_mi_selection(K, nvec, 20)
    np.testing.assert_array_equal(np.array(res.selected), sel_ref)


def test_variance_monotonically_decreases(rng):
    spec, params, x, K, nv = setup_field(rng, n=150)
    prior_var = 1.5
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((150,), nv, jnp.float32),
        jnp.zeros((0,), jnp.int32), rounds=30, num_pilot=0, strategy="entropy",
    )
    pv = np.array(res.post_var)
    assert np.all(pv <= prior_var + 1e-5)
    assert np.all(pv >= -1e-4)
    # selected points' own posterior variance should be strongly reduced
    assert pv[np.array(res.selected)].max() < 0.5 * prior_var


def test_greedy_marginal_gains_nonincreasing(rng):
    """Submodularity spot-check (SURVEY.md §4 item 3): the greedy-chosen
    entropy score is non-increasing round over round (diminishing
    returns of conditioning), and the MI trace shows the same trend."""
    spec, params, x, K, nv = setup_field(rng, n=200)
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((200,), nv, jnp.float32),
        jnp.zeros((0,), jnp.int32), rounds=25, num_pilot=0,
        strategy="entropy", return_scores=True,
    )
    best = np.array(res.scores).max(axis=1)
    assert np.all(np.diff(best) <= 1e-5)
    res_mi = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((200,), nv, jnp.float32),
        jnp.zeros((0,), jnp.int32), rounds=25, num_pilot=0,
        strategy="mi", return_scores=True,
    )
    best_mi = np.array(res_mi.scores).max(axis=1)
    # MI ratio gains trend down; allow small non-monotonic wiggle
    assert best_mi[-1] < best_mi[0]
    assert np.all(np.diff(best_mi) <= 0.05 * best_mi[0])


def test_selection_has_no_duplicates(rng):
    spec, params, x, K, nv = setup_field(rng, n=120)
    pilot = np.array([3, 77], np.int32)
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((120,), nv, jnp.float32),
        jnp.asarray(pilot), rounds=40, num_pilot=2, strategy="entropy",
    )
    sel = np.array(res.selected)
    assert len(np.unique(sel)) == 40
    assert not np.isin(sel, pilot).any()


def test_matern_composite_selection_runs(rng):
    n = 150
    x = np.concatenate(
        [rng.uniform(0, 12, (n, 2)), rng.standard_normal((n, 2))], axis=1
    )
    spec = KernelSpec("matern32", "rbf", ds=2, df=2)
    params = KernelParams(
        log_ls_spatial=jnp.full((2,), np.log(2.0), jnp.float32),
        log_ls_feature=jnp.full((2,), np.log(1.0), jnp.float32),
        log_outputscale=jnp.asarray(0.0, jnp.float32),
        log_noise=jnp.asarray(np.log(0.1), jnp.float32),
    )
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((n,), 0.01, jnp.float32),
        jnp.zeros((0,), jnp.int32), rounds=10, num_pilot=0, strategy="mi",
    )
    sel = np.array(res.selected)
    assert len(np.unique(sel)) == 10


def test_score_candidate_sets_entropy_matches_dense(rng):
    spec, params, x, K, nv = setup_field(rng, n=100)
    x32 = jnp.asarray(x, jnp.float32)
    nvec = jnp.full((100,), nv, jnp.float32)
    # condition on a few pilots first
    pilot = np.array([4, 50, 80], np.int32)
    res = acq.greedy_select(
        spec, params, x32, nvec, jnp.asarray(pilot),
        rounds=1, num_pilot=3, strategy="entropy",
    )
    # build basis WITHOUT the greedy round for clean comparison
    B = np.array(res.basis)[:3]
    # oracle posterior covariance given pilots
    C = K.copy()
    for j in pilot:
        c = C[:, j] / np.sqrt(C[j, j] + nv)
        C -= np.outer(c, c)
    sets = np.array([[10, 20, 30, 0], [60, 61, 62, 63]], np.int32)
    sizes = np.array([3, 4], np.int32)
    basis_pad = np.zeros((4, 100), np.float32)
    basis_pad[:3] = B
    scores = np.array(
        acq.score_candidate_sets(
            spec, params, x32, nvec,
            jnp.asarray(basis_pad),
            jnp.asarray(sets), jnp.asarray(sizes), strategy="entropy",
        )
    )
    for si, (s, k) in enumerate(zip(sets, sizes)):
        idx = s[:k]
        M = C[np.ix_(idx, idx)] + nv * np.eye(k)
        # information gain: joint measurement entropy minus the noise floor
        ref = 0.5 * (np.linalg.slogdet(M)[1] - k * np.log(nv))
        assert ref >= 0
        assert scores[si] * 1.0 == pytest.approx(ref, rel=1e-2, abs=1e-2), si


def test_score_candidate_sets_mi_matches_dense(rng):
    """MI set scores: dense-P reference path AND the production implicit
    path (WᵀW − F·ZTᵀ with coalesced row gathers) vs the f64 reference."""
    spec, params, x, K, nv = setup_field(rng, n=80)
    x32 = jnp.asarray(x, jnp.float32)
    nvec = jnp.full((80,), nv, jnp.float32)
    P = acq.complement_precision(spec, params, x32, nvec)
    W, WT = acq.implicit_complement_precision(spec, params, x32, nvec)
    F, ZT = acq.implicit_corrections(
        W, WT, jnp.zeros((8,), jnp.int32), jnp.asarray(0, jnp.int32)
    )
    basis = jnp.zeros((4, 80), jnp.float32)
    sets = np.array([[5, 6, 7], [40, 50, 60]], np.int32)
    sizes = np.array([3, 3], np.int32)
    taken = jnp.zeros((80,), bool)
    common = (spec, params, x32, nvec, basis,
              jnp.asarray(sets), jnp.asarray(sizes))
    scores = np.array(
        acq.score_candidate_sets(*common, P=P, strategy="mi")
    )
    scores_imp = np.array(
        acq.score_candidate_sets(
            *common, P_implicit=(WT, F, ZT, taken), strategy="mi"
        )
    )
    Kn = K + nv * np.eye(80)
    P_ref = np.linalg.inv(Kn)
    for si, s in enumerate(sets):
        M1 = Kn[np.ix_(s, s)]
        h1 = 0.5 * np.linalg.slogdet(M1)[1]
        h2 = 0.5 * np.linalg.slogdet(P_ref[np.ix_(s, s)])[1]
        assert scores[si] == pytest.approx(h1 + h2, rel=1e-2, abs=1e-2)
        assert scores_imp[si] == pytest.approx(h1 + h2, rel=1e-2, abs=1e-2)


def test_score_sets_within_set_duplicate_is_inert(rng):
    """A path that re-enters an unsampled cell puts the SAME candidate in
    a set twice (reachable on narrow grids once the budget slice covers a
    row round-trip).  The duplicate's two identical precision rows make
    the per-set MI block exactly singular — before the dedup mask its f32
    Cholesky returned NaN, which then WON path_set_argmax.  Contract: the
    duplicate slot is inert, so the set scores exactly as its dedup'd
    version, for every precision representation and for entropy."""
    spec, params, x, K, nv = setup_field(rng, n=80)
    x32 = jnp.asarray(x, jnp.float32)
    nvec = jnp.full((80,), nv, jnp.float32)
    P = acq.complement_precision(spec, params, x32, nvec)
    W, WT = acq.implicit_complement_precision(spec, params, x32, nvec)
    F, ZT = acq.implicit_corrections(
        W, WT, jnp.zeros((8,), jnp.int32), jnp.asarray(0, jnp.int32)
    )
    taken = jnp.zeros((80,), bool)
    from algp_tpu import acquisition_lowrank as lr

    seed = lr.lowrank_precision_seed(
        spec, params, x32, nvec, jnp.asarray(x[np.arange(0, 80, 2)],
                                             jnp.float32)
    )
    Flr, ZTlr = lr.lowrank_corrections(
        seed, jnp.zeros((8,), jnp.int32), jnp.asarray(0, jnp.int32)
    )
    basis = jnp.zeros((4, 80), jnp.float32)
    # row 0: duplicate (17 twice); row 1: its dedup'd version
    sets = jnp.asarray([[17, 30, 17, 55], [17, 30, 55, 0]], jnp.int32)
    sizes = jnp.asarray([4, 3], jnp.int32)
    variants = {
        "dense": dict(P=P, strategy="mi"),
        "implicit": dict(P_implicit=(WT, F, ZT, taken), strategy="mi"),
        "lowrank": dict(P_lowrank=(seed.VT, seed.dinv, Flr, ZTlr, taken),
                        strategy="mi"),
        "entropy": dict(strategy="entropy"),
    }
    for name, kw in variants.items():
        s = np.asarray(acq.score_candidate_sets(
            spec, params, x32, nvec, basis, sets, sizes, **kw))
        assert np.isfinite(s).all(), (name, s)
        assert s[0] == s[1], (name, s)
        assert s[0] > 0, (name, s)


def test_implicit_corrections_match_complement_inverse(rng):
    """F/ZT corrections restricted off the deleted set must equal the f64
    inverse of the complement covariance (duplicates are exact no-ops)."""
    spec, params, x, K, nv = setup_field(rng, n=60)
    nvec = jnp.full((60,), nv, jnp.float32)
    W, WT = acq.implicit_complement_precision(
        spec, params, jnp.asarray(x, jnp.float32), nvec
    )
    idx = jnp.asarray([3, 10, 3, 44, 0, 0], jnp.int32)  # dup + padding
    F, ZT = acq.implicit_corrections(W, WT, idx, jnp.asarray(4, jnp.int32))
    P_imp = np.asarray(W).T @ np.asarray(W) - np.asarray(F) @ np.asarray(ZT).T
    keep = [i for i in range(60) if i not in (3, 10, 44)]
    Kn = K + nv * np.eye(60)
    P_ref = np.linalg.inv(Kn[np.ix_(keep, keep)])
    np.testing.assert_allclose(
        P_imp[np.ix_(keep, keep)], P_ref, rtol=2e-2, atol=2e-3
    )


def test_implicit_corrections_no_drift_long_horizon(rng):
    """The episode's precision-drift contract: after deleting HALF the
    field (200 of 400 points — far beyond any episode's delete count) the
    implicit precision must still match the f64 complement inverse to f32
    accuracy, because corrections are rebuilt from the seed inverse in one
    batched op rather than chained per-delete (VERDICT r1 missing #5)."""
    spec, params, x, K, nv = setup_field(rng, n=400)
    nvec = jnp.full((400,), nv, jnp.float32)
    W, WT = acq.implicit_complement_precision(
        spec, params, jnp.asarray(x, jnp.float32), nvec
    )
    deleted = rng.choice(400, 200, replace=False).astype(np.int32)
    idx = jnp.asarray(np.concatenate([deleted, np.zeros(56, np.int32)]))
    F, ZT = acq.implicit_corrections(W, WT, idx, jnp.asarray(200, jnp.int32))
    P_imp = np.asarray(W).T @ np.asarray(W) - np.asarray(F) @ np.asarray(ZT).T
    keep = np.setdiff1d(np.arange(400), deleted)
    Kn = K + nv * np.eye(400)
    P_ref = np.linalg.inv(Kn[np.ix_(keep, keep)])
    err = np.abs(P_imp[np.ix_(keep, keep)] - P_ref)
    scale = np.abs(P_ref).max()
    assert err.max() / scale < 5e-4, err.max() / scale


def test_mi_duplicate_pilot_indices_stay_finite(rng):
    """A node measured twice (duplicate pilot index with different noise
    scales, as the mixed-modality episode produces) must not NaN-poison
    the MI path: the batched pilot delete dedupes exactly (the second
    delete of an index is a no-op in the sequential Schur scheme)."""
    spec, params, x, K, nv = setup_field(rng, n=200)
    pilot = np.array([3, 50, 50, 120], np.int32)  # 50 sampled twice
    pilot_nv = jnp.asarray([nv, nv, 25 * nv, nv], jnp.float32)
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32),
        jnp.asarray(pilot), rounds=10, num_pilot=4,
        strategy="mi", pilot_nv=pilot_nv, return_scores=True,
    )
    sel = np.array(res.selected)
    assert np.isfinite(np.array(res.post_var)).all()
    # scores of untaken candidates are finite every round
    scores = np.array(res.scores)
    assert np.isfinite(scores[scores > -np.inf]).all()
    assert len(np.unique(sel)) == 10
    assert not np.isin(sel, pilot).any()


def test_score_sets_implicit_matches_dense_after_deletes(rng):
    """Implicit MI set scoring must reproduce the dense path exactly when
    the complement has deletions AND a set revisits a deleted node (the
    dense path's inert diag-1 marker semantics)."""
    spec, params, x, K, nv = setup_field(rng, n=80)
    x32 = jnp.asarray(x, jnp.float32)
    nvec = jnp.full((80,), nv, jnp.float32)
    deleted = np.array([6, 41, 70], np.int32)
    # dense reference: seed + sequential Schur deletes (f64)
    Kn = K + nv * np.eye(80)
    Pd = np.linalg.inv(Kn)
    for j in deleted:
        Pd = Pd - np.outer(Pd[:, j], Pd[j, :]) / Pd[j, j]
        Pd[j, :] = 0.0
        Pd[:, j] = 0.0
        Pd[j, j] = 1.0
    W, WT = acq.implicit_complement_precision(spec, params, x32, nvec)
    F, ZT = acq.implicit_corrections(
        W, WT, jnp.asarray(np.concatenate([deleted, [0]])),
        jnp.asarray(3, jnp.int32),
    )
    taken = jnp.zeros((80,), bool).at[jnp.asarray(deleted)].set(True)
    basis = jnp.zeros((4, 80), jnp.float32)
    sets = np.array([[5, 6, 7], [40, 41, 60], [10, 20, 30]], np.int32)
    sizes = np.array([3, 3, 2], np.int32)  # sets 0/1 contain deleted nodes
    scores_imp = np.array(
        acq.score_candidate_sets(
            spec, params, x32, nvec, basis,
            jnp.asarray(sets), jnp.asarray(sizes),
            P_implicit=(WT, F, ZT, taken), strategy="mi",
        )
    )
    scores_dense = np.array(
        acq.score_candidate_sets(
            spec, params, x32, nvec, basis,
            jnp.asarray(sets), jnp.asarray(sizes),
            P=jnp.asarray(Pd, jnp.float32), strategy="mi",
        )
    )
    np.testing.assert_allclose(scores_imp, scores_dense, rtol=1e-3, atol=1e-4)
    assert np.isfinite(scores_imp).all()


def test_plan_path_step_matches_unfused_pipeline(rng):
    """The fused replan program must reproduce the separate
    conditioning → corrections → scoring → host-argmax pipeline."""
    spec, params, x, K, nv = setup_field(rng, n=120)
    x32 = jnp.asarray(x, jnp.float32)
    nvec = jnp.full((120,), nv, jnp.float32)
    cap = 16
    sampled = np.array([3, 40, 77, 90], np.int32)
    idx_pad = np.zeros(cap, np.int32)
    idx_pad[: len(sampled)] = sampled
    pnv = np.full(cap, 1.0, np.float32)
    pnv[: len(sampled)] = nv
    sets = rng.integers(0, 120, (12, 4)).astype(np.int32)
    sizes = np.full(12, 4, np.int32)
    sizes[-1] = 0  # a padded slot
    costs = rng.uniform(2, 9, 12).astype(np.float32)

    W, WT = acq.implicit_complement_precision(spec, params, x32, nvec)
    for strategy in ("entropy", "mi"):
        best, d, scores = acq.plan_path_step(
            spec, params, x32, nvec,
            jnp.asarray(idx_pad), jnp.asarray(4, jnp.int32),
            jnp.asarray(pnv), jnp.asarray(sets), jnp.asarray(sizes),
            jnp.asarray(costs),
            W if strategy == "mi" else None,
            WT if strategy == "mi" else None,
            strategy=strategy,
        )
        # unfused reference
        res = acq.greedy_select(
            spec, params, x32, nvec, jnp.asarray(idx_pad),
            rounds=0, num_pilot=cap, strategy="entropy",
            pilot_count=jnp.asarray(4, jnp.int32), pilot_nv=jnp.asarray(pnv),
        )
        Pimp = None
        if strategy == "mi":
            F, ZT = acq.implicit_corrections(
                W, WT, jnp.asarray(idx_pad), jnp.asarray(4, jnp.int32)
            )
            taken = jnp.zeros((120,), bool).at[jnp.asarray(sampled)].set(True)
            Pimp = (WT, F, ZT, taken)
        scores_ref = np.asarray(acq.score_candidate_sets(
            spec, params, x32, nvec, res.basis,
            jnp.asarray(sets), jnp.asarray(sizes),
            P_implicit=Pimp, strategy=strategy,
        ))
        util = np.maximum(scores_ref.astype(np.float32), 0.0) / (costs + 1e-6)
        util[sizes == 0] = -np.inf
        assert int(best) == int(np.argmax(util)), strategy
        np.testing.assert_allclose(np.asarray(scores), scores_ref,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d), np.asarray(res.post_var),
                                   rtol=1e-5, atol=1e-5)


def test_fit_and_select_matches_split_pipeline(rng):
    """The fused public episode entry (bench.py's workload) must select
    exactly what the split fit → greedy_select pipeline selects."""
    import jax

    from algp_tpu.config import FitConfig
    from algp_tpu.models import gp as gp_mod

    spec = KernelSpec("rbf", ds=2)
    cfg = FitConfig(iters=40, restarts=2)
    x_all = jnp.asarray(rng.uniform(0, 12, (200, 2)), jnp.float32)
    pilot = jnp.asarray(np.linspace(0, 199, 12).round(), jnp.int32)
    y_tr = jnp.asarray(rng.standard_normal(12), jnp.float32)
    x_tr = x_all[pilot]
    key = jax.random.PRNGKey(3)

    fit_res, sel = acq.fit_and_select(
        spec, cfg, x_tr, y_tr, x_all, pilot,
        rounds=10, num_pilot=12, strategy="mi", key=key,
    )
    ref_fit = gp_mod.fit(spec, cfg, x_tr, y_tr, key=key)
    np.testing.assert_allclose(
        float(fit_res.nll), float(ref_fit.nll), rtol=1e-6
    )
    nv_base = float(np.maximum(
        np.exp(2 * np.asarray(ref_fit.params.log_noise)), cfg.min_noise**2
    ))
    ref_sel = acq.greedy_select(
        spec, ref_fit.params, x_all,
        jnp.full((200,), nv_base, jnp.float32), pilot,
        rounds=10, num_pilot=12, strategy="mi",
    )
    np.testing.assert_array_equal(
        np.asarray(sel.selected), np.asarray(ref_sel.selected)
    )
    assert sel.post_var.shape == (200,)


def test_path_set_argmax_per_cost_matches_legacy_formula(rng):
    """path_utility="per_cost" must be bit-identical to the pre-round-4
    inline rule (max(score,0)/(cost+1e-6), invalid -> -inf, argmax)."""
    for _ in range(20):
        scores = jnp.asarray(rng.standard_normal(16), jnp.float32)
        sizes = jnp.asarray(rng.integers(0, 6, 16), jnp.int32)
        costs = jnp.asarray(rng.uniform(1, 9, 16), jnp.float32)
        util = jnp.maximum(scores, 0.0) / (costs + 1e-6)
        util = jnp.where(sizes > 0, util, -jnp.inf)
        legacy = int(jnp.argmax(util))
        got = int(acq.path_set_argmax(scores, sizes, costs,
                                      path_utility="per_cost"))
        assert got == legacy


def test_path_set_argmax_per_sample_gates_on_sample_price():
    """The yield-aware rule: a long path at ~2x the cost-per-sample is
    INELIGIBLE however well it scores; among near-best-price paths the
    highest information per sample wins (VERDICT r3 #2)."""
    # A: long/expensive, best raw score AND best score-per-cost;
    # B, C: short/cheap (same yield, ~half the price); C scores best
    # per sample among the cheap ones.
    scores = jnp.asarray([15.0, 6.0, 7.0], jnp.float32)
    sizes = jnp.asarray([5, 5, 5], jnp.int32)
    costs = jnp.asarray([10.0, 5.0, 5.5], jnp.float32)
    assert int(acq.path_set_argmax(scores, sizes, costs,
                                   path_utility="per_cost")) == 0
    assert int(acq.path_set_argmax(scores, sizes, costs,
                                   path_utility="per_sample")) == 2
    # sub-yield stubs pay their true sample price: a 1-sample stub at
    # cost 2 (price 2.0) does not gate out full-yield paths at price 1
    scores2 = jnp.asarray([3.0, 6.0], jnp.float32)
    sizes2 = jnp.asarray([1, 5], jnp.int32)
    costs2 = jnp.asarray([2.0, 5.0], jnp.float32)
    assert int(acq.path_set_argmax(scores2, sizes2, costs2,
                                   path_utility="per_sample")) == 1
    # padded (size-0) slots are never chosen in either mode
    scores3 = jnp.asarray([99.0, 1.0], jnp.float32)
    sizes3 = jnp.asarray([0, 3], jnp.int32)
    costs3 = jnp.asarray([1.0, 5.0], jnp.float32)
    for mode in ("per_cost", "per_sample"):
        assert int(acq.path_set_argmax(scores3, sizes3, costs3,
                                       path_utility=mode)) == 1
    # deterministic min-index tie-break survives in per_sample mode
    scores4 = jnp.asarray([4.0, 4.0], jnp.float32)
    sizes4 = jnp.asarray([4, 4], jnp.int32)
    costs4 = jnp.asarray([4.0, 4.0], jnp.float32)
    assert int(acq.path_set_argmax(scores4, sizes4, costs4,
                                   path_utility="per_sample")) == 0
    import pytest

    with pytest.raises(ValueError):
        acq.path_set_argmax(scores4, sizes4, costs4, path_utility="bogus")


def test_cond_solve_gate_uses_unpadded_count(monkeypatch):
    """The solve-family gate (acquisition.cond_solve) must key on the
    UNPADDED candidate count: greedy_select pads the candidate axis to a
    256-multiple, and gating on the padded length would flip the
    arithmetic family for the padded consumers of an episode whose true
    count sits just below the threshold (the window where single-chip
    fused steps — which see unpadded x — disagree with everything
    padded).  With the threshold set INSIDE the window (n_valid=150 <
    200 ≤ padded 256) the matmul family must NOT engage; nudged below
    the true count it must."""
    import jax

    from algp_tpu.ops import linalg as la_mod

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 12, (150, 2))
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=3.0, outputscale=1.0, noise=0.15)
    pilot = np.linspace(0, 149, 6).round().astype(np.int32)
    calls = []
    orig = la_mod.solve_triangular_matmul
    monkeypatch.setattr(
        la_mod, "solve_triangular_matmul",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
    )

    def run():
        return acq.greedy_select(
            spec, params, jnp.asarray(x, jnp.float32),
            jnp.full((150,), 0.15**2, jnp.float32),
            jnp.asarray(pilot), rounds=5, num_pilot=6, strategy="mi",
        )

    try:
        monkeypatch.setattr(acq, "COND_MATMUL_N", 200)  # inside the window
        jax.clear_caches()
        res_window = run()
        assert not calls, (
            "gate engaged on the PADDED length (256) though the true "
            "candidate count (150) sits below the threshold"
        )
        monkeypatch.setattr(acq, "COND_MATMUL_N", 100)  # below the count
        jax.clear_caches()
        res_gated = run()
        assert calls, "gate must engage once the true count crosses it"
        np.testing.assert_array_equal(
            np.asarray(res_window.selected), np.asarray(res_gated.selected)
        )
    finally:
        jax.clear_caches()


def test_conditioning_matmul_gate_preserves_selections(monkeypatch):
    """Forcing the ≥1M conditioning fast path (COND_MATMUL_N = 1, i.e.
    tri_inv matmul instead of the XLA trisolve in
    _batch_pilot_condition) must leave 30-round greedy sequences equal
    to the f64 oracle on the jittered grid — the gate may move the
    arithmetic but not a selection."""
    import jax

    rng = np.random.default_rng(17)
    rows, cols = 10, 15
    r, c = np.divmod(np.arange(rows * cols), cols)
    x = np.stack([c + 0.1 * rng.standard_normal(rows * cols),
                  r + 0.1 * rng.standard_normal(rows * cols)], 1)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=3.0, outputscale=1.0, noise=0.15)
    pilot = np.linspace(0, len(x) - 1, 8).round().astype(np.int32)
    nv = 0.15**2
    K = oracle.gram(x, x, ls_spatial=3.0, outputscale=1.0)

    monkeypatch.setattr(acq, "COND_MATMUL_N", 1)
    jax.clear_caches()  # drop executables traced with the default gate
    try:
        for strategy in ("entropy", "mi"):
            res = acq.greedy_select(
                spec, params, jnp.asarray(x, jnp.float32),
                jnp.full((len(x),), nv, jnp.float32),
                jnp.asarray(pilot), rounds=30, num_pilot=8,
                strategy=strategy,
            )
            if strategy == "entropy":
                sel_ref, _ = oracle.greedy_variance_selection(K, nv, 30, pilot)
            else:
                sel_ref, _ = oracle.greedy_mi_selection(K, nv, 30, pilot)
            np.testing.assert_array_equal(np.asarray(res.selected), sel_ref)
    finally:
        jax.clear_caches()  # don't leak gate-on executables to other tests


def test_selection_fuzz_matches_oracle():
    """Randomized fidelity sweep (the enumerator fuzz's analog for the
    selection contract): device greedy selections — entropy AND mi —
    must equal the f64 oracle index-for-index across random kernel
    kinds, lengthscales, output scales, noise levels, feature dims,
    pilot sets and candidate counts.  Random (jittered) point sets with
    structured kernels are tie-free, so exact index equality is
    well-posed (feature columns are drawn WITHIN a lengthscale of each
    other — spread features collapse the product kernel to ~diagonal,
    the all-ties regime where, like the symmetric grid, index equality
    is ill-posed); the fixed-case oracle tests above pin known
    geometries.  Every draw additionally asserts per-round
    ε-optimality under the f64 oracle (the symmetric-field criterion)
    as the score-level backstop."""
    rng = np.random.default_rng(20260819)
    for draw in range(8):
        n = int(rng.integers(60, 140))
        df = int(rng.choice([0, 2]))
        spatial = str(rng.choice(["rbf", "matern32", "matern52"]))
        ls = float(rng.uniform(1.5, 4.0))
        lsf = float(rng.uniform(0.8, 2.0))
        os_ = float(rng.uniform(0.5, 2.0))
        noise = float(rng.uniform(0.05, 0.4))
        rounds = int(rng.integers(8, 20))
        npil = int(rng.integers(0, 7))
        x = rng.uniform(0, 12, (n, 2 + df))
        if df:
            x[:, 2:] = rng.uniform(0, lsf, (n, df))
        spec = (KernelSpec(spatial, "rbf", ds=2, df=2) if df
                else KernelSpec(spatial, ds=2))
        params = spec.init_params(ls_spatial=ls, ls_feature=lsf,
                                  outputscale=os_, noise=noise)
        K = oracle.gram(x, x, spatial_kind=spatial, ls_spatial=ls,
                        ls_feature=lsf, outputscale=os_, ds=2)
        nv = noise ** 2
        pilot = rng.choice(n, size=npil, replace=False).astype(np.int32)
        for strategy in ("entropy", "mi"):
            res = acq.greedy_select(
                spec, params, jnp.asarray(x, jnp.float32),
                jnp.full((n,), nv, jnp.float32),
                jnp.asarray(pilot), rounds=rounds, num_pilot=npil,
                strategy=strategy,
            )
            if strategy == "entropy":
                ref, _ = oracle.greedy_variance_selection(K, nv, rounds,
                                                          pilot)
            else:
                ref, _ = oracle.greedy_mi_selection(K, nv, rounds, pilot)
            case = (draw, strategy, spatial, df, n, ls, noise, npil)
            np.testing.assert_array_equal(
                np.asarray(res.selected), ref, err_msg=str(case)
            )
            # score-level backstop: every device pick is ε-optimal
            # under the f64 oracle round-by-round
            pairs = oracle.follow_selection(
                K, nv, np.asarray(res.selected), pilot, strategy=strategy
            )
            for r, (chosen, best) in enumerate(pairs):
                assert chosen >= best - 1e-4 * abs(best), (case, r)
