"""SGPR (sparse variational GP) vs the f64 oracle and the exact model.

Fidelity ladder mirrors tests/test_lowrank.py:
  1. −ELBO matches a dense f64 Titsias reference;
  2. the bound property holds (−ELBO ≥ −MLL) with equality at Z = X;
  3. the sparse posterior matches the dense reference, and at Z = X the
     exact posterior;
  4. the multi-restart fit runs as one program and recovers the exact
     fit's objective at Z = X;
  5. identity-padding (`num_valid`) is exact.
"""

import numpy as np

import jax.numpy as jnp

from algp_tpu.config import FitConfig
from algp_tpu.models import gp as gp_mod
from algp_tpu.models import sparse_gp as sgp

import oracle

from test_acquisition import setup_field


def test_neg_elbo_matches_oracle(rng):
    spec, params, x, K, nv = setup_field(rng, n=180)
    y = rng.standard_normal(180)
    zidx = np.arange(0, 180, 3)
    ref, _, _ = oracle.sgpr_reference(K, zidx, y, nv)
    dev = float(sgp.neg_elbo(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32), jnp.asarray(x[zidx], jnp.float32),
    ))
    np.testing.assert_allclose(dev, ref, rtol=2e-4)


def test_bound_property_and_equality_at_full_z(rng):
    spec, params, x, K, nv = setup_field(rng, n=150)
    y = rng.standard_normal(150)
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    exact = float(gp_mod.neg_mll(spec, params, xj, yj))
    for step in (5, 2):
        lower = float(sgp.neg_elbo(spec, params, xj, yj, xj[::step]))
        assert lower >= exact - 5e-3  # −ELBO ≥ −MLL up to f32 slack
    full = float(sgp.neg_elbo(spec, params, xj, yj, xj))
    np.testing.assert_allclose(full, exact, rtol=2e-3)


def test_sparse_posterior_matches_oracle_and_exact(rng):
    spec, params, x, K, nv = setup_field(rng, n=160)
    y = rng.standard_normal(160)
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    zidx = np.arange(0, 160, 2)
    _, mean_ref, var_ref = oracle.sgpr_reference(K, zidx, y, nv)
    post = sgp.posterior_sparse(spec, params, xj, yj,
                                jnp.asarray(x[zidx], jnp.float32))
    mean, var = sgp.predict_sparse(spec, params, post, xj)
    np.testing.assert_allclose(np.array(mean), mean_ref, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.array(var), var_ref, rtol=3e-3, atol=3e-3)

    # Z = X: matches the EXACT posterior
    post_f = sgp.posterior_sparse(spec, params, xj, yj, xj)
    mean_f, var_f = sgp.predict_sparse(spec, params, post_f, xj)
    post_e = gp_mod.posterior(spec, params, xj, yj)
    mean_e, var_e = gp_mod.predict(spec, params, post_e, xj)
    np.testing.assert_allclose(np.array(mean_f), np.array(mean_e),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.array(var_f), np.array(var_e),
                               rtol=3e-3, atol=3e-3)


def test_fit_sparse_one_program_matches_exact_at_full_z(rng):
    spec, params, x, K, nv = setup_field(rng, n=120)
    # observations from the true field
    L = np.linalg.cholesky(K + 1e-8 * np.eye(120))
    y = L @ rng.standard_normal(120) + np.sqrt(nv) * rng.standard_normal(120)
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    cfg = FitConfig(iters=40, restarts=2)
    res_exact = gp_mod.fit(spec, cfg, xj, yj)
    res_full = sgp.fit_sparse(spec, cfg, xj, yj, xj)
    # same objective at Z = X ⇒ same optimum (tolerances: two f32 paths)
    np.testing.assert_allclose(float(res_full.nll), float(res_exact.nll),
                               rtol=5e-3)
    # subset Z still fits something sensible (finite, bounded below by MLL)
    res_sub = sgp.fit_sparse(spec, cfg, xj, yj, xj[::3])
    assert np.isfinite(float(res_sub.nll))
    assert float(res_sub.nll) >= float(res_exact.nll) - 0.5


def test_num_valid_padding_exact(rng):
    spec, params, x, K, nv = setup_field(rng, n=90)
    y = rng.standard_normal(90)
    z = jnp.asarray(x[::4], jnp.float32)
    full = float(sgp.neg_elbo(
        spec, params, jnp.asarray(x[:60], jnp.float32),
        jnp.asarray(y[:60], jnp.float32), z,
    ))
    xp = np.zeros((90, x.shape[1]), np.float32)
    xp[:60] = x[:60]
    yp = np.zeros(90, np.float32)
    yp[:60] = y[:60]
    padded = float(sgp.neg_elbo(
        spec, params, jnp.asarray(xp), jnp.asarray(yp), z,
        num_valid=jnp.asarray(60, jnp.int32),
    ))
    np.testing.assert_allclose(padded, full, rtol=1e-5)


def test_heteroscedastic_noise_scale(rng):
    spec, params, x, K, nv = setup_field(rng, n=100)
    y = rng.standard_normal(100)
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    z = xj[::2]
    scale = np.ones(100)
    scale[50:] = 25.0  # second half measured with a 5× noisier sensor
    ref, _, _ = oracle.sgpr_reference(K, np.arange(0, 100, 2), y, nv * scale)
    dev = float(sgp.neg_elbo(
        spec, params, xj, yj, z, jnp.asarray(scale, jnp.float32),
    ))
    np.testing.assert_allclose(dev, ref, rtol=2e-4)


def test_sparsegp_facade_end_to_end(rng):
    """SparseGP.fit/.predict on data from a known GP: the posterior mean
    tracks the latent field far better than the prior does."""
    n = 400
    x = rng.uniform(0, 12, (n, 2))
    K = oracle.gram(x, x, ls_spatial=2.0, outputscale=1.5)
    f = np.linalg.cholesky(K + 1e-8 * np.eye(n)) @ rng.standard_normal(n)
    y = f + 0.1 * rng.standard_normal(n)
    from algp_tpu.ops.kernels import KernelSpec

    model = sgp.SparseGP(KernelSpec("rbf", ds=2), num_inducing=80,
                         fit_config=FitConfig(iters=60, restarts=2))
    model.fit(x, y)
    mean, var = model.predict(x)
    rmse = float(np.sqrt(np.mean((np.array(mean) - f) ** 2)))
    prior_rmse = float(np.sqrt(np.mean(f**2)))
    assert rmse < 0.35 * prior_rmse
    assert np.isfinite(np.array(var)).all()


def test_fit_step_sparse_matches_eager(rng):
    """The episode-refit wrapper (in-program fold_in + in-program
    k-center z over the valid rows) ≡ fit_sparse with the same key and
    an eagerly computed design."""
    import jax

    from algp_tpu.acquisition_lowrank import kcenter_indices

    spec, params, x, K, nv = setup_field(rng, n=80)
    y = rng.standard_normal(80).astype(np.float32)
    cap, m = 96, 60
    xp = np.zeros((cap, x.shape[1]), np.float32)
    xp[:m] = x[:m]
    yp = np.zeros(cap, np.float32)
    yp[:m] = y[:m]
    cfg = FitConfig(iters=25, restarts=2, sparse_inducing=24)
    base = jax.random.PRNGKey(7)
    res_step = sgp.fit_step_sparse(
        spec, cfg, jnp.asarray(xp), jnp.asarray(yp), None, base, 3,
        num_valid=jnp.asarray(m, jnp.int32), num_inducing=24,
    )
    zidx = kcenter_indices(jnp.asarray(xp), 24, jnp.asarray(m, jnp.int32))
    z = jnp.asarray(xp)[zidx]
    res_ref = sgp.fit_sparse(
        spec, cfg, jnp.asarray(xp), jnp.asarray(yp), z,
        key=jax.random.fold_in(base, 3),
        num_valid=jnp.asarray(m, jnp.int32),
    )
    np.testing.assert_allclose(float(res_step.nll), float(res_ref.nll),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res_step.params.log_noise),
        np.asarray(res_ref.params.log_noise), rtol=1e-6,
    )


def test_episode_sparse_crossover(rng):
    """A long-budget episode crosses FitConfig.sparse_threshold
    mid-campaign: refits swap to the SGPR bound, the episode keeps
    planning sanely, and the final posterior is comparable to the
    all-exact episode's."""
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    fieldc = dataclasses.replace(base.field, num_rows=10, num_cols=14,
                                 seed=5)
    epc = dataclasses.replace(
        base.episode, num_pilot=12, budget=120.0, num_waypoints=12,
        samples_per_step=6, refit_every=2, seed=2,
    )
    fit_sparse_cfg = FitConfig(iters=30, restarts=2, sparse_threshold=40,
                               sparse_inducing=32)
    fit_exact_cfg = FitConfig(iters=30, restarts=2)
    cfg_s = dataclasses.replace(base, field=fieldc, episode=epc,
                                fit=fit_sparse_cfg)
    cfg_e = dataclasses.replace(base, field=fieldc, episode=epc,
                                fit=fit_exact_cfg)

    r_s = Agent(FieldEnv(fieldc, cfg_s.kernel), cfg_s).run(max_steps=10)
    r_e = Agent(FieldEnv(fieldc, cfg_e.kernel), cfg_e).run(max_steps=10)
    # the campaign actually crossed the threshold
    assert len(r_s.state.sampled_idx) > 40
    assert np.isfinite(r_s.rmse) and np.isfinite(r_s.mean).all()
    # sparse-refit campaign stays in the same quality band as exact
    assert r_s.rmse_test < max(2.0 * r_e.rmse_test, r_e.rmse_test + 0.15)


def test_episode_sparse_refit_with_lowrank_planner(rng):
    """SGPR refits and the LOW-RANK MI planner combined in one episode —
    the c5_1m_long configuration scaled down: refits cross
    sparse_threshold mid-campaign while planning flows through the FITC
    complement precision (num_inducing > 0), so the sparse-fit params
    feed the low-rank seed.  Sane quality, finite state, threshold
    actually crossed."""
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    fieldc = dataclasses.replace(base.field, num_rows=10, num_cols=14,
                                 seed=5)
    epc = dataclasses.replace(
        base.episode, num_pilot=12, budget=120.0, num_waypoints=12,
        samples_per_step=6, refit_every=2, seed=2,
    )
    cfg = dataclasses.replace(
        base, field=fieldc, episode=epc,
        fit=FitConfig(iters=30, restarts=2, sparse_threshold=40,
                      sparse_inducing=32, refit_iters=20, refit_restarts=1),
        acquisition=dataclasses.replace(base.acquisition, strategy="mi",
                                        num_inducing=48),
    )
    env = FieldEnv(fieldc, cfg.kernel)
    r = Agent(env, cfg).run(max_steps=10)
    assert len(r.state.sampled_idx) > 40  # crossed the sparse threshold
    assert np.isfinite(r.rmse) and np.isfinite(r.mean).all()
    assert np.isfinite(r.var).all() and (r.var >= 0).all()
    pilot_rmse = [h["rmse_test"] for h in r.history if "rmse_test" in h][0]
    assert r.rmse_test < pilot_rmse  # the campaign actually learned


def test_episode_sparse_threshold_validation():
    import dataclasses

    import pytest

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    bad = dataclasses.replace(
        base, fit=FitConfig(sparse_threshold=16, sparse_inducing=32)
    )
    with pytest.raises(ValueError, match="sparse_threshold"):
        Agent(FieldEnv(bad.field, bad.kernel), bad)

def test_fit_step_sparse_warm_never_worse_than_incumbent(rng):
    """Warm sparse refit: the incumbent seeds restart 0, so the −ELBO on
    the grown data (with the SAME in-program k-center design) can never
    exceed the incumbent's."""
    import jax

    from algp_tpu.acquisition_lowrank import kcenter_indices

    spec, params, x, K, nv = setup_field(rng, n=80)
    y = rng.standard_normal(80).astype(np.float32)
    cap = 96
    xp = np.zeros((cap, x.shape[1]), np.float32)
    xp[:80] = x
    yp = np.zeros(cap, np.float32)
    yp[:80] = y
    cfg = FitConfig(iters=40, restarts=2, sparse_inducing=24,
                    refit_iters=8, refit_restarts=2)
    base = jax.random.PRNGKey(11)
    # incumbent: full fit on the first 60 rows
    m0 = jnp.asarray(60, jnp.int32)
    inc = sgp.fit_step_sparse(
        spec, cfg, jnp.asarray(xp), jnp.asarray(yp * (np.arange(cap) < 60)),
        None, base, 0, num_valid=m0, num_inducing=24,
    )
    m1 = jnp.asarray(80, jnp.int32)
    warm = sgp.fit_step_sparse_warm(
        spec, cfg, jnp.asarray(xp), jnp.asarray(yp), None, base, 4,
        num_valid=m1, incumbent=inc.params, num_inducing=24,
    )
    zidx = kcenter_indices(jnp.asarray(xp), 24, m1)
    z = jnp.asarray(xp)[zidx]
    inc_elbo = float(sgp.neg_elbo(
        spec, inc.params, jnp.asarray(xp), jnp.asarray(yp), z,
        min_noise=cfg.min_noise, jitter=cfg.jitter, num_valid=m1,
    ))
    assert np.isfinite(float(warm.nll))
    assert float(warm.nll) <= inc_elbo + 1e-3
    assert warm.all_nlls.shape == (2,)
    assert np.array(warm.nll_trace).shape == (2, 8)


def test_kcenter_live_count_contract_enforced(rng):
    """VERDICT r3 #6: the k-center n_valid contract is code, not
    convention — an eager caller handing fewer live rows than inducing
    points gets a ValueError instead of a silently-duplicated design;
    traced counts still flow (the jit wrappers clamp statically)."""
    import jax
    import pytest

    from algp_tpu import acquisition_lowrank as acq_lr
    from algp_tpu.config import FitConfig
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    cfg = FitConfig(iters=5, restarts=1)
    cap = 32
    x = jnp.asarray(rng.uniform(0, 8, (cap, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(cap), jnp.float32)
    key = jax.random.PRNGKey(0)

    with pytest.raises(ValueError, match="k-center"):
        sgp.fit_step_sparse(
            spec, cfg, x, y, None, key, 0,
            num_valid=jnp.asarray(10, jnp.int32), num_inducing=24,
        )
    with pytest.raises(ValueError, match="k-center"):
        sgp.fit_step_sparse_warm(
            spec, cfg, x, y, None, key, 1,
            num_valid=np.int32(10),
            incumbent=spec.init_params(noise=0.1), num_inducing=24,
        )
    # a valid count passes through unchanged
    res = sgp.fit_step_sparse(
        spec, cfg, x, y, None, key, 0,
        num_valid=jnp.asarray(30, jnp.int32), num_inducing=24,
    )
    assert np.isfinite(float(res.nll))
    # traced counts are a no-op for the eager check (abstract value)
    acq_lr.check_kcenter_m(
        jax.ShapeDtypeStruct((), jnp.int32), 8, "probe"
    )  # not int()-able -> silently skipped


def test_sparse_fit_survives_duplicate_heavy_set(rng):
    """Graceful degradation when the sampled set holds FEWER DISTINCT
    points than the inducing count (heavily revisited campaigns): the
    maximin chain duplicates live rows — span-equivalent to the best
    available design (the distinct points) with the K_zz jitter keeping
    the factor PD.  The fit must stay finite and predict like a fit run
    with the distinct-point design (check_kcenter_m deliberately does
    NOT reject this regime)."""
    import jax

    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    cfg = FitConfig(iters=40, restarts=2)
    x10 = rng.uniform(0, 8, (10, 2)).astype(np.float32)  # 10 distinct
    rep = rng.integers(0, 10, 40)  # 40 samples revisiting them
    x = jnp.asarray(x10[rep])
    f = np.sin(x10[:, 0]) + 0.3 * x10[:, 1]
    y = jnp.asarray(f[rep] + 0.05 * rng.standard_normal(40), jnp.float32)
    key = jax.random.PRNGKey(3)

    res = sgp.fit_step_sparse(
        spec, cfg, x, y, None, key, 0,
        num_valid=jnp.asarray(40, jnp.int32), num_inducing=24,  # > 10
    )
    assert np.isfinite(float(res.nll))
    m = sgp.SparseGP(spec, num_inducing=24, fit_config=cfg)
    m.fit(x, y, key=key)  # k-center design over 10 distinct pts, m=24
    mean, var = m.predict(jnp.asarray(x10))
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(var)).all()
    # the duplicated design spans the same space as the distinct one:
    # predictions at the distinct points track the true function
    resid = np.asarray(mean) - f
    assert np.sqrt((resid**2).mean()) < 0.5 * np.std(f)
