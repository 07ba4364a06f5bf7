"""GP model tests: MLL value/gradient vs f64 oracle + finite differences,
posterior vs oracle, multi-restart fitting, Adam and L-BFGS (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algp_tpu.config import FitConfig
from algp_tpu.models import gp as gp_mod
from algp_tpu.ops.kernels import KernelParams, KernelSpec

import oracle


def sample_field(rng, n=120, ls=2.0, outputscale=1.5, noise=0.1, dim=2):
    x = rng.uniform(0, 10, (n, dim))
    K = oracle.gram(x, x, ls_spatial=ls, outputscale=outputscale, ds=dim)
    f = np.linalg.cholesky(K + 1e-10 * np.eye(n)) @ rng.standard_normal(n)
    y = f + noise * rng.standard_normal(n)
    return x, y, f


def make_params(spec, ls=1.5, os_=2.0, noise=0.2):
    return KernelParams(
        log_ls_spatial=jnp.full((spec.ds,), np.log(ls), jnp.float32),
        log_ls_feature=jnp.full((spec.df,), np.log(1.0), jnp.float32),
        log_outputscale=jnp.asarray(np.log(os_), jnp.float32),
        log_noise=jnp.asarray(np.log(noise), jnp.float32),
    )


def test_neg_mll_matches_oracle(rng):
    spec = KernelSpec("rbf", ds=2)
    x, y, _ = sample_field(rng, n=80)
    p = make_params(spec)
    dev = float(
        gp_mod.neg_mll(
            spec, p, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jitter=0.0,
        )
    )
    K = oracle.gram(x, x, ls_spatial=1.5, outputscale=2.0) + 0.04 * np.eye(80)
    ref = oracle.nll(K, y)
    assert dev == pytest.approx(ref, rel=1e-4)


def test_neg_mll_gradient_finite_difference(rng):
    spec = KernelSpec("matern52", ds=2)
    x, y, _ = sample_field(rng, n=60)
    x32, y32 = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    p = make_params(spec)

    f = lambda p: gp_mod.neg_mll(spec, p, x32, y32, jitter=0.0)
    g = jax.grad(f)(p)

    # central differences on each scalar leaf, f64 oracle for the values
    def oracle_nll(ls, os_, noise):
        K = oracle.gram(
            x, x, spatial_kind="matern52", ls_spatial=ls, outputscale=os_
        ) + noise**2 * np.eye(len(y))
        return oracle.nll(K, y)

    eps = 1e-4
    # d/d log_outputscale:  os = exp(t) ⇒ df/dt = df/dos · os
    t0 = float(p.log_outputscale)
    fd = (
        oracle_nll(1.5, np.exp(t0 + eps), 0.2)
        - oracle_nll(1.5, np.exp(t0 - eps), 0.2)
    ) / (2 * eps)
    assert float(g.log_outputscale) == pytest.approx(fd, rel=2e-2, abs=1e-2)
    t0 = float(p.log_noise)
    fd = (
        oracle_nll(1.5, 2.0, np.exp(t0 + eps))
        - oracle_nll(1.5, 2.0, np.exp(t0 - eps))
    ) / (2 * eps)
    assert float(g.log_noise) == pytest.approx(fd, rel=2e-2, abs=1e-2)
    t0 = np.log(1.5)
    fd = (
        oracle_nll(np.exp(t0 + eps), 2.0, 0.2)
        - oracle_nll(np.exp(t0 - eps), 2.0, 0.2)
    ) / (2 * eps)
    # ARD: total over both spatial dims
    assert float(g.log_ls_spatial.sum()) == pytest.approx(fd, rel=2e-2, abs=1e-2)


def test_predict_matches_oracle_posterior(rng):
    spec = KernelSpec("rbf", ds=2)
    x, y, _ = sample_field(rng, n=90)
    xt = rng.uniform(0, 10, (200, 2))
    p = make_params(spec, ls=1.5, os_=2.0, noise=0.2)
    post = gp_mod.posterior(
        spec, p, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jitter=0.0,
    )
    mean, var = gp_mod.predict(spec, p, post, jnp.asarray(xt, jnp.float32))
    K = oracle.gram(x, x, ls_spatial=1.5, outputscale=2.0) + 0.04 * np.eye(90)
    Kc = oracle.gram(x, xt, ls_spatial=1.5, outputscale=2.0)
    m_ref, v_ref = oracle.posterior(K, Kc, 2.0 * np.ones(200), y)
    np.testing.assert_allclose(np.array(mean), m_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.array(var), v_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("optimizer", ["adam", "lbfgs"])
def test_fit_improves_nll_and_recovers_scales(rng, optimizer):
    spec = KernelSpec("rbf", ds=2)
    x, y, _ = sample_field(rng, n=150, ls=2.0, outputscale=1.5, noise=0.1)
    cfg = FitConfig(optimizer=optimizer, iters=120, restarts=1,
                    learning_rate=0.08)
    res = gp_mod.fit(spec, cfg, jnp.asarray(x, jnp.float32),
                     jnp.asarray(y, jnp.float32))
    trace = np.array(res.nll_trace)[0]
    assert float(res.nll) < trace[0] - 1.0  # substantial improvement
    # fitted NLL should be at least as good as the truth's NLL
    K_true = oracle.gram(x, x, ls_spatial=2.0, outputscale=1.5) + 0.01 * np.eye(150)
    assert float(res.nll) < oracle.nll(K_true, y) + 2.0
    ls = np.exp(np.array(res.params.log_ls_spatial))
    assert np.all(ls > 0.5) and np.all(ls < 8.0)  # right ballpark
    noise = float(np.exp(res.params.log_noise))
    assert 0.02 < noise < 0.5


def test_multi_restart_picks_best(rng):
    spec = KernelSpec("matern32", ds=2)
    x, y, _ = sample_field(rng, n=100)
    cfg = FitConfig(restarts=4, iters=60, perturb=1.0)
    res = gp_mod.fit(spec, cfg, jnp.asarray(x, jnp.float32),
                     jnp.asarray(y, jnp.float32), key=jax.random.PRNGKey(3))
    nlls = np.array(res.all_nlls)
    assert nlls.shape == (4,)
    assert float(res.nll) == nlls.min()
    assert int(res.best_restart) == int(np.argmin(nlls))


def test_heteroscedastic_noise_changes_posterior(rng):
    spec = KernelSpec("rbf", ds=2)
    x, y, _ = sample_field(rng, n=60)
    p = make_params(spec)
    x32, y32 = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    # huge noise on half the samples → posterior variance increases there
    scale = jnp.ones(60).at[:30].set(100.0)
    post_hom = gp_mod.posterior(spec, p, x32, y32)
    post_het = gp_mod.posterior(spec, p, x32, y32, scale)
    xt = jnp.asarray(x[:30], jnp.float32)
    _, v_hom = gp_mod.predict(spec, p, post_hom, xt)
    _, v_het = gp_mod.predict(spec, p, post_het, xt)
    assert np.all(np.array(v_het) > np.array(v_hom))


def test_composite_kernel_fit_runs(rng):
    spec = KernelSpec("matern52", "rbf", ds=2, df=3)
    n = 80
    x = np.concatenate(
        [rng.uniform(0, 10, (n, 2)), rng.standard_normal((n, 3))], axis=1
    )
    y = rng.standard_normal(n)
    cfg = FitConfig(restarts=2, iters=40)
    res = gp_mod.fit(spec, cfg, jnp.asarray(x, jnp.float32),
                     jnp.asarray(y, jnp.float32))
    assert np.isfinite(float(res.nll))
    assert res.params.log_ls_feature.shape == (3,)


def test_fit_multi_traits_match_individual_fits(rng):
    """fit_multi's per-trait results must equal separate fit() calls."""
    spec = KernelSpec("rbf", ds=2)
    n, T = 70, 3
    x = jnp.asarray(rng.uniform(0, 10, (n, 2)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, T)), jnp.float32)
    cfg = FitConfig(iters=40, restarts=2)
    key = jax.random.PRNGKey(5)
    multi = gp_mod.fit_multi(spec, cfg, x, Y, key=key)
    assert np.asarray(multi.nll).shape == (T,)
    for t in range(T):
        single = gp_mod.fit(spec, cfg, x, Y[:, t], key=key)
        rt = gp_mod.trait_result(multi, t)
        np.testing.assert_allclose(
            float(rt.nll), float(single.nll), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(rt.params.log_ls_spatial),
            np.asarray(single.params.log_ls_spatial),
            rtol=1e-3, atol=1e-3,
        )


def test_exactgp_facade(rng):
    spec = KernelSpec("rbf", ds=2)
    x, y, f = sample_field(rng, n=200, noise=0.05)
    m = gp_mod.ExactGP(spec, FitConfig(iters=100, restarts=2))
    m.fit(x[:150], y[:150])
    mean, var = m.predict(x[150:])
    rmse = float(np.sqrt(np.mean((np.array(mean) - f[150:]) ** 2)))
    prior_rmse = float(np.sqrt(np.mean(f[150:] ** 2)))
    assert rmse < 0.7 * prior_rmse  # posterior beats the prior
    assert np.all(np.array(var) >= 0)


def test_posterior_extend_matches_refactorization(rng):
    """chol_append_row-based growth must match the full refactorized
    posterior (the between-refit episode path, SURVEY.md §2 C8)."""
    import jax

    from algp_tpu.config import FitConfig  # noqa: F401 (parity with module style)

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.2, noise=0.12)
    cap, m0, k_new = 24, 10, 4
    x_all = rng.uniform(0, 10, (m0 + k_new, 2)).astype(np.float32)
    y_all = rng.standard_normal(m0 + k_new).astype(np.float32)
    scale = np.ones(m0 + k_new, np.float32)
    scale[m0:] = 4.0  # heteroscedastic new samples
    x_pad = np.zeros((cap, 2), np.float32)
    y_pad = np.zeros(cap, np.float32)
    ns_pad = np.ones(cap, np.float32)
    x_pad[: m0 + k_new] = x_all
    y_pad[: m0 + k_new] = y_all
    ns_pad[: m0 + k_new] = scale
    min_noise, jitter = 1e-3, 1e-6

    post0 = gp_mod.posterior(
        spec, params, jnp.asarray(x_pad), jnp.asarray(y_pad * (np.arange(cap) < m0)),
        jnp.asarray(ns_pad), min_noise=min_noise, jitter=jitter,
        num_valid=jnp.asarray(m0, jnp.int32),
    )
    base = max(float(np.exp(2.0 * np.asarray(params.log_noise))), min_noise**2)
    new_nv = np.full(k_new + 2, 1.0, np.float32)
    new_nv[:k_new] = base * scale[m0:]
    post_inc = gp_mod.posterior_extend(
        spec, params, post0, jnp.asarray(x_pad), jnp.asarray(y_pad),
        jnp.asarray(new_nv), jnp.asarray(m0, jnp.int32),
        jnp.asarray(k_new, jnp.int32), jitter=jitter,
    )
    post_full = gp_mod.posterior(
        spec, params, jnp.asarray(x_pad), jnp.asarray(y_pad),
        jnp.asarray(ns_pad), min_noise=min_noise, jitter=jitter,
        num_valid=jnp.asarray(m0 + k_new, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(post_inc.L), np.asarray(post_full.L), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(post_inc.alpha), np.asarray(post_full.alpha),
        rtol=2e-3, atol=2e-4,
    )
    # and the prediction surfaces agree
    x_test = jnp.asarray(rng.uniform(0, 10, (50, 2)), jnp.float32)
    m1, v1 = gp_mod.predict(spec, params, post_inc, x_test)
    m2, v2 = gp_mod.predict(spec, params, post_full, x_test)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)

def test_refit_cfg_override_rule():
    cfg = FitConfig(iters=150, restarts=4)
    assert gp_mod.refit_cfg(cfg) is cfg  # disabled → identity
    cfg2 = gp_mod.refit_cfg(
        FitConfig(iters=150, restarts=4, refit_iters=30, refit_restarts=2)
    )
    assert cfg2.iters == 30 and cfg2.restarts == 2
    cfg3 = gp_mod.refit_cfg(FitConfig(iters=150, restarts=4, refit_iters=30))
    assert cfg3.iters == 30 and cfg3.restarts == 4


def test_fit_step_warm_never_worse_than_incumbent(rng):
    """Warm-refit contract: restart 0 IS the incumbent and best-ever
    tracking evaluates it before any update, so the refit NLL on the
    grown data can never exceed the incumbent's NLL there."""
    spec = KernelSpec("rbf", ds=2)
    x, y, _ = sample_field(rng, n=140)
    cfg = FitConfig(iters=80, restarts=2, refit_iters=12, refit_restarts=2)
    x0 = jnp.asarray(x[:100], jnp.float32)
    y0 = jnp.asarray(y[:100], jnp.float32)
    x1, y1 = jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
    full = gp_mod.fit(spec, cfg, x0, y0, key=jax.random.PRNGKey(0))
    warm = gp_mod.fit_step_warm(
        spec, cfg, x1, y1, None, jax.random.PRNGKey(7), 4, full.params
    )
    inc = float(
        gp_mod.neg_mll(spec, full.params, x1, y1,
                       min_noise=cfg.min_noise, jitter=cfg.jitter)
    )
    assert np.isfinite(float(warm.nll))
    assert float(warm.nll) <= inc + 1e-3
    # the shrunk refit schedule actually ran: 2 restarts × 12 iters
    assert warm.all_nlls.shape == (2,)
    assert np.array(warm.nll_trace).shape == (2, 12)
