"""Coregionalized multi-trait GP (models/coregional) vs the f64 oracle.

Contract: the device ICM's identity-padded joint likelihood and per-trait
posterior equal the oracle's dense sub-problem over observed (plot, trait)
cells (tests/oracle.icm_nll / icm_posterior); with T = 1 and B = [[s²]] the
ICM reduces exactly to the exact GP; and on correlated traits with a
sparsely-observed secondary trait, the fitted ICM transfers information the
independent per-trait fit cannot (the model family's reason to exist).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from algp_tpu.config import FitConfig
from algp_tpu.models import coregional as icm
from algp_tpu.models import gp
from algp_tpu.ops.kernels import KernelSpec


def _setup(rng, n=24, T=3, d=2, mask_frac=0.3):
    x = rng.uniform(0.0, 6.0, size=(n, d)).astype(np.float32)
    A = rng.standard_normal((T, 2)) * 0.6
    B = A @ A.T + np.diag(rng.uniform(0.3, 0.8, T))
    nv_t = rng.uniform(0.01, 0.05, T)
    Kx = oracle.gram(
        x.astype(np.float64), x.astype(np.float64),
        spatial_kind="rbf", ds=d, ls_spatial=1.5, outputscale=1.0,
    )
    C = np.kron(Kx, B) + np.diag(
        np.tile(nv_t, n)
    )
    Yf = np.linalg.cholesky(C + 1e-10 * np.eye(n * T)) @ rng.standard_normal(
        n * T
    )
    Y = Yf.reshape(n, T)
    mask = rng.uniform(size=(n, T)) > mask_frac
    mask[:, 0] = True  # planning trait always observed
    mask[0] = True  # at least one fully observed plot
    return x, Y.astype(np.float32), mask, B, nv_t


def _params(B_like, nv_t, ls=1.5, rank=2):
    """ICMParams whose trait_cov reproduces B_like exactly (A from its
    Cholesky, κ → 0) and whose noise matches nv_t."""
    T = B_like.shape[0]
    Lb = np.linalg.cholesky(B_like)
    spec = KernelSpec(spatial_kind="rbf", ds=2, df=0)
    kp = spec.init_params(ls_spatial=ls, outputscale=1.0, noise=0.1)
    # κ = exp(-12) ≈ 6e-6 relative: fold it out of B so trait_cov == B_like
    kappa = np.full(T, -12.0)
    Bres = B_like - np.diag(np.exp(kappa))
    A = np.linalg.cholesky(Bres)
    return icm.ICMParams(
        kernel=kp,
        coreg_a=jnp.asarray(A[:, :T], jnp.float32),
        log_coreg_kappa=jnp.asarray(kappa, jnp.float32),
        log_noise_t=jnp.asarray(0.5 * np.log(nv_t), jnp.float32),
    ), spec


def test_icm_nll_matches_oracle(rng):
    x, Y, mask, B, nv_t = _setup(rng)
    params, spec = _params(B, nv_t)
    Bdev = np.asarray(icm.trait_cov(params), np.float64)
    got = float(
        icm.neg_mll_icm(
            spec, params, jnp.asarray(x), jnp.asarray(Y),
            jnp.asarray(mask), min_noise=1e-4, jitter=0.0,
        )
    )
    Kx = oracle.gram(
        x.astype(np.float64), x.astype(np.float64),
        spatial_kind="rbf", ds=2, ls_spatial=1.5,
    )
    want = oracle.icm_nll(Kx, Bdev, Y, nv_t, mask)
    assert got == pytest.approx(want, rel=2e-4, abs=2e-3)


def test_icm_nll_heteroscedastic_and_num_valid(rng):
    x, Y, mask, B, nv_t = _setup(rng, n=20)
    ns = rng.uniform(0.5, 3.0, x.shape[0]).astype(np.float32)
    params, spec = _params(B, nv_t)
    Bdev = np.asarray(icm.trait_cov(params), np.float64)
    n_valid = 14
    got = float(
        icm.neg_mll_icm(
            spec, params, jnp.asarray(x), jnp.asarray(Y),
            jnp.asarray(mask), jnp.asarray(ns),
            min_noise=1e-4, jitter=0.0, num_valid=jnp.asarray(n_valid),
        )
    )
    Kx = oracle.gram(
        x[:n_valid].astype(np.float64), x[:n_valid].astype(np.float64),
        spatial_kind="rbf", ds=2, ls_spatial=1.5,
    )
    want = oracle.icm_nll(
        Kx, Bdev, Y[:n_valid], nv_t, mask[:n_valid], ns[:n_valid]
    )
    assert got == pytest.approx(want, rel=2e-4, abs=2e-3)


def test_icm_predict_matches_oracle(rng):
    x, Y, mask, B, nv_t = _setup(rng, n=20)
    xs = rng.uniform(0.0, 6.0, size=(15, 2)).astype(np.float32)
    params, spec = _params(B, nv_t)
    Bdev = np.asarray(icm.trait_cov(params), np.float64)
    post = icm.posterior_icm(
        spec, params, jnp.asarray(x), jnp.asarray(Y), jnp.asarray(mask),
        min_noise=1e-4, jitter=0.0,
    )
    mean, var = icm.predict_icm(spec, params, post, jnp.asarray(xs))
    x64 = x.astype(np.float64)
    Kx = oracle.gram(x64, x64, spatial_kind="rbf", ds=2, ls_spatial=1.5)
    Kc = oracle.gram(
        x64, xs.astype(np.float64), spatial_kind="rbf", ds=2, ls_spatial=1.5
    )
    want_m, want_v = oracle.icm_posterior(
        Kx, Kc, np.ones(len(xs)), Bdev, Y, nv_t, mask
    )
    np.testing.assert_allclose(np.asarray(mean), want_m, rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(var), want_v, rtol=0, atol=5e-4)


def test_icm_single_trait_reduces_to_exact_gp(rng):
    """T = 1, B = [[s²]] ⇒ the ICM likelihood IS the exact GP's with
    outputscale s² (same noise): the joint system degenerates to K + σ²I."""
    n = 18
    x = rng.uniform(0.0, 5.0, size=(n, 2)).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    s2, nv = 1.7, 0.04
    params, spec = _params(np.array([[s2]]), np.array([nv]))
    got = float(
        icm.neg_mll_icm(
            spec, params, jnp.asarray(x), jnp.asarray(y)[:, None],
            min_noise=1e-4, jitter=1e-6,
        )
    )
    kp = spec.init_params(ls_spatial=1.5, outputscale=s2, noise=np.sqrt(nv))
    want = float(
        gp.neg_mll(
            spec, kp, jnp.asarray(x), jnp.asarray(y),
            min_noise=1e-4, jitter=1e-6,
        )
    )
    # B = A Aᵀ + e⁻¹²; the tiny κ residual and f32 kron round-off dominate
    assert got == pytest.approx(want, rel=1e-3, abs=5e-3)


def test_icm_fit_improves_nll_and_is_deterministic(rng):
    x, Y, mask, _, _ = _setup(rng, n=20, T=2)
    cfg = FitConfig(iters=40, restarts=2)
    r1 = icm.fit_icm(
        KernelSpec("rbf", ds=2, df=0), cfg, jnp.asarray(x), jnp.asarray(Y),
        jnp.asarray(mask), key=jax.random.PRNGKey(3), rank=1,
    )
    r2 = icm.fit_icm(
        KernelSpec("rbf", ds=2, df=0), cfg, jnp.asarray(x), jnp.asarray(Y),
        jnp.asarray(mask), key=jax.random.PRNGKey(3), rank=1,
    )
    assert float(r1.nll) == float(r2.nll)
    inits = icm.make_icm_inits(KernelSpec("rbf", ds=2, df=0), cfg, 2, 1,
                               jax.random.PRNGKey(3))
    p0 = jax.tree_util.tree_map(lambda a: a[0], inits)
    nll0 = float(
        icm.neg_mll_icm(
            KernelSpec("rbf", ds=2, df=0), p0, jnp.asarray(x),
            jnp.asarray(Y), jnp.asarray(mask),
            min_noise=cfg.min_noise, jitter=cfg.jitter,
        )
    )
    assert float(r1.nll) <= nll0 + 1e-5
    assert np.isfinite(float(r1.nll))


def test_icm_transfers_to_sparsely_observed_trait(rng):
    """The reason the model family exists: with trait 1 strongly correlated
    to trait 0 but observed at only ~20 % of plots, the fitted ICM's
    trait-1 posterior must beat independent per-trait GP fits (which can
    only interpolate trait 1's few own observations)."""
    n_grid = 15
    g = np.stack(
        np.meshgrid(np.arange(n_grid), np.arange(n_grid), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)
    N = len(g)
    Kx = oracle.gram(
        g.astype(np.float64), g.astype(np.float64),
        spatial_kind="rbf", ds=2, ls_spatial=3.0,
    )
    Lx = np.linalg.cholesky(Kx + 1e-8 * np.eye(N))
    rho = 0.95
    R = np.linalg.cholesky(np.array([[1.0, rho], [rho, 1.0]]))
    F = (Lx @ rng.standard_normal((N, 2))) @ R.T  # correlated trait truth
    train = rng.choice(N, size=60, replace=False)
    obs1 = rng.uniform(size=60) < 0.2  # trait 1 measured at ~12 plots
    obs1[:2] = True
    noise = 0.05
    Yn = F[train] + noise * rng.standard_normal((60, 2))
    mask = np.stack([np.ones(60, bool), obs1], axis=1)

    spec = KernelSpec("rbf", ds=2, df=0)
    cfg = FitConfig(iters=120, restarts=2)
    mean, _, _ = icm.fit_predict_icm(
        spec, cfg, jnp.asarray(g[train]), jnp.asarray(Yn, jnp.float32),
        jnp.asarray(g), jnp.asarray(mask), key=jax.random.PRNGKey(0),
        rank=1,
    )
    icm_rmse1 = float(
        np.sqrt(np.mean((np.asarray(mean)[:, 1] - F[:, 1]) ** 2))
    )

    # independent baseline: trait 1 fitted on its own observed subset
    sub = train[obs1]
    res = gp.fit(
        spec, cfg, jnp.asarray(g[sub]), jnp.asarray(Yn[obs1, 1], jnp.float32),
        key=jax.random.PRNGKey(0),
    )
    post = gp.posterior(
        spec, res.params, jnp.asarray(g[sub]),
        jnp.asarray(Yn[obs1, 1], jnp.float32),
    )
    m1, _ = gp.predict(spec, res.params, post, jnp.asarray(g))
    ind_rmse1 = float(np.sqrt(np.mean((np.asarray(m1) - F[:, 1]) ** 2)))

    assert icm_rmse1 < ind_rmse1 * 0.85, (icm_rmse1, ind_rmse1)


def test_icm_fixed_kernel_leaves_stay_fixed(rng):
    """The fit must not move the kernel's own outputscale/base noise —
    B and log_noise_t own those degrees of freedom (identifiability)."""
    x, Y, mask, _, _ = _setup(rng, n=16, T=2)
    spec = KernelSpec("rbf", ds=2, df=0)
    cfg = FitConfig(iters=30, restarts=1)
    res = icm.fit_icm(
        spec, cfg, jnp.asarray(x), jnp.asarray(Y), jnp.asarray(mask),
        key=jax.random.PRNGKey(1),
    )
    assert float(res.params.kernel.log_outputscale) == 0.0
    assert float(res.params.kernel.log_noise) == pytest.approx(
        np.log(cfg.init_noise), abs=1e-6
    )


def test_icm_chunked_predict_equals_monolithic(rng):
    """fit_predict_icm's test-axis chunking is bit-identical per column
    (matmul/trisolve columns are independent)."""
    x, Y, mask, _, _ = _setup(rng, n=16, T=2)
    xs = rng.uniform(0.0, 6.0, size=(37, 2)).astype(np.float32)
    spec = KernelSpec("rbf", ds=2, df=0)
    cfg = FitConfig(iters=20, restarts=1)
    args = (spec, cfg, jnp.asarray(x), jnp.asarray(Y), jnp.asarray(xs),
            jnp.asarray(mask))
    m1, v1, _ = icm.fit_predict_icm(*args, key=jax.random.PRNGKey(0))
    m2, v2, _ = icm.fit_predict_icm(
        *args, key=jax.random.PRNGKey(0), test_chunk=16
    )
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_icm_inits_pin_kernel_scale_across_all_restarts(rng):
    """The fit freezes kernel log_outputscale/log_noise by stop-gradient,
    so every restart must START at the canonical values (0, log
    init_noise) — a perturbed frozen outputscale would silently rescale B
    on whichever restart wins (review finding)."""
    cfg = FitConfig(iters=5, restarts=4, perturb=0.7)
    inits = icm.make_icm_inits(KernelSpec("rbf", ds=2, df=0), cfg, 3, 2,
                               jax.random.PRNGKey(9))
    np.testing.assert_array_equal(
        np.asarray(inits.kernel.log_outputscale), np.zeros(4)
    )
    np.testing.assert_allclose(
        np.asarray(inits.kernel.log_noise),
        np.full(4, np.log(cfg.init_noise)), rtol=1e-6,
    )
    # the coregional/lengthscale leaves DO perturb (restart diversity)
    assert np.ptp(np.asarray(inits.coreg_a), axis=0).max() > 0
    assert np.ptp(np.asarray(inits.kernel.log_ls_spatial)) > 0


def test_icm_mean_only_predict_matches_full(rng):
    x, Y, mask, _, _ = _setup(rng, n=16, T=2)
    xs = rng.uniform(0.0, 6.0, size=(37, 2)).astype(np.float32)
    spec = KernelSpec("rbf", ds=2, df=0)
    cfg = FitConfig(iters=20, restarts=1)
    args = (spec, cfg, jnp.asarray(x), jnp.asarray(Y), jnp.asarray(xs),
            jnp.asarray(mask))
    m1, v1, _ = icm.fit_predict_icm(*args, key=jax.random.PRNGKey(0))
    m2, v2, _ = icm.fit_predict_icm(
        *args, key=jax.random.PRNGKey(0), compute_var=False
    )
    assert v2 is None and v1 is not None
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # chunked mean-only path too
    m3, v3, _ = icm.fit_predict_icm(
        *args, key=jax.random.PRNGKey(0), compute_var=False, test_chunk=16
    )
    assert v3 is None
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m3))


def test_icm_oracle_fuzz():
    """Randomized ICM ≡ f64-oracle contract (the repo's fuzz-suite style
    for the newest model family): random n/T/d, kernel kind, lengthscale,
    trait covariance, observation-mask pattern, heteroscedastic
    noise_scale, and num_valid padding — every draw must match
    `oracle.icm_nll` and `oracle.icm_posterior` on the dense sub-problem
    over observed (plot, trait) cells (the identity-padding contract)."""
    master = np.random.default_rng(20260819)
    for draw in range(8):
        rng = np.random.default_rng(int(master.integers(2**31)))
        n = int(rng.integers(8, 26))
        T = int(rng.integers(1, 5))
        d = int(rng.integers(1, 4))
        kind = str(rng.choice(["rbf", "matern32", "matern52"]))
        ls = float(rng.uniform(0.9, 2.5))
        rank = int(rng.integers(1, T + 1))
        A = rng.standard_normal((T, rank)) * 0.6
        B = A @ A.T + np.diag(rng.uniform(0.3, 0.8, T))
        nv_t = rng.uniform(0.01, 0.05, T)
        x = rng.uniform(0.0, 6.0, size=(n, d)).astype(np.float32)
        C64 = np.kron(
            oracle.gram(x.astype(np.float64), x.astype(np.float64),
                        spatial_kind=kind, ds=d, ls_spatial=ls),
            B,
        ) + np.diag(np.tile(nv_t, n))
        Y = (np.linalg.cholesky(C64 + 1e-10 * np.eye(n * T))
             @ rng.standard_normal(n * T)).reshape(n, T).astype(np.float32)
        mask = rng.uniform(size=(n, T)) > rng.uniform(0.0, 0.5)
        mask[0, 0] = True  # at least one observed cell
        ns = (rng.uniform(0.5, 3.0, n).astype(np.float32)
              if draw % 2 else None)
        spec = KernelSpec(kind, ds=d, df=0)
        kp = spec.init_params(ls_spatial=ls, outputscale=1.0, noise=0.1)
        Lb = np.linalg.cholesky(B - np.diag(np.full(T, np.exp(-12.0))))
        params = icm.ICMParams(
            kernel=kp,
            coreg_a=jnp.asarray(Lb, jnp.float32),
            log_coreg_kappa=jnp.full((T,), -12.0, jnp.float32),
            log_noise_t=jnp.asarray(0.5 * np.log(nv_t), jnp.float32),
        )
        Bdev = np.asarray(icm.trait_cov(params), np.float64)

        # optionally pad with junk rows behind num_valid
        pad = int(rng.integers(0, 5)) if draw % 3 == 0 else 0
        if pad:
            xj = rng.uniform(0.0, 6.0, size=(pad, d)).astype(np.float32)
            xp = np.concatenate([x, xj])
            Yp = np.concatenate(
                [Y, rng.standard_normal((pad, T)).astype(np.float32)]
            )
            mp = np.concatenate([mask, np.ones((pad, T), bool)])
            nsp = (np.concatenate([ns, np.ones(pad, np.float32)])
                   if ns is not None else None)
            nv_arg = jnp.asarray(n, jnp.int32)
        else:
            xp, Yp, mp, nsp, nv_arg = x, Y, mask, ns, None

        got_nll = float(icm.neg_mll_icm(
            spec, params, jnp.asarray(xp), jnp.asarray(Yp),
            jnp.asarray(mp),
            None if nsp is None else jnp.asarray(nsp),
            min_noise=1e-4, jitter=0.0, num_valid=nv_arg,
        ))
        Kx = oracle.gram(x.astype(np.float64), x.astype(np.float64),
                         spatial_kind=kind, ds=d, ls_spatial=ls)
        want_nll = oracle.icm_nll(Kx, Bdev, Y, nv_t, mask, ns)
        assert got_nll == pytest.approx(want_nll, rel=3e-4, abs=3e-3), (
            f"draw {draw}: n={n} T={T} d={d} {kind}"
        )

        N = int(rng.integers(5, 13))
        xs = rng.uniform(0.0, 6.0, size=(N, d)).astype(np.float32)
        post = icm.posterior_icm(
            spec, params, jnp.asarray(xp), jnp.asarray(Yp),
            jnp.asarray(mp),
            None if nsp is None else jnp.asarray(nsp),
            min_noise=1e-4, jitter=0.0, num_valid=nv_arg,
        )
        mean, var = icm.predict_icm(spec, params, post, jnp.asarray(xs))
        Kc = oracle.gram(x.astype(np.float64), xs.astype(np.float64),
                         spatial_kind=kind, ds=d, ls_spatial=ls)
        want_m, want_v = oracle.icm_posterior(
            Kx, Kc, np.ones(N), Bdev, Y, nv_t, mask, ns
        )
        np.testing.assert_allclose(
            np.asarray(mean), want_m, rtol=0, atol=1e-3,
            err_msg=f"draw {draw} mean",
        )
        np.testing.assert_allclose(
            np.asarray(var), want_v, rtol=0, atol=1e-3,
            err_msg=f"draw {draw} var",
        )
        # the mean-only fast path agrees with the full predict
        m2 = icm.predict_icm_mean(spec, params, post, jnp.asarray(xs))
        np.testing.assert_allclose(
            np.asarray(m2), np.asarray(mean), rtol=0, atol=1e-6,
            err_msg=f"draw {draw} mean-only",
        )
