"""On-HARDWARE selection-fidelity tests (BASELINE.json:5: "bitwise-
consistent selected-sample sets vs the CPU reference", v5e vs CPU).

The golden tests in test_episode_golden.py prove the contract on the
virtual CPU mesh; these prove it on the real TPU — the Pallas Gram tiles,
the streamed precision-column kernel, and the MXU matmul precision all
differ there, so this is the test that actually exercises the claim.

Opt-in (needs the axon device + remote compiles, ~1 min):

    ALGP_TPU_HW=1 python -m pytest tests/test_hw_fidelity.py -q

The per-round ritual (benchmarks/round_perf.py) runs this and commits
the result under the "hw_fidelity" key of benchmarks/round_r{N}.json.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algp_tpu import acquisition as acq
from algp_tpu.ops.kernels import KernelSpec

import oracle

pytestmark = pytest.mark.skipif(
    os.environ.get("ALGP_TPU_HW") != "1"
    or jax.default_backend() not in ("tpu", "axon"),
    reason="hardware fidelity tests need ALGP_TPU_HW=1 and a real TPU",
)


def _jittered_grid(rows, cols, seed):
    rng = np.random.default_rng(seed)
    r, c = np.divmod(np.arange(rows * cols), cols)
    return np.stack(
        [c + 0.1 * rng.standard_normal(rows * cols),
         r + 0.1 * rng.standard_normal(rows * cols)], 1
    )


@pytest.mark.parametrize("strategy", ["entropy", "mi"])
def test_tpu_50_round_selection_equals_f64_oracle(strategy):
    """50-round greedy sequences computed ON THE TPU must equal the f64
    CPU oracle index-for-index (symmetry-free jittered grid — exact
    sequence equality is well-posed there; see test_episode_golden.py)."""
    x = _jittered_grid(10, 15, seed=17)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=3.0, outputscale=1.0, noise=0.15)
    pilot = np.linspace(0, len(x) - 1, 8).round().astype(np.int32)
    nv = 0.15**2
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32),
        jnp.asarray(pilot), rounds=50, num_pilot=8, strategy=strategy,
    )
    sel_dev = np.asarray(res.selected)  # host transfer forces completion
    K = oracle.gram(x, x, ls_spatial=3.0, outputscale=1.0)
    if strategy == "entropy":
        sel_ref, _ = oracle.greedy_variance_selection(K, nv, 50, pilot)
    else:
        sel_ref, _ = oracle.greedy_mi_selection(K, nv, 50, pilot)
    np.testing.assert_array_equal(sel_dev, sel_ref)


def test_tpu_posterior_matches_f64_oracle():
    """Posterior mean/variance computed on the TPU (Pallas cross-Gram +
    panel-blocked trisolve) vs the f64 oracle, to tolerance."""
    from algp_tpu.models import gp as gp_mod

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 12, (200, 2))
    xs = x[:60]
    y = rng.standard_normal(60)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.5, noise=0.2)
    nv = 0.2**2 + 1e-6
    post = gp_mod.posterior(
        spec, params, jnp.asarray(xs, jnp.float32),
        jnp.asarray(y, jnp.float32), min_noise=1e-3, jitter=1e-6,
    )
    mean, var = gp_mod.predict(spec, params, post,
                               jnp.asarray(x, jnp.float32), use_pallas=True)
    K = oracle.gram(xs, xs, ls_spatial=2.0, outputscale=1.5) + nv * np.eye(60)
    Kc = oracle.gram(xs, x, ls_spatial=2.0, outputscale=1.5)
    m_ref, v_ref = oracle.posterior(K, Kc, 1.5 * np.ones(200), y)
    np.testing.assert_allclose(np.asarray(mean), m_ref, atol=5e-3)
    np.testing.assert_allclose(np.asarray(var), v_ref, atol=5e-3)


def test_tpu_composite_kernel_selection_equals_f64_oracle():
    """Composite Matérn52×RBF (spatial × genotype features) 30-round MI
    on the TPU vs the f64 oracle — exercises the composite Pallas Gram
    tiles and the feature-ARD paths on hardware."""
    rng = np.random.default_rng(23)
    n = 180
    x = np.concatenate(
        [rng.uniform(0, 12, (n, 2)), rng.standard_normal((n, 3))], axis=1
    )
    spec = KernelSpec("matern52", "rbf", ds=2, df=3)
    params = spec.init_params(ls_spatial=3.0, ls_feature=1.5,
                              outputscale=1.2, noise=0.15)
    pilot = np.linspace(0, n - 1, 6).round().astype(np.int32)
    nv = 0.15**2
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((n,), nv, jnp.float32),
        jnp.asarray(pilot), rounds=30, num_pilot=6, strategy="mi",
    )
    K = oracle.gram(x, x, spatial_kind="matern52", feature_kind="rbf",
                    ds=2, ls_spatial=3.0, ls_feature=1.5, outputscale=1.2)
    sel_ref, _ = oracle.greedy_mi_selection(K, nv, 30, pilot)
    np.testing.assert_array_equal(np.asarray(res.selected), sel_ref)


def test_tpu_lowrank_selection_equals_f64_oracle():
    """Low-rank (inducing-point) MI on the TPU vs the low-rank f64
    oracle, index-for-index — exercises the FITC seed's MXU matmul
    chain and the V-factor row gathers on hardware."""
    from algp_tpu import acquisition_lowrank as lr

    x = _jittered_grid(10, 15, seed=29)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=3.0, outputscale=1.0, noise=0.15)
    pilot = np.linspace(0, len(x) - 1, 8).round().astype(np.int32)
    nv = 0.15**2
    zidx = np.asarray(lr.kcenter_indices(jnp.asarray(x, jnp.float32), 50))
    res = lr.greedy_select_lowrank(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((len(x),), nv, jnp.float32),
        jnp.asarray(pilot), jnp.asarray(x[zidx], jnp.float32),
        rounds=40, num_pilot=8,
    )
    K = oracle.gram(x, x, ls_spatial=3.0, outputscale=1.0)
    sel_ref, _ = oracle.greedy_mi_selection_lowrank(K, zidx, nv, 40, pilot)
    np.testing.assert_array_equal(np.asarray(res.selected), sel_ref)


def test_tpu_sgpr_matches_f64_oracle():
    """SGPR −ELBO and predictive marginals computed ON the TPU vs the
    dense f64 Titsias reference."""
    from algp_tpu.models import sparse_gp as sgp

    rng = np.random.default_rng(31)
    x = rng.uniform(0, 12, (200, 2))
    y = rng.standard_normal(200)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.5, noise=0.2)
    nv = np.maximum(0.2**2, 1e-6)
    zidx = np.arange(0, 200, 3)
    ref_nelbo, m_ref, v_ref = oracle.sgpr_reference(x_K := oracle.gram(
        x, x, ls_spatial=2.0, outputscale=1.5), zidx, y, nv)
    dev = float(sgp.neg_elbo(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32), jnp.asarray(x[zidx], jnp.float32),
    ))
    np.testing.assert_allclose(dev, ref_nelbo, rtol=2e-3)
    post = sgp.posterior_sparse(
        spec, params, jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32), jnp.asarray(x[zidx], jnp.float32),
    )
    mean, var = sgp.predict_sparse(spec, params, post,
                                   jnp.asarray(x, jnp.float32))
    # wider than the exact-posterior test: the M x M solve against
    # B = I + A A^T (norm ~ K/lambda) amplifies f32 reduction-order
    # differences between the MXU and CPU chains
    np.testing.assert_allclose(np.asarray(mean), m_ref, atol=2.5e-2)
    np.testing.assert_allclose(np.asarray(var), v_ref, atol=2.5e-2)


def test_tpu_dense_inducing_design_seed_is_finite():
    """Regression (observed 2026-08-18, TPU-only): a DENSE k-center
    design on a small smooth grid (220 inducing of a 40x40 / ls=6 field)
    pushes cond(K_zz) past what f32 + the fixed 1e-6 relative jitter can
    factor — the TPU's Cholesky NaN'd where the CPU's did not, silently
    poisoning the whole seed.  The safe_cholesky rescue must keep the
    factors finite ON HARDWARE for both the precision seed and the
    small-factor seed, and the streamed field synthesis must produce a
    finite field."""
    from algp_tpu import acquisition_lowrank as lr
    from algp_tpu import field as field_mod
    from algp_tpu.config import FieldConfig

    rows, cols = 40, 40
    r, c = np.divmod(np.arange(rows * cols), cols)
    x = jnp.asarray(np.stack([c * 1.0, r * 1.0], 1), jnp.float32)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=6.0, outputscale=1.0, noise=0.1)
    z = x[lr.kcenter_indices(x, 220)]
    seed = lr.lowrank_seed_with_z(spec, params, x, z)
    assert np.isfinite(np.asarray(seed.VT)).all()
    assert np.isfinite(np.asarray(seed.pdiag)).all()
    fac = lr.lowrank_factors_seed(spec, params, x, z)
    assert np.isfinite(np.asarray(fac.Lzz)).all()
    assert np.isfinite(np.asarray(fac.LB)).all()
    env = field_mod.FieldEnv(
        FieldConfig(num_rows=40, num_cols=40, true_ls_spatial=6.0,
                    synth_inducing=220, seed=3),
        spec,
    )
    assert np.isfinite(env.f).all()


@pytest.mark.parametrize("path_utility", ["per_cost", "per_sample"])
def test_tpu_z_ensemble_step_matches_cpu(path_utility):
    """The z-ENSEMBLE fused episode step (K stacked small-factor seeds,
    vmapped MI scoring, averaged before the utility argmax) ON THE TPU
    vs the same program on CPU: identical path choice, scores to
    tolerance, everything finite.  Round-4's newest device path — the
    vmapped v_rows_at/PA-Cholesky chain and the per_sample utility
    gate have no other hardware pin (the dense k-center NaN regression
    below showed this seed family is exactly where TPU-only f32
    breakage appears)."""
    from algp_tpu import acquisition_lowrank as lr

    K_ens, n, cap, S_sets, k, M = 3, 156, 16, 12, 5, 36
    rng = np.random.default_rng(41)
    x_np = _jittered_grid(12, 13, seed=41).astype(np.float32)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.5, outputscale=1.2, noise=0.12)
    idx = rng.choice(n, 10, replace=False).astype(np.int32)
    idx_pad_np = np.pad(idx, (0, cap - 10))
    y_np = np.pad(rng.standard_normal(10).astype(np.float32), (0, cap - 10))
    # distinct sites per set (duplicate sites make the joint singular —
    # real path sets never contain them)
    sets_np = np.stack(
        [rng.choice(n, k, replace=False) for _ in range(S_sets)]
    ).astype(np.int32)
    sizes_np = rng.integers(2, k + 1, S_sets).astype(np.int32)
    costs_np = rng.uniform(2.0, 6.0, S_sets).astype(np.float32)

    # design variants computed ONCE (indices are backend-independent ints)
    z_starts = [(j * n) // K_ens for j in range(K_ens)]
    zidx = [
        np.asarray(lr.kcenter_indices(jnp.asarray(x_np), M, start=s))
        for s in z_starts
    ]

    def run(device):
        with jax.default_device(device):
            x = jnp.asarray(x_np)
            facs = [
                lr.lowrank_factors_seed(spec, params, x,
                                        jnp.asarray(x_np[zi]))
                for zi in zidx
            ]
            fac = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *facs)
            best, mean, d, scores = lr.plan_episode_step_lowrank_factors(
                spec, params, x, jnp.asarray(idx_pad_np),
                jnp.asarray(10, jnp.int32), jnp.ones((cap,), jnp.float32),
                jnp.asarray(y_np), jnp.asarray(sets_np),
                jnp.asarray(sizes_np), jnp.asarray(costs_np), fac,
                ensemble=K_ens, path_utility=path_utility,
            )
            return (int(best), np.asarray(mean), np.asarray(d),
                    np.asarray(scores))

    b_tpu, m_tpu, d_tpu, s_tpu = run(jax.devices()[0])
    assert np.isfinite(s_tpu).all() and np.isfinite(m_tpu).all()
    b_cpu, m_cpu, d_cpu, s_cpu = run(jax.devices("cpu")[0])
    assert b_tpu == b_cpu
    np.testing.assert_allclose(s_tpu, s_cpu, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(m_tpu, m_cpu, atol=5e-3)
    np.testing.assert_allclose(d_tpu, d_cpu, atol=5e-3)


@pytest.mark.parametrize("strategy", ["entropy", "mi"])
def test_tpu_heteroscedastic_selection_equals_f64_oracle(strategy):
    """Greedy selection under a NON-uniform per-candidate noise field
    (the two-modality phenotyping setup, C5) vs the f64 oracle ON the
    TPU — the driver's headline bench covers only the homoscedastic
    model (VERDICT r2 weak #8), so hardware fidelity of the
    heteroscedastic conditioning/scoring path is pinned here."""
    x = _jittered_grid(10, 15, seed=23)
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=3.0, outputscale=1.0, noise=0.15)
    pilot = np.linspace(0, len(x) - 1, 8).round().astype(np.int32)
    # cheap sensor (9x variance) on the right half of the field
    nv = np.where(x[:, 0] >= 7.0, 9 * 0.15**2, 0.15**2).astype(np.float32)
    res = acq.greedy_select(
        spec, params, jnp.asarray(x, jnp.float32), jnp.asarray(nv),
        jnp.asarray(pilot), rounds=40, num_pilot=8, strategy=strategy,
        pilot_nv=jnp.asarray(nv[pilot]),
    )
    sel_dev = np.asarray(res.selected)
    K = oracle.gram(x, x, ls_spatial=3.0, outputscale=1.0)
    if strategy == "entropy":
        sel_ref, _ = oracle.greedy_variance_selection(
            K, nv.astype(np.float64), 40, pilot)
    else:
        sel_ref, _ = oracle.greedy_mi_selection(
            K, nv.astype(np.float64), 40, pilot)
    np.testing.assert_array_equal(sel_dev, sel_ref)


def test_tpu_fit_multi_matches_individual_fits():
    """The batched traits × restarts × iters fit program (`models.gp.
    fit_multi` — the multi-trait episode's end-of-episode evaluator) ON
    THE TPU vs T separate `fit()` calls sharing the same restart inits:
    the nested-vmap batching must not move any trait's optimum.  The CPU
    contract lives in tests/test_gp.py::test_fit_multi_traits_match_
    individual_fits; this is its hardware pin — the batched path tiles
    differently on the MXU, and round 5's multi-trait episodes score
    every trait through it."""
    from algp_tpu.config import FitConfig
    from algp_tpu.models import gp as gp_mod

    rng = np.random.default_rng(17)
    n, T = 90, 3
    spec = KernelSpec("rbf", ds=2)
    x = jnp.asarray(rng.uniform(0, 10, (n, 2)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, T)), jnp.float32)
    cfg = FitConfig(iters=40, restarts=2)
    key = jax.random.PRNGKey(5)
    multi = gp_mod.fit_multi(spec, cfg, x, Y, key=key)
    assert np.isfinite(np.asarray(multi.nll)).all()
    for t in range(T):
        single = gp_mod.fit(spec, cfg, x, Y[:, t], key=key)
        rt = gp_mod.trait_result(multi, t)
        np.testing.assert_allclose(
            float(rt.nll), float(single.nll), rtol=5e-4, atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(rt.params.log_ls_spatial),
            np.asarray(single.params.log_ls_spatial),
            rtol=2e-3, atol=2e-3,
        )


def test_tpu_icm_matches_f64_oracle():
    """Coregionalized multi-trait GP ON THE TPU vs the f64 oracle: the
    joint nT×nT kron system's f32 Cholesky + the per-trait posterior.
    This seed family (dense structured covariances at f32) is exactly
    where TPU-only breakage has appeared before (the k-center K_zz NaN
    class), so it gets its own hardware pin."""
    from algp_tpu.models import coregional as icm_mod

    rng = np.random.default_rng(41)
    n, T = 48, 3
    x = rng.uniform(0, 10, (n, 2)).astype(np.float32)
    xs = rng.uniform(0, 10, (30, 2)).astype(np.float32)
    A = rng.standard_normal((T, 2)) * 0.6
    B = A @ A.T + np.diag(rng.uniform(0.3, 0.8, T))
    nv_t = rng.uniform(0.01, 0.05, T)
    Kx = oracle.gram(x.astype(np.float64), x.astype(np.float64),
                     spatial_kind="rbf", ds=2, ls_spatial=2.0)
    C = np.kron(Kx, B) + np.diag(np.tile(nv_t, n))
    Y = (np.linalg.cholesky(C + 1e-10 * np.eye(n * T))
         @ rng.standard_normal(n * T)).reshape(n, T)
    mask = rng.uniform(size=(n, T)) > 0.3
    mask[:, 0] = True
    mask[0] = True

    spec = KernelSpec("rbf", ds=2, df=0)
    kp = spec.init_params(ls_spatial=2.0, outputscale=1.0, noise=0.1)
    kappa = np.full(T, -12.0)
    Af = np.linalg.cholesky(B - np.diag(np.exp(kappa)))
    params = icm_mod.ICMParams(
        kernel=kp,
        coreg_a=jnp.asarray(Af, jnp.float32),
        log_coreg_kappa=jnp.asarray(kappa, jnp.float32),
        log_noise_t=jnp.asarray(0.5 * np.log(nv_t), jnp.float32),
    )
    Bdev = np.asarray(icm_mod.trait_cov(params), np.float64)
    got_nll = float(icm_mod.neg_mll_icm(
        spec, params, jnp.asarray(x), jnp.asarray(Y, jnp.float32),
        jnp.asarray(mask), min_noise=1e-4, jitter=0.0,
    ))
    want_nll = oracle.icm_nll(Kx, Bdev, Y, nv_t, mask)
    assert got_nll == pytest.approx(want_nll, rel=5e-4, abs=5e-3)

    post = icm_mod.posterior_icm(
        spec, params, jnp.asarray(x), jnp.asarray(Y, jnp.float32),
        jnp.asarray(mask), min_noise=1e-4, jitter=0.0,
    )
    mean, var = icm_mod.predict_icm(spec, params, post, jnp.asarray(xs))
    mean, var = np.asarray(mean), np.asarray(var)  # forces completion
    Kc = oracle.gram(x.astype(np.float64), xs.astype(np.float64),
                     spatial_kind="rbf", ds=2, ls_spatial=2.0)
    want_m, want_v = oracle.icm_posterior(
        Kx, Kc, np.ones(len(xs)), Bdev, Y, nv_t, mask
    )
    np.testing.assert_allclose(mean, want_m, atol=2e-3)
    np.testing.assert_allclose(var, want_v, atol=2e-3)
