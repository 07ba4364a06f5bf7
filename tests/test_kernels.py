"""Kernel-function tests: closed forms, symmetry/PSD, oracle agreement,
and Pallas-Gram ≡ plain-JAX-Gram (SURVEY.md §4 item 2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from algp_tpu.ops import gram as gram_mod
from algp_tpu.ops import kernels as kmod

import oracle


def make_params(spec, ls_s=1.3, ls_f=0.7, os_=2.0, noise=0.1):
    return kmod.KernelParams(
        log_ls_spatial=jnp.full((spec.ds,), np.log(ls_s), jnp.float32),
        log_ls_feature=jnp.full((spec.df,), np.log(ls_f), jnp.float32),
        log_outputscale=jnp.asarray(np.log(os_), jnp.float32),
        log_noise=jnp.asarray(np.log(noise), jnp.float32),
    )


SPECS = [
    kmod.KernelSpec("rbf", ds=2, df=0),
    kmod.KernelSpec("matern32", ds=2, df=0),
    kmod.KernelSpec("matern52", ds=2, df=0),
    kmod.KernelSpec("matern52", "rbf", ds=2, df=3),
    kmod.KernelSpec("rbf", "matern32", ds=2, df=2),
]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.spatial_kind}-df{s.df}")
def test_gram_matches_oracle(rng, spec):
    n1, n2 = 37, 23
    x1 = rng.uniform(0, 10, (n1, spec.dim))
    x2 = rng.uniform(0, 10, (n2, spec.dim))
    p = make_params(spec)
    K = np.array(kmod.gram(spec, p, jnp.asarray(x1, jnp.float32),
                           jnp.asarray(x2, jnp.float32)))
    K_ref = oracle.gram(
        x1, x2, spatial_kind=spec.spatial_kind, feature_kind=spec.feature_kind,
        ds=spec.ds, ls_spatial=1.3, ls_feature=0.7, outputscale=2.0,
    )
    np.testing.assert_allclose(K, K_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind", kmod.KERNEL_KINDS)
def test_closed_form_values(kind):
    # distance 0 → 1; distance ∞ → 0
    assert float(kmod.stationary_form(kind, jnp.asarray(0.0))) == pytest.approx(1.0)
    assert float(kmod.stationary_form(kind, jnp.asarray(1e8))) == pytest.approx(0.0, abs=1e-12)
    # known value at r=1
    v = float(kmod.stationary_form(kind, jnp.asarray(1.0)))
    expected = {
        "rbf": np.exp(-0.5),
        "matern32": (1 + np.sqrt(3)) * np.exp(-np.sqrt(3)),
        "matern52": (1 + np.sqrt(5) + 5 / 3) * np.exp(-np.sqrt(5)),
    }[kind]
    assert v == pytest.approx(expected, rel=1e-5)


def test_gram_symmetric_psd(rng):
    spec = kmod.KernelSpec("matern32", ds=2, df=0)
    x = rng.uniform(0, 10, (60, 2)).astype(np.float32)
    p = make_params(spec, noise=0.05)
    K = np.array(kmod.gram_with_noise(spec, p, jnp.asarray(x)))
    np.testing.assert_allclose(K, K.T, atol=1e-6)
    eigs = np.linalg.eigvalsh(K.astype(np.float64))
    assert eigs.min() > 0


def test_heteroscedastic_noise_diag(rng):
    spec = kmod.KernelSpec("rbf", ds=2, df=0)
    x = rng.uniform(0, 5, (10, 2)).astype(np.float32)
    p = make_params(spec, noise=0.2)
    scale = jnp.asarray(np.arange(1.0, 11.0), jnp.float32)
    K0 = np.array(kmod.gram(spec, p, jnp.asarray(x), jnp.asarray(x)))
    K = np.array(kmod.gram_with_noise(spec, p, jnp.asarray(x), scale))
    np.testing.assert_allclose(
        np.diag(K) - np.diag(K0), 0.04 * np.arange(1.0, 11.0), rtol=1e-4
    )


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: f"{s.spatial_kind}-df{s.df}")
def test_pallas_gram_matches_plain(rng, spec):
    # ragged sizes exercise tile padding/slicing
    n1, n2 = 300, 270
    x1 = jnp.asarray(rng.uniform(0, 10, (n1, spec.dim)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 10, (n2, spec.dim)), jnp.float32)
    p = make_params(spec)
    K_plain = np.array(kmod.gram(spec, p, x1, x2))
    K_pallas = np.array(gram_mod.gram_pallas(spec, p, x1, x2, tile=256))
    np.testing.assert_allclose(K_pallas, K_plain, rtol=1e-5, atol=1e-6)


def test_pallas_gram_with_noise(rng):
    spec = kmod.KernelSpec("rbf", ds=2, df=0)
    x = jnp.asarray(rng.uniform(0, 10, (130, 2)), jnp.float32)
    p = make_params(spec)
    K1 = np.array(gram_mod.gram_pallas_with_noise(spec, p, x))
    K2 = np.array(kmod.gram_with_noise(spec, p, x))
    np.testing.assert_allclose(K1, K2, rtol=1e-5, atol=1e-6)


def test_init_params_perturb_distinct():
    import jax

    spec = kmod.KernelSpec("rbf", ds=2, df=1)
    p0 = spec.init_params()
    assert p0.log_ls_spatial.shape == (2,)
    k = jax.random.PRNGKey(0)
    p1 = spec.init_params(key=k, perturb=0.5)
    p2 = spec.init_params(key=jax.random.PRNGKey(1), perturb=0.5)
    assert not np.allclose(np.array(p1.log_outputscale), np.array(p2.log_outputscale))
