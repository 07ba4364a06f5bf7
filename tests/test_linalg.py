"""Unit tests for algp_tpu.ops.linalg against scipy/numpy f64 (SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.linalg as sla

import jax.numpy as jnp

from algp_tpu.ops import linalg as la


def random_spd(rng, n, cond=100.0):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.geomspace(1.0, 1.0 / cond, n)
    return (Q * eigs) @ Q.T


def test_cholesky_matches_scipy(rng):
    K = random_spd(rng, 64)
    L = np.array(la.cholesky(jnp.asarray(K, jnp.float32)))
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, L_ref, rtol=2e-3, atol=2e-4)


def test_safe_cholesky_recovers_near_singular(rng):
    # rank-deficient + tiny diagonal: plain f32 cholesky fails, safe succeeds
    A = rng.standard_normal((32, 8))
    K = A @ A.T  # rank 8 of 32
    L, jit_used = la.safe_cholesky(jnp.asarray(K, jnp.float32))
    assert np.all(np.isfinite(np.array(L)))
    assert float(jit_used) > 0


def test_blocked_trisolve_matches_full(rng):
    n, m = 96, 700  # m forces 2 panels at block=512
    K = random_spd(rng, n)
    L = np.linalg.cholesky(K)
    B = rng.standard_normal((n, m))
    x = np.array(
        la.blocked_solve_triangular(
            jnp.asarray(L, jnp.float32), jnp.asarray(B, jnp.float32), block=512
        )
    )
    x_ref = sla.solve_triangular(L, B, lower=True)
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_cho_solve_and_logdet(rng):
    n = 48
    K = random_spd(rng, n)
    y = rng.standard_normal(n)
    L = jnp.asarray(np.linalg.cholesky(K), jnp.float32)
    x = np.array(la.cho_solve(L, jnp.asarray(y, jnp.float32)))
    np.testing.assert_allclose(x, np.linalg.solve(K, y), rtol=5e-3, atol=5e-3)
    ld = float(la.logdet_from_chol(L))
    assert np.isclose(ld, np.linalg.slogdet(K)[1], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [32, 100, 600])
def test_tri_inv_blocked(rng, n):
    K = random_spd(rng, n)
    L = np.linalg.cholesky(K)
    W = np.array(la.tri_inv(jnp.asarray(L, jnp.float32), leaf=64))
    np.testing.assert_allclose(
        W @ L, np.eye(n), atol=5e-4 * np.sqrt(n)
    )


def test_spd_inverse_from_chol(rng):
    n = 128
    K = random_spd(rng, n, cond=50.0)
    L = jnp.asarray(np.linalg.cholesky(K), jnp.float32)
    P = np.array(la.spd_inverse_from_chol(L, leaf=64))
    P_ref = np.linalg.inv(K)
    # f32 inverse error scales with cond(K); compare relative to ‖K⁻¹‖
    err = np.abs(P - P_ref).max() / np.abs(P_ref).max()
    assert err < 1e-3


def test_chol_append_row_grows_factor(rng):
    n = 30
    K = random_spd(rng, n, cond=20.0)
    n_max = 40
    m = n - 1
    L_lead = np.linalg.cholesky(K[:m, :m])
    L_pad = la.pad_factor(jnp.asarray(L_lead, jnp.float32), n_max)
    k_vec = jnp.zeros(n_max).at[:m].set(jnp.asarray(K[:m, m], jnp.float32))
    L_new = np.array(
        la.chol_append_row(L_pad, jnp.asarray(m), k_vec, jnp.asarray(K[m, m], jnp.float32))
    )
    L_ref = np.linalg.cholesky(K)
    np.testing.assert_allclose(np.tril(L_new[:n, :n]), L_ref, rtol=3e-3, atol=3e-4)


def test_tri_inv_doubling_ill_conditioned_kernel(rng):
    """The Neumann-doubling leaf inversion must hold f32 accuracy on the
    worst realistic input: the Cholesky factor of a badly conditioned
    (long-lengthscale, small-jitter) kernel Gram matrix."""
    import scipy.linalg as sla

    n = 500
    x = rng.uniform(0, 10, (n, 2))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2 / 5.0**2) + 1e-4 * np.eye(n)  # cond ~ 1e5
    L = np.linalg.cholesky(K)
    W = np.asarray(la.tri_inv(jnp.asarray(L, jnp.float32)))
    W_ref = sla.solve_triangular(L, np.eye(n), lower=True)
    err = np.abs(W - W_ref).max() / np.abs(W_ref).max()
    assert err < 5e-5, err


@pytest.mark.parametrize("n", [96, 224, 320])
def test_solve_triangular_matmul_matches_trisolve(rng, n):
    """The small-factor explicit-inverse matmul solve (the ≥1M episode
    conditioning fast path) must agree with the XLA trisolve on
    GP-shaped factors — n = 320 exerces tri_inv's bisection recursion
    past the 256 leaf."""
    x = rng.uniform(0, 30, (n, 2))
    K = np.exp(-sla.norm(x[:, None] - x[None, :], axis=-1) ** 2 / 18.0)
    K += 0.05 * np.eye(n)
    L = jnp.asarray(np.linalg.cholesky(K), jnp.float32)
    B = jnp.asarray(rng.standard_normal((n, 700)), jnp.float32)
    ref = np.asarray(la.solve_triangular(L, B))
    got = np.asarray(la.solve_triangular_matmul(L, B))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
