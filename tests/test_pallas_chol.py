"""Pallas blocked-Cholesky tests.

The full kernel needs real TPU hardware (emit_pipeline has no interpreter
emulation), so CI covers: the in-VMEM micro-kernels (plain-JAX execution
of the same traced code), the hierarchical blocked variants, the
triangular-index decode, and the XLA fallback path.  On-TPU correctness
and timing live in benchmarks / the driver's bench runs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from algp_tpu.ops.pallas_chol import (
    _micro_cholesky,
    _micro_cholesky_blocked,
    _micro_tri_inv,
    _tri_decode,
    cholesky_pallas,
)


def spd(rng, n, diag=0.5):
    A = rng.standard_normal((n, n + 16)).astype(np.float32)
    return A @ A.T / n + diag * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("p", [128, 256])
def test_micro_cholesky(rng, p):
    K = spd(rng, p)
    L = np.array(_micro_cholesky(jnp.asarray(K), p))
    np.testing.assert_allclose(
        np.tril(L), np.linalg.cholesky(K), rtol=2e-4, atol=2e-5
    )


def test_micro_cholesky_blocked(rng):
    p = 256
    K = spd(rng, p)
    L = np.array(_micro_cholesky_blocked(jnp.asarray(K), p))
    np.testing.assert_allclose(
        np.tril(L), np.linalg.cholesky(K), rtol=2e-4, atol=2e-5
    )
    # strict upper must be clean (reassembly accumulates embeds)
    assert np.abs(np.triu(L, 1)).max() < 1.0  # junk only inside diag blocks


@pytest.mark.parametrize("p", [128, 256])
def test_micro_tri_inv(rng, p):
    L = np.linalg.cholesky(spd(rng, p)).astype(np.float32)
    W = np.array(_micro_tri_inv(jnp.asarray(L), p))
    np.testing.assert_allclose(W @ L, np.eye(p), atol=5e-5 * np.sqrt(p))


def test_tri_decode_exact():
    ts = jnp.arange(0, 2000)
    ir, jr = _tri_decode(ts)
    ir, jr = np.array(ir), np.array(jr)
    expect = [(i, j) for i in range(70) for j in range(i + 1)][:2000]
    for t in range(2000):
        assert (ir[t], jr[t]) == expect[t], t


def test_cholesky_pallas_fallback_paths(rng):
    # off-TPU / ragged sizes use the XLA factorization
    for n in [300, 512]:
        K = spd(rng, n)
        L = np.array(cholesky_pallas(jnp.asarray(K)))
        np.testing.assert_allclose(
            L, np.tril(np.linalg.cholesky(K)), rtol=2e-4, atol=2e-5
        )
        assert np.abs(np.triu(L, 1)).max() == 0.0


def test_cholesky_pallas_la_fallback_paths(rng):
    from algp_tpu.ops.pallas_chol import cholesky_pallas_la

    K = spd(rng, 300)
    L = np.array(cholesky_pallas_la(jnp.asarray(K)))
    np.testing.assert_allclose(
        L, np.tril(np.linalg.cholesky(K)), rtol=2e-4, atol=2e-5
    )
