"""Fused Pallas update kernel and batched conditioning vs XLA references."""

import numpy as np

import jax.numpy as jnp

from algp_tpu import acquisition as acq
from algp_tpu.ops.updates import wtw_column_streamed


def test_wtw_column_streamed_matches_dense(rng):
    N = 512
    W = np.tril(rng.standard_normal((N, N)).astype(np.float32))
    P = W.T @ W
    for j in [0, 77, 255, 511]:
        out = np.array(
            wtw_column_streamed(jnp.asarray(W), jnp.asarray(j), tile=256)
        )
        np.testing.assert_allclose(out, P[:, j], rtol=1e-5, atol=1e-4)


def test_batch_pilot_condition_matches_sequential(rng):
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, noise=0.1)
    x = jnp.asarray(rng.uniform(0, 10, (120, 2)), jnp.float32)
    nv = jnp.full((120,), 0.01, jnp.float32)
    d0 = jnp.full((120,), 1.0, jnp.float32)
    pilot = jnp.asarray([3, 50, 90, 7], jnp.int32)
    C, d, taken, _ = acq._batch_pilot_condition(
        spec, params, x, nv[pilot], pilot, jnp.asarray(4), d0
    )
    # sequential reference in f64
    import oracle

    K = oracle.gram(np.asarray(x, np.float64), np.asarray(x, np.float64),
                    ls_spatial=2.0, outputscale=1.0)
    Cref = K.copy()
    for j in [3, 50, 90, 7]:
        c = Cref[:, j] / np.sqrt(Cref[j, j] + 0.01)
        Cref -= np.outer(c, c)
    np.testing.assert_allclose(np.array(d), np.diag(Cref), atol=2e-4)
    assert np.array(taken).sum() == 4


def test_batch_pilot_condition_padding_noop(rng):
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, noise=0.1)
    x = jnp.asarray(rng.uniform(0, 10, (60, 2)), jnp.float32)
    nv = jnp.full((60,), 0.01, jnp.float32)
    d0 = jnp.full((60,), 1.0, jnp.float32)
    pilot_full = jnp.asarray([3, 30], jnp.int32)
    pilot_pad = jnp.asarray([3, 30, 0, 0], jnp.int32)  # 2 padded slots
    C1, d1, t1, _ = acq._batch_pilot_condition(
        spec, params, x, nv[pilot_full], pilot_full, jnp.asarray(2), d0
    )
    C2, d2, t2, _ = acq._batch_pilot_condition(
        spec, params, x, nv[pilot_pad], pilot_pad, jnp.asarray(2), d0
    )
    np.testing.assert_allclose(np.array(d1), np.array(d2), atol=1e-6)
    np.testing.assert_allclose(np.array(C1), np.array(C2[:2]), atol=1e-6)
    assert np.all(np.array(C2[2:]) == 0)
    np.testing.assert_array_equal(np.array(t1), np.array(t2))


def test_greedy_select_nonaligned_matches_alignment_padding(rng):
    """Padding the candidate axis to 256 must not change selections."""
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, noise=0.1)
    # 300 candidates → padded internally to 512
    x = jnp.asarray(rng.uniform(0, 12, (300, 2)), jnp.float32)
    nv = jnp.full((300,), 0.01, jnp.float32)
    pilot = jnp.asarray([0, 150], jnp.int32)
    res = acq.greedy_select(spec, params, x, nv, pilot, rounds=12,
                            num_pilot=2, strategy="mi")
    assert res.post_var.shape == (300,)
    assert res.basis.shape[1] == 300
    sel = np.array(res.selected)
    assert np.all(sel < 300)
    assert len(np.unique(sel)) == 12


def test_wtw_column_dispatcher_off_tpu(rng):
    """Off-TPU the dispatcher must route to the interpretable variant."""
    from algp_tpu.ops.updates import wtw_column

    N = 512
    W = np.tril(rng.standard_normal((N, N)).astype(np.float32))
    P = W.T @ W
    out = np.array(wtw_column(jnp.asarray(W), jnp.asarray(300)))
    np.testing.assert_allclose(out, P[:, 300], rtol=1e-5, atol=1e-4)
