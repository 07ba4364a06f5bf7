"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5; real-chip validation is the driver's dry run)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algp_tpu.config import FitConfig
from algp_tpu.models import gp as gp_mod
from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.parallel import make_mesh, sharded_fit, sharded_training_step
from algp_tpu.parallel.sharded import sharded_greedy_select
from algp_tpu import acquisition as acq

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device mesh"
)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["restarts"] * mesh.shape["grid"] == 8
    mesh1 = make_mesh(1)
    assert mesh1.shape["restarts"] == 1


def test_sharded_fit_matches_single_device(rng):
    spec = KernelSpec("rbf", ds=2)
    x = jnp.asarray(rng.uniform(0, 10, (64, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(64), jnp.float32)
    cfg = FitConfig(iters=30, restarts=4)
    key = jax.random.PRNGKey(0)
    res_s = sharded_fit(make_mesh(8), spec, cfg, x, y, key=key)
    res_1 = gp_mod.fit(spec, cfg, x, y, key=key)
    np.testing.assert_allclose(
        np.asarray(res_s.all_nlls), np.asarray(res_1.all_nlls),
        rtol=1e-4, atol=1e-4,
    )
    assert int(res_s.best_restart) == int(res_1.best_restart)


def test_sharded_greedy_matches_single_device(rng):
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, noise=0.1)
    x = jnp.asarray(rng.uniform(0, 10, (256, 2)), jnp.float32)
    nv = jnp.full((256,), 0.01, jnp.float32)
    pilot = jnp.asarray([0, 100], jnp.int32)
    mesh = make_mesh(8)
    r_s = sharded_greedy_select(
        mesh, spec, params, x, nv, pilot, rounds=10, num_pilot=2,
        strategy="entropy",
    )
    r_1 = acq.greedy_select(
        spec, params, x, nv, pilot, rounds=10, num_pilot=2, strategy="entropy",
    )
    np.testing.assert_array_equal(np.asarray(r_s.selected), np.asarray(r_1.selected))


def test_sharded_training_step_executes(rng):
    mesh = make_mesh(8)
    spec = KernelSpec("rbf", ds=2)
    cfg = FitConfig(iters=10, restarts=4)
    x_train = jnp.asarray(rng.uniform(0, 10, (24, 2)), jnp.float32)
    y_train = jnp.asarray(rng.standard_normal(24), jnp.float32)
    x_grid = jnp.asarray(rng.uniform(0, 10, (256, 2)), jnp.float32)
    nv = jnp.full((256,), 0.01, jnp.float32)
    pilot = jnp.asarray([0, 7], jnp.int32)
    params, nlls, selected, post_var = sharded_training_step(
        mesh, spec, cfg, x_train, y_train, x_grid, nv, pilot, rounds=4
    )
    sel = np.asarray(selected)
    assert np.isfinite(np.asarray(nlls)).all()
    assert len(np.unique(sel)) == 4
    assert np.asarray(post_var).shape == (256,)


def test_graft_entry_single_and_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    mean, var = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.asarray(var).min() >= 0
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("num_pilot", [0, 3])
def test_sharded_mi_matches_single_device(rng, num_pilot):
    """The shard_map MI decomposition (parallel.sharded_mi) must reproduce
    the single-device implicit-precision loop index-for-index."""
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, noise=0.15)
    x = jnp.asarray(rng.uniform(0, 12, (300, 2)), jnp.float32)
    nv = jnp.full((300,), 0.15**2, jnp.float32)
    pilot = jnp.asarray(
        rng.choice(300, num_pilot, replace=False).astype(np.int32)
    )
    mesh = make_mesh(8)
    r_s = sharded_greedy_select(
        mesh, spec, params, x, nv, pilot, rounds=15, num_pilot=num_pilot,
        strategy="mi",
    )
    r_1 = acq.greedy_select(
        spec, params, x, nv, pilot, rounds=15, num_pilot=num_pilot,
        strategy="mi",
    )
    np.testing.assert_array_equal(
        np.asarray(r_s.selected), np.asarray(r_1.selected)
    )
    np.testing.assert_allclose(
        np.asarray(r_s.post_var), np.asarray(r_1.post_var), atol=1e-5
    )


def test_sharded_mi_matches_oracle(rng):
    """Sharded MI against the f64 oracle directly (the BASELINE.json:5
    fidelity contract, now multi-chip)."""
    import oracle

    ls, os_, noise = 2.0, 1.5, 0.15
    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=ls, outputscale=os_, noise=noise)
    x = rng.uniform(0, 12, (250, 2))
    nv = noise**2
    pilot = rng.choice(250, 5, replace=False).astype(np.int32)
    mesh = make_mesh(8)
    r_s = sharded_greedy_select(
        mesh, spec, params, jnp.asarray(x, jnp.float32),
        jnp.full((250,), nv, jnp.float32), jnp.asarray(pilot),
        rounds=20, num_pilot=5, strategy="mi",
    )
    K = oracle.gram(x, x, ls_spatial=ls, outputscale=os_)
    sel_ref, _ = oracle.greedy_mi_selection(K, nv, 20, pilot)
    np.testing.assert_array_equal(np.asarray(r_s.selected), sel_ref)


def test_sharded_training_step_mi(rng):
    mesh = make_mesh(8)
    spec = KernelSpec("rbf", ds=2)
    cfg = FitConfig(iters=10, restarts=4)
    x_train = jnp.asarray(rng.uniform(0, 10, (24, 2)), jnp.float32)
    y_train = jnp.asarray(rng.standard_normal(24), jnp.float32)
    x_grid = jnp.asarray(rng.uniform(0, 10, (256, 2)), jnp.float32)
    nv = jnp.full((256,), 0.01, jnp.float32)
    pilot = jnp.asarray([0, 7], jnp.int32)
    params, nlls, selected, post_var = sharded_training_step(
        mesh, spec, cfg, x_train, y_train, x_grid, nv, pilot,
        rounds=4, strategy="mi",
    )
    sel = np.asarray(selected)
    assert np.isfinite(np.asarray(nlls)).all()
    assert len(np.unique(sel)) == 4
    assert np.asarray(post_var).shape == (256,)


def test_dist_linalg_matches_dense(rng):
    """Distributed blocked Cholesky + block forward-substitution inverse
    (O(N²/S) memory per shard) vs the dense references."""
    import scipy.linalg as sla

    from algp_tpu.parallel.dist_linalg import dist_cholesky, dist_tri_inv

    mesh = make_mesh(8)
    S = mesh.shape["grid"]
    N = 64 * S
    A = rng.standard_normal((N, N + 16)).astype(np.float32)
    K = A @ A.T / N + 0.5 * np.eye(N, dtype=np.float32)
    L_ref = np.linalg.cholesky(K)
    L = np.asarray(dist_cholesky(mesh, jnp.asarray(K)))
    np.testing.assert_allclose(np.tril(L), L_ref, rtol=2e-4, atol=2e-5)
    W = np.asarray(dist_tri_inv(mesh, jnp.asarray(L)))
    W_ref = sla.solve_triangular(L_ref, np.eye(N), lower=True)
    err = np.abs(W - W_ref).max() / np.abs(W_ref).max()
    assert err < 5e-5, err


@pytest.mark.parametrize("num_pilot", [0, 4])
def test_sharded_mi_distributed_seed_matches_single_device(rng, num_pilot):
    """The FULLY distributed pipeline (seed factorization + pilots +
    greedy loop all in one shard_map, O(N²/S)/chip) vs single-chip."""
    from algp_tpu.parallel.sharded_mi import sharded_greedy_select_mi

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, noise=0.15)
    x = jnp.asarray(rng.uniform(0, 12, (300, 2)), jnp.float32)
    nv = jnp.full((300,), 0.15**2, jnp.float32)
    pilot = (jnp.asarray([0, 100, 100, 200], jnp.int32)[:num_pilot]
             if num_pilot else jnp.zeros((0,), jnp.int32))
    mesh = make_mesh(8)
    r_d = sharded_greedy_select_mi(
        mesh, spec, params, x, nv, pilot, rounds=15, num_pilot=num_pilot,
        distributed_seed=True,
    )
    r_1 = acq.greedy_select(
        spec, params, x, nv, pilot, rounds=15, num_pilot=num_pilot,
        strategy="mi",
    )
    np.testing.assert_array_equal(
        np.asarray(r_d.selected), np.asarray(r_1.selected)
    )
    np.testing.assert_allclose(
        np.asarray(r_d.post_var), np.asarray(r_1.post_var), atol=2e-4
    )


def test_sharded_lowrank_mi_matches_single_device_and_oracle(rng):
    """The shard_map low-rank MI loop must reproduce the single-device
    low-rank path index-for-index on a tie-free field — and hence the
    low-rank f64 oracle."""
    import oracle
    from algp_tpu import acquisition_lowrank as lr
    from algp_tpu.parallel import sharded_greedy_select_mi_lowrank

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.4, noise=0.12)
    n = 260
    x_np = rng.uniform(0, 11, (n, 2))
    x = jnp.asarray(x_np, jnp.float32)
    nv = jnp.full((n,), 0.12**2, jnp.float32)
    pilot = np.array([3, 77, 3, 201], np.int32)  # incl. a duplicate
    zidx = np.asarray(lr.kcenter_indices(x, 64))
    z = x[jnp.asarray(zidx)]
    mesh = make_mesh(8)
    r_s = sharded_greedy_select_mi_lowrank(
        mesh, spec, params, x, nv, jnp.asarray(pilot), z,
        rounds=15, num_pilot=4,
    )
    r_1 = lr.greedy_select_lowrank(
        spec, params, x, nv, jnp.asarray(pilot), z,
        rounds=15, num_pilot=4,
    )
    np.testing.assert_array_equal(
        np.asarray(r_s.selected), np.asarray(r_1.selected)
    )
    np.testing.assert_allclose(
        np.asarray(r_s.post_var), np.asarray(r_1.post_var),
        rtol=2e-3, atol=2e-3,
    )
    K = oracle.gram(x_np, x_np, ls_spatial=2.0, outputscale=1.4)
    sel_ref, _ = oracle.greedy_mi_selection_lowrank(
        K, zidx, 0.12**2, 15, pilot
    )
    np.testing.assert_array_equal(np.asarray(r_s.selected), sel_ref)
