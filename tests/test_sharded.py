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


def test_sharded_fit_icm_matches_single_device(rng):
    """The coregionalized (ICM) multi-restart fit sharded over the
    'restarts' mesh axis must reproduce the single-device fit — same
    per-restart NLLs, same winning restart — including under a
    per-(plot, trait) observation mask; a restart count that does not
    divide the axis falls back to replication and must still match."""
    from algp_tpu.models import coregional as icm
    from algp_tpu.parallel import sharded_fit_icm

    spec = KernelSpec("rbf", ds=2)
    n, T = 48, 3
    x = jnp.asarray(rng.uniform(0, 10, (n, 2)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, T)), jnp.float32)
    obs = jnp.asarray(rng.uniform(size=(n, T)) < 0.7)
    key = jax.random.PRNGKey(1)
    mesh = make_mesh(8)
    for restarts in (4, 3):  # 3 does not divide the 2-wide restarts axis
        cfg = FitConfig(iters=25, restarts=restarts)
        r_1 = icm.fit_icm(spec, cfg, x, Y, obs, key=key, rank=1)
        r_s = sharded_fit_icm(mesh, spec, cfg, x, Y, obs, key=key, rank=1)
        np.testing.assert_allclose(
            np.asarray(r_s.all_nlls), np.asarray(r_1.all_nlls),
            rtol=1e-4, atol=1e-4,
        )
        assert int(r_s.best_restart) == int(r_1.best_restart)
        for a, b in zip(
            jax.tree_util.tree_leaves(r_s.params),
            jax.tree_util.tree_leaves(r_1.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


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


# ---------------------------------------------------------------------------
# Config-5 EPISODE over the mesh (round-2 VERDICT missing #1)
# ---------------------------------------------------------------------------


def _episode_cfg(strategy, num_inducing, device_metrics, modality="precise",
                 path_utility="per_cost", mi_ensemble=1):
    import dataclasses

    from algp_tpu.config import PRESETS

    base = PRESETS["c5_episode"]
    fieldc = dataclasses.replace(base.field, num_rows=8, num_cols=12, seed=3)
    acqc = dataclasses.replace(
        base.acquisition, strategy=strategy, num_inducing=num_inducing,
        path_utility=path_utility, mi_ensemble=mi_ensemble,
    )
    epc = dataclasses.replace(
        base.episode, num_pilot=10, budget=30.0, samples_per_step=5,
        refit_every=2, device_metrics=device_metrics, modality=modality,
        seed=1,
    )
    return dataclasses.replace(base, field=fieldc, acquisition=acqc,
                               episode=epc)


@pytest.mark.parametrize(
    "strategy,num_inducing,device_metrics,path_utility",
    [
        ("mi", 0, False, "per_cost"),   # exact W (distributed strip seed)
        ("mi", 24, True, "per_cost"),   # low-rank VT/dinv, device metrics
        ("entropy", 0, True, "per_cost"),
        ("mi", 24, True, "per_sample"),  # yield-aware utility over the mesh
    ],
)
def test_sharded_episode_matches_single_device(
    strategy, num_inducing, device_metrics, path_utility
):
    """A FULL multi-step config-5 episode driven through the sharded
    per-step program (Agent(mesh=...)) must choose the same paths
    index-for-index as the single-device episode and log the same
    metrics (to f32 cross-shard reduction tolerance).  This is the
    capability `parallel/sharded_lowrank.py` exists for — the 1M-point
    episode whose low-rank factor only fits a MESH's combined HBM."""
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    cfg = _episode_cfg(strategy, num_inducing, device_metrics,
                       path_utility=path_utility)
    r1 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=4)
    mesh = make_mesh(8)
    r2 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg, mesh=mesh).run(
        max_steps=4
    )
    np.testing.assert_array_equal(
        r1.state.sampled_idx, r2.state.sampled_idx
    )
    assert len(r1.history) == len(r2.history)
    for h1, h2 in zip(r1.history, r2.history):
        for k in ("rmse", "rmse_test", "mean_var"):
            if k in h1:  # the trailing "final" fetch record has no metrics
                np.testing.assert_allclose(h1[k], h2[k], rtol=5e-4,
                                           atol=5e-5)
    np.testing.assert_allclose(r1.rmse, r2.rmse, rtol=5e-4)
    np.testing.assert_allclose(r1.mean, r2.mean, rtol=5e-3, atol=5e-4)


def test_sharded_episode_mixed_modality_matches(rng):
    """The mixed-modality policy consumes the chosen path's site
    variances from the step's device-reduced read — the mesh episode
    must pick the same precise-sensor site."""
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    cfg = _episode_cfg("mi", 24, True, modality="mixed")
    r1 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=3)
    r2 = Agent(
        FieldEnv(cfg.field, cfg.kernel), cfg, mesh=make_mesh(8)
    ).run(max_steps=3)
    np.testing.assert_array_equal(r1.state.sampled_idx, r2.state.sampled_idx)
    np.testing.assert_array_equal(r1.state.noise_scale, r2.state.noise_scale)


def test_sharded_plan_step_lowrank_matches_single(rng):
    """Step-level: the sharded fused plan program reproduces
    plan_episode_step_lowrank's choice and posterior fields."""
    import jax.numpy as jnp

    from algp_tpu import acquisition_lowrank as acq_lr
    from algp_tpu.parallel import sharded_episode as sep

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.3, noise=0.12)
    n, cap, S_sets, k = 220, 16, 12, 5
    x = jnp.asarray(rng.uniform(0, 11, (n, 2)), jnp.float32)
    idx = rng.choice(n, 10, replace=False).astype(np.int32)
    idx_pad = jnp.asarray(np.pad(idx, (0, cap - 10)))
    count = jnp.asarray(10, jnp.int32)
    ns_pad = jnp.asarray(
        np.pad(rng.uniform(1.0, 4.0, 10).astype(np.float32),
               (0, cap - 10), constant_values=1.0)
    )
    y_pad = jnp.asarray(
        np.pad(rng.standard_normal(10).astype(np.float32), (0, cap - 10))
    )
    sets = jnp.asarray(
        rng.integers(0, n, (S_sets, k)).astype(np.int32)
    )
    sizes = jnp.asarray(
        rng.integers(1, k + 1, S_sets).astype(np.int32)
    )
    costs = jnp.asarray(rng.uniform(2.0, 6.0, S_sets).astype(np.float32))
    z = x[acq_lr.kcenter_indices(x, 32)]

    lr1 = acq_lr.lowrank_seed_with_z(spec, params, x, z)
    b1, mean1, d1, s1 = acq_lr.plan_episode_step_lowrank(
        spec, params, x, idx_pad, count, ns_pad, y_pad, sets, sizes,
        costs, lr1,
    )

    mesh = make_mesh(8)
    xp, n_valid = sep.mesh_pad(x, mesh.shape["grid"])
    lr2 = sep.sharded_lowrank_seed(mesh, spec, params, xp, z)
    b2, mean2, d2, s2 = sep.sharded_plan_episode_step(
        mesh, spec, params, xp, idx_pad, count, ns_pad, y_pad, sets,
        sizes, costs, lr=lr2, strategy="mi", n_valid=n_valid,
    )
    assert int(b1) == int(b2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2)[:n],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2)[:n],
                               rtol=2e-4, atol=2e-5)


def test_sharded_episode_z_ensemble_matches_single_device():
    """The z-ENSEMBLE episode over the mesh: K stacked seeds built
    sharded (O(K·N·M/S) per chip), the in-shard scoring vmapped over K
    with batched collectives — decisions must match the single-chip
    ensemble episode index-for-index."""
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    cfg = _episode_cfg("mi", 24, True, mi_ensemble=3)
    r1 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=4)
    r2 = Agent(
        FieldEnv(cfg.field, cfg.kernel), cfg, mesh=make_mesh(8)
    ).run(max_steps=4)
    np.testing.assert_array_equal(r1.state.sampled_idx, r2.state.sampled_idx)
    for h1, h2 in zip(r1.history, r2.history):
        for k in ("rmse", "rmse_test", "mean_var"):
            if k in h1:
                np.testing.assert_allclose(h1[k], h2[k], rtol=5e-4,
                                           atol=5e-5)


def test_sharded_episode_matches_single_under_matmul_conditioning(monkeypatch):
    """Force the ≥1M conditioning fast path (acq.COND_MATMUL_N = 1 →
    tri_inv-matmul in both the single-chip and in-shard conditioning)
    and re-assert mesh ≡ single-chip episode equality — the gate keys
    on the GLOBAL candidate count on both sides, and this is the only
    CI coverage the in-shard matmul branch gets (real gated sizes need
    a 1M-point mesh)."""
    import jax

    from algp_tpu import acquisition as acq
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    monkeypatch.setattr(acq, "COND_MATMUL_N", 1)
    jax.clear_caches()
    try:
        cfg = _episode_cfg("mi", 24, True)
        r1 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=4)
        mesh = make_mesh(8)
        rm = Agent(FieldEnv(cfg.field, cfg.kernel), cfg,
                   mesh=mesh).run(max_steps=4)
        np.testing.assert_array_equal(r1.state.sampled_idx,
                                      rm.state.sampled_idx)
        assert rm.rmse_test == pytest.approx(r1.rmse_test, abs=2e-3)
        # exact-W path too (sharded_mi's in-shard pilot conditioning
        # carries its own copy of the gate)
        cfg = _episode_cfg("mi", 0, False)
        r1 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run(max_steps=3)
        rm = Agent(FieldEnv(cfg.field, cfg.kernel), cfg,
                   mesh=mesh).run(max_steps=3)
        np.testing.assert_array_equal(r1.state.sampled_idx,
                                      rm.state.sampled_idx)
        # standalone dist-seed selector (sharded_mi carries its own
        # copy of the gate in its in-shard pilot conditioning)
        from algp_tpu.parallel.sharded_mi import sharded_greedy_select_mi

        rng2 = np.random.default_rng(0)
        spec = KernelSpec("rbf", ds=2)
        params = spec.init_params(ls_spatial=2.0, noise=0.15)
        x = jnp.asarray(rng2.uniform(0, 12, (300, 2)), jnp.float32)
        nv = jnp.full((300,), 0.15**2, jnp.float32)
        pilot = jnp.asarray([0, 100, 200], jnp.int32)
        r_d = sharded_greedy_select_mi(
            mesh, spec, params, x, nv, pilot, rounds=10, num_pilot=3,
            distributed_seed=True,
        )
        r_1 = acq.greedy_select(
            spec, params, x, nv, pilot, rounds=10, num_pilot=3,
            strategy="mi",
        )
        np.testing.assert_array_equal(
            np.asarray(r_d.selected), np.asarray(r_1.selected)
        )
    finally:
        jax.clear_caches()
