"""Per-shard RESIDENCY certification for the sharded episode machinery
(round-3 VERDICT weak #3 / next #3).

The index-equality tests (test_sharded.py) prove the mesh episode makes
the same decisions as a single chip; these tests prove the point of the
sharding — that the big buffers actually LIVE at O(N²/S) / O(N·M/S) /
O(N/S) rows per device and are not silently replicated.  On a 1-chip
environment this shape introspection over the virtual 8-CPU mesh is the
strongest available substitute for real multi-chip memory profiling:
`jax.Array.addressable_shards` reports exactly what each device holds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device CPU mesh"
)


def _per_shard_shapes(arr):
    """(num distinct devices, the common per-shard data shape)."""
    shards = arr.addressable_shards
    shapes = {s.data.shape for s in shards}
    assert len(shapes) == 1, f"ragged shards: {shapes}"
    return len({s.device for s in shards}), shapes.pop()


def _grid_mesh():
    # all 8 devices on the 'grid' axis — the candidate-sharding axis the
    # residency claims are about
    return make_mesh(8, restarts_axis=1)


def test_exact_w_seed_lives_at_n2_over_s_per_shard(rng):
    """sharded_precision_seed's W = L⁻¹ strip must be rows-sharded:
    (N/S, N) per device — the O(N²/S) residency claim of
    parallel/sharded_episode.py.  A silent replication (N, N) per device
    fails here."""
    from algp_tpu.parallel import sharded_episode as sep

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=2.0, outputscale=1.2, noise=0.15)
    N, S = 2048, 8
    x = jnp.asarray(rng.uniform(0, 40, (N, 2)), jnp.float32)
    mesh = _grid_mesh()
    W = sep.sharded_precision_seed(mesh, spec, params, x)
    assert W.shape == (N, N)
    assert not W.sharding.is_fully_replicated
    n_dev, shard_shape = _per_shard_shapes(W)
    assert n_dev == S
    assert shard_shape == (N // S, N)


def test_lowrank_seed_lives_at_nm_over_s_per_shard(rng):
    """sharded_lowrank_seed's VT/dinv/pdiag must be rows-sharded:
    (N/S, M) / (N/S,) per device — the O(N·M/S) residency claim — at an
    N (32k) where the exact strip would already be 4 GB."""
    from algp_tpu.parallel import sharded_episode as sep

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=6.0, outputscale=1.0, noise=0.1)
    N, M, S = 32768, 64, 8
    x = jnp.asarray(rng.uniform(0, 180, (N, 2)), jnp.float32)
    z = x[jnp.asarray(np.linspace(0, N - 1, M).round().astype(np.int64))]
    mesh = _grid_mesh()
    lr = sep.sharded_lowrank_seed(mesh, spec, params, x, z)
    for arr, shape in ((lr.VT, (N // S, M)), (lr.dinv, (N // S,)),
                       (lr.pdiag, (N // S,))):
        assert not arr.sharding.is_fully_replicated
        n_dev, shard_shape = _per_shard_shapes(arr)
        assert n_dev == S
        assert shard_shape == shape


def test_sharded_step_fields_stay_sharded_at_n_over_s(rng):
    """The fused step's O(N) outputs (posterior mean/variance) must come
    back sharded at (N/S,) per device — the episode's per-step sync
    reads only the replicated scalars, never a gathered field."""
    from algp_tpu.parallel import sharded_episode as sep

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=6.0, outputscale=1.0, noise=0.1)
    N, M, S, cap, P, k = 32768, 64, 8, 32, 8, 4
    x = jnp.asarray(rng.uniform(0, 180, (N, 2)), jnp.float32)
    z = x[jnp.asarray(np.linspace(0, N - 1, M).round().astype(np.int64))]
    mesh = _grid_mesh()
    lr = sep.sharded_lowrank_seed(mesh, spec, params, x, z)

    sampled = rng.choice(N, 12, replace=False).astype(np.int32)
    idx_pad = jnp.asarray(np.pad(sampled, (0, cap - 12)))
    count = jnp.asarray(12, jnp.int32)
    ns_pad = jnp.ones((cap,), jnp.float32)
    y_pad = jnp.asarray(
        np.pad(rng.standard_normal(12).astype(np.float32), (0, cap - 12))
    )
    sets = jnp.asarray(rng.integers(0, N, (P, k)).astype(np.int32))
    sizes = jnp.asarray(np.full(P, k, np.int32))
    costs = jnp.asarray(rng.uniform(2, 9, P).astype(np.float32))

    best, mean, var, scores = sep.sharded_plan_episode_step(
        mesh, spec, params, x, idx_pad, count, ns_pad, y_pad,
        sets, sizes, costs, lr=lr, strategy="mi",
    )
    for arr in (mean, var):
        assert arr.shape == (N,)
        assert not arr.sharding.is_fully_replicated
        n_dev, shard_shape = _per_shard_shapes(arr)
        assert n_dev == S
        assert shard_shape == (N // S,)
    # the decision itself is replicated (a few bytes — what the host
    # actually syncs on)
    assert best.sharding.is_fully_replicated
    assert int(best) >= 0


def test_mesh_episode_agent_keeps_seed_sharded_across_steps():
    """Residency through the REAL driver: after Agent(mesh=...) runs, the
    per-refit precision seed it cached (and re-uses across steps) must
    still be rows-sharded — the episode never gathers it."""
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    cfg = dataclasses.replace(
        base,
        field=dataclasses.replace(base.field, num_rows=8, num_cols=12,
                                  seed=3),
        acquisition=dataclasses.replace(base.acquisition, strategy="mi",
                                        num_inducing=24),
        episode=dataclasses.replace(base.episode, num_pilot=10, budget=30.0,
                                    samples_per_step=5, refit_every=2,
                                    device_metrics=True, seed=1),
    )
    mesh = make_mesh(8)  # the driver default: restarts×grid
    S = mesh.shape["grid"]
    agent = Agent(FieldEnv(cfg.field, cfg.kernel), cfg, mesh=mesh)
    result = agent.run(max_steps=3)
    assert result.state.step >= 2
    lr = agent._lr_cache[1]
    n_pad = agent._mesh_x().shape[0]
    assert n_pad % S == 0
    for arr, shape in ((lr.VT, (n_pad // S, 24)), (lr.dinv, (n_pad // S,))):
        assert not arr.sharding.is_fully_replicated
        # every device (grid shards × the restarts replicas) holds
        # exactly N/S rows — the O(N·M/S)-per-chip claim
        n_dev, shard_shape = _per_shard_shapes(arr)
        assert n_dev == len(mesh.devices.ravel())
        assert shard_shape == shape


def test_ensemble_seed_lives_at_knm_over_s_per_shard(rng):
    """The z-ensemble's stacked seed: (K, N/S, M) per device — K
    replicated designs, rows still sharded (O(K·N·M/S))."""
    from algp_tpu.parallel import sharded_episode as sep

    spec = KernelSpec("rbf", ds=2)
    params = spec.init_params(ls_spatial=6.0, outputscale=1.0, noise=0.1)
    N, M, S, K = 8192, 32, 8, 3
    x = jnp.asarray(rng.uniform(0, 90, (N, 2)), jnp.float32)
    picks = [np.linspace(j, N - 1, M).round().astype(np.int64)
             for j in range(K)]
    z_all = jnp.stack([x[jnp.asarray(pk)] for pk in picks])
    mesh = _grid_mesh()
    lr = sep.sharded_lowrank_seed(mesh, spec, params, x, z_all)
    for arr, shape in ((lr.VT, (K, N // S, M)), (lr.dinv, (K, N // S))):
        assert not arr.sharding.is_fully_replicated
        n_dev, shard_shape = _per_shard_shapes(arr)
        assert n_dev == S
        assert shard_shape == shape
