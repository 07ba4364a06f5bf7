"""Multi-chip scaling via jax.sharding — DP over restarts, TP over the grid.

The reference is strictly single-process with no distributed anything
(SURVEY.md §2.3); the natural parallel axes of this workload, mapped to a
TPU mesh (per the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert the collectives):

  * **restarts** (data-parallel): multi-restart MLL fitting is
    embarrassingly parallel — the vmapped restart batch shards across the
    'restarts' mesh axis; the only cross-device traffic is the final
    argmin (one tiny all-gather).
  * **grid** (tensor-parallel): candidate scoring state is sharded along
    the N candidate axis — X (N,d), noise (N,), posterior variance d (N,),
    the conditioning basis B (T,N) on its second axis.  For ENTROPY the
    shardings are *annotated*, not hand-scheduled: the same jitted loop
    from acquisition runs unchanged and GSPMD inserts the global-argmax /
    selected-column collectives over ICI.  For KRAUSE-MI (whose Pallas
    kernels GSPMD cannot partition) the loop is an explicit `shard_map`
    decomposition — see parallel.sharded_mi.  On one chip everything
    degrades to no-ops.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from algp_tpu import acquisition as acq
from algp_tpu.config import FitConfig
from algp_tpu.models import gp as gp_mod
from algp_tpu.ops.kernels import KernelSpec


def make_mesh(n_devices: Optional[int] = None,
              restarts_axis: Optional[int] = None) -> Mesh:
    """Build a 2-D (restarts × grid) device mesh.

    `restarts_axis` defaults to the largest power-of-two divisor ≤ 2 so
    most chips go to the grid axis (candidate scoring dominates FLOPs).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if restarts_axis is None:
        restarts_axis = 2 if n % 2 == 0 and n > 1 else 1
    grid_axis = n // restarts_axis
    arr = np.array(devs[: restarts_axis * grid_axis]).reshape(
        restarts_axis, grid_axis
    )
    return Mesh(arr, axis_names=("restarts", "grid"))


def sharded_fit(
    mesh: Mesh,
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale=None,
    key=None,
) -> gp_mod.FitResult:
    """Multi-restart MLL fit with restarts sharded across the mesh.

    Training data is replicated (it is tiny — the sampled set); the
    restart batch dimension of the init pytree is sharded, so each device
    subset runs its restarts locally and only the final NLL argmin is a
    collective.
    """
    inits = gp_mod.make_restart_inits(spec, cfg, key)
    rep = NamedSharding(mesh, P())
    shard_restarts = NamedSharding(mesh, P("restarts"))
    x = jax.device_put(x, rep)
    y = jax.device_put(y, rep)
    inits = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard_restarts), inits
    )
    if noise_scale is not None:
        noise_scale = jax.device_put(noise_scale, rep)
    return gp_mod._fit_jit(
        spec, cfg, x, y, noise_scale, inits, noise_scale is not None
    )


def sharded_fit_icm(
    mesh: Mesh,
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    Y: jax.Array,
    obs_mask=None,
    noise_scale=None,
    key=None,
    *,
    rank: int = 1,
):
    """Multi-restart coregionalized (ICM) fit with restarts sharded
    across the mesh — the multi-trait family's analog of `sharded_fit`.
    The (n, T) trait buffer and masks are replicated (tiny); only the
    restart-leading init pytree shards, so each device subset optimizes
    its restarts locally and the final NLL argmin is the one collective.
    """
    from algp_tpu.models import coregional as icm_mod

    return icm_mod.fit_icm(
        spec, cfg, x, Y, obs_mask, noise_scale, key, rank=rank, mesh=mesh
    )


def sharded_greedy_select(
    mesh: Mesh,
    spec: KernelSpec,
    params,
    x: jax.Array,
    nv: jax.Array,
    pilot_idx: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
    strategy: str = "entropy",
) -> acq.SelectionResult:
    """Greedy selection with the candidate axis sharded over 'grid'.

    entropy: the N-axis of every large buffer (X rows, noise, posterior
    variance, basis columns) is laid out across the grid axis; the jitted
    loop from acquisition.py runs under GSPMD, which turns the global
    argmax and the selected-column gathers into ICI collectives.

    mi: explicit shard_map decomposition of the implicit-precision passes
    (the single-chip Pallas kernels cannot be GSPMD-partitioned) — see
    parallel.sharded_mi.
    """
    if strategy == "mi":
        from algp_tpu.parallel.sharded_mi import sharded_greedy_select_mi

        return sharded_greedy_select_mi(
            mesh, spec, params, x, nv, pilot_idx,
            rounds=rounds, num_pilot=num_pilot,
        )
    shard_n = NamedSharding(mesh, P("grid"))
    shard_rows = NamedSharding(mesh, P("grid", None))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(x, shard_rows)
    nv = jax.device_put(nv, shard_n)
    pilot_idx = jax.device_put(pilot_idx, rep)
    return acq.greedy_select(
        spec, params, x, nv, pilot_idx,
        rounds=rounds, num_pilot=num_pilot, strategy=strategy,
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "rounds", "num_pilot"))
def _training_step_jit(spec, cfg, inits, x_train, y_train, x_grid, nv,
                       pilot_idx, rounds, num_pilot):
    """The full sharded training step as ONE jitted program:
    multi-restart fit → winning hyperparams → greedy selection round(s)."""
    fit_res = jax.vmap(
        lambda p0: gp_mod._fit_single(spec, cfg, x_train, y_train, None, p0)
    )(inits)
    best_p, best_nll, _ = fit_res
    k = jnp.argmin(best_nll)
    params = jax.tree_util.tree_map(lambda a: a[k], best_p)
    sel = acq._greedy_select_jit(
        spec, params, x_grid, nv, pilot_idx,
        jnp.asarray(num_pilot, jnp.int32),
        nv[pilot_idx],
        rounds=rounds, num_pilot=num_pilot, strategy="entropy",
        return_scores=False,
    )
    return params, best_nll, sel.selected, sel.post_var


def sharded_training_step(
    mesh: Mesh,
    spec: KernelSpec,
    cfg: FitConfig,
    x_train: jax.Array,
    y_train: jax.Array,
    x_grid: jax.Array,
    nv: jax.Array,
    pilot_idx: jax.Array,
    *,
    rounds: int = 4,
    strategy: str = "entropy",
    key=None,
):
    """Full DP(restarts) × TP(grid) training step over the mesh.

    This is the multi-chip entry the driver dry-runs (see
    __graft_entry__.dryrun_multichip): restart inits sharded over
    'restarts', all N-axis buffers sharded over 'grid'.  entropy runs
    fit + selection as ONE jit under GSPMD; mi runs the sharded fit then
    the shard_map MI loop (parallel.sharded_mi) — two device programs.
    """
    inits = gp_mod.make_restart_inits(spec, cfg, key)

    rep = NamedSharding(mesh, P())
    inits = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("restarts"))), inits
    )
    x_train = jax.device_put(x_train, rep)
    y_train = jax.device_put(y_train, rep)
    x_grid = jax.device_put(x_grid, NamedSharding(mesh, P("grid", None)))
    nv = jax.device_put(nv, NamedSharding(mesh, P("grid")))
    pilot_idx = jax.device_put(pilot_idx, rep)

    num_pilot = int(pilot_idx.shape[0])
    if strategy == "mi":
        fit_res = gp_mod._fit_jit(
            spec, cfg, x_train, y_train, None, inits, False
        )
        sel = sharded_greedy_select(
            mesh, spec, fit_res.params, x_grid, nv, pilot_idx,
            rounds=rounds, num_pilot=num_pilot, strategy="mi",
        )
        return fit_res.params, fit_res.all_nlls, sel.selected, sel.post_var
    return _training_step_jit(
        spec, cfg, inits, x_train, y_train, x_grid, nv, pilot_idx,
        rounds, num_pilot,
    )
