"""Fused Pallas update kernels for the acquisition loop's hot state.

The Krause-MI greedy loop updates a 400 MB (N×N) complement-precision
matrix every round: P' = P − u uᵀ/P_jj with row/col j zeroed and the diag
marker set (ops/linalg.py:precision_delete).  As separate XLA ops this is
~3 passes over HBM (≈3.5 ms/round measured at N=10k on a v5e); the Pallas
kernel below fuses subtract+mask+mark into ONE pass and aliases the input
buffer (`input_output_aliases`), so each round moves exactly read+write =
2×400 MB — the bandwidth floor for an in-place rank-1 update.

The candidate-column vector u = P[:, j] is sliced outside (one 40 KB
strided read) and enters twice with different block layouts — (T,1) tiles
for the row factor, (1,T) tiles for the column factor — so the outer
product is a pure 2-D VPU broadcast per tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _pdelete_kernel(tile: int, j_ref, inv_ref, ui_ref, uk_ref, p_ref, out_ref):
    i = pl.program_id(0)
    k = pl.program_id(1)
    ui = ui_ref[...]  # (T, 1)
    uk = uk_ref[...]  # (1, T)
    upd = p_ref[...] - (ui * inv_ref[0]) * uk
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) + i * tile
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1) + k * tile
    j = j_ref[0]
    on_j = jnp.logical_or(rows == j, cols == j)
    upd = jnp.where(on_j, 0.0, upd)
    upd = jnp.where(jnp.logical_and(rows == j, cols == j), 1.0, upd)
    out_ref[...] = upd


@partial(jax.jit, static_argnames=("tile", "interpret"), donate_argnums=(0,))
def precision_delete_fused(
    P: jax.Array,
    j: jax.Array,
    pjj: jax.Array,
    u: jax.Array,
    *,
    tile: int = _TILE,
    interpret: bool | None = None,
) -> jax.Array:
    """One-pass in-place Schur delete of point j from precision P.

    Semantically identical to ops.linalg.precision_delete(P, j) given
    u = P[:, j] and pjj = P[j, j]; P is donated and updated in place.
    """
    if interpret is None:
        interpret = not _on_tpu()
    N = P.shape[0]
    grid = (pl.cdiv(N, tile), pl.cdiv(N, tile))
    inv = (1.0 / pjj).reshape(1).astype(P.dtype)
    j_arr = j.reshape(1).astype(jnp.int32)
    ui = u[:, None]
    uk = u[None, :]
    return pl.pallas_call(
        partial(_pdelete_kernel, tile),
        out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 1), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda i, k: (i, k), memory_space=pltpu.VMEM
        ),
        input_output_aliases={4: 0},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * N * N, bytes_accessed=8 * N * N, transcendentals=0
        ),
    )(j_arr, inv, ui, uk, P)
