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


# ---------------------------------------------------------------------------
# Fused (WᵀW)[:, j] — the Krause-MI per-round precision column
# ---------------------------------------------------------------------------


def _wtw_col_kernel(tile: int, j_ref, w_ref, wblk_ref, out_ref):
    ii = pl.program_id(0)
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # tiles strictly above the diagonal of lower-triangular W contribute 0
    @pl.when(ki >= ii)
    def _():
        # TPU blocks must be 128-wide: wblk is the 128-lane group holding
        # column j; mask-select that lane into a (Tk, 1) vector
        lane = j_ref[0] % 128
        lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
        wcol = jnp.sum(
            jnp.where(lanes == lane, wblk_ref[...], 0.0),
            axis=1, keepdims=True,
        )  # (Tk, 1)
        # (1, Tk) @ (Tk, Ti) on the MXU
        out_ref[...] += jax.lax.dot_general(
            wcol, w_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _wtw_col_dma_kernel(tile: int, nb: int, j_ref, w_hbm, out_ref,
                        wt_buf, wc_buf, sems):
    """Manual-DMA variant: stream ONLY k-tiles ≥ max(row-tile, j-tile).

    The BlockSpec-grid version fetches every W tile and merely skips the
    compute above the diagonal — HBM traffic is the bottleneck, so the
    skipped fetches are the cost.  Here each output tile's program runs a
    double-buffered fori over exactly the contributing k-tiles (k ≥ i and
    k ≥ j, else W[k,i]·W[k,j] ≡ 0 for lower-triangular W), halving traffic.
    """
    ii = pl.program_id(0)
    j = j_ref[0]
    jb = j // 128
    lane = j % 128
    k0 = jnp.maximum(ii, j // tile)

    def get_w(slot, ki):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(ki * tile, tile), pl.ds(ii * tile, tile)],
            wt_buf.at[slot],
            sems.at[slot, 0],
        )

    def get_c(slot, ki):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(ki * tile, tile), pl.ds(jb * 128, 128)],
            wc_buf.at[slot],
            sems.at[slot, 1],
        )

    out_ref[...] = jnp.zeros_like(out_ref)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)

    get_w(0, k0).start()
    get_c(0, k0).start()

    def body(t, _):
        ki = k0 + t
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(ki + 1 < nb)
        def _():
            get_w(nxt, ki + 1).start()
            get_c(nxt, ki + 1).start()

        get_w(slot, ki).wait()
        get_c(slot, ki).wait()
        wcol = jnp.sum(
            jnp.where(lanes == lane, wc_buf[slot], 0.0),
            axis=1, keepdims=True,
        )
        out_ref[...] += jax.lax.dot_general(
            wcol, wt_buf[slot],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nb - k0, body, 0)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def wtw_column_streamed(
    W: jax.Array,
    j: jax.Array,
    *,
    tile: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """(WᵀW)[:, j] fetching only contributing tiles via manual DMA."""
    if interpret is None:
        interpret = not _on_tpu()
    N = W.shape[0]
    assert N % tile == 0, f"needs aligned N, got {N} % {tile}"
    nb = N // tile
    out = pl.pallas_call(
        partial(_wtw_col_dma_kernel, tile, nb),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, tile), lambda ii, j_ref: (0, ii),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, tile, tile), jnp.float32),
                pltpu.VMEM((2, tile, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=N * N, bytes_accessed=4 * (N * N // 2 + 2 * N),
            transcendentals=0,
        ),
    )(j.reshape(1).astype(jnp.int32), W)
    return out[0]


@partial(jax.jit, static_argnames=("tile", "interpret"))
def wtw_column(
    W: jax.Array,
    j: jax.Array,
    *,
    tile: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """(WᵀW)[:, j] for lower-triangular W, in ONE pass over W.

    The naive XLA form needs two full matvec passes (w = W e_j, then
    wᵀW ⇒ 2×|W| HBM traffic).  Here the w-column tile (T,1) is fetched
    directly via scalar-prefetch *data-dependent block indexing* — the
    BlockSpec index map reads j from SMEM — and each (i-tile, k-tile)
    program accumulates w_kᵀ·W_block on the MXU into the output row
    vector, with strictly-above-diagonal tiles skipped.  One |W| pass,
    ~2× less traffic per MI round.  Requires N % tile == 0 (callers keep
    the candidate axis 256-aligned).
    """
    if interpret is None:
        interpret = not _on_tpu()
    N = W.shape[0]
    assert N % tile == 0, f"wtw_column needs aligned N, got {N} % {tile}"
    nb = N // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, nb),  # (ii, ki): ki minor ⇒ contiguous output revisits
        in_specs=[
            pl.BlockSpec(
                (tile, tile), lambda ii, ki, j_ref: (ki, ii),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 128), lambda ii, ki, j_ref: (ki, j_ref[0] // 128),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile), lambda ii, ki, j_ref: (0, ii), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        partial(_wtw_col_kernel, tile),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=N * N, bytes_accessed=4 * (N * N // 2 + 2 * N),
            transcendentals=0,
        ),
    )(j.reshape(1).astype(jnp.int32), W, W)
    return out[0]


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
