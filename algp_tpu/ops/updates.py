"""Fused Pallas update kernel for the acquisition loop's hot state.

The Krause-MI greedy loop needs the current precision column
u₀ = (WᵀW) eⱼ every round, where W = L⁻¹ is the 400 MB lower-triangular
seed factor resident in HBM.  The naive XLA form is two full matvec
passes (w = W eⱼ, then wᵀW ⇒ 2×|W| HBM traffic); a strided gather of
column j directly costs ~27 ms at N=10k (HBM hates strided columns).
The streamed kernel below makes one double-buffered manual-DMA pass over
only the *contributing* lower-triangle tiles — the per-round bandwidth
floor for this access pattern.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


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
