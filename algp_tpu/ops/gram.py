"""Tiled Pallas Gram-matrix kernels — K(X1, X2) straight to HBM.

BASELINE.json:5 mandate: *"kernel Gram-matrix construction (RBF/Matérn over
spatial + feature inputs) becomes tiled Pallas kernels writing straight to
HBM"*.  The reference builds its Gram with full-tensor torch broadcasting
(SURVEY.md §2 C2), materialising O(n²·d) intermediates; here each 256×256
output tile is produced by one grid program that streams its result to HBM
and never materialises anything bigger than a (T, T) VPU register tile.

Layout choices (see /opt/skills/guides/pallas_guide.md):
  * X1 is passed in row layout (n1, d_pad) and X2 *transposed* (d_pad, n2):
    per coordinate k the tile computes (x1[:, k:k+1] − x2ᵀ[k:k+1, :])² —
    a pure 2-D broadcast on the VPU, no 3-D relayouts, no gathers (Mosaic
    cannot lower strided 3-D gathers).  d is padded to the f32 sublane
    quantum (8); padded coordinates are zero on both sides and contribute
    nothing to the distance.
  * Distances use the direct-difference form, not |a|²+|b|²−2ab: d is tiny
    (2 spatial + a few feature dims) so the VPU cost is negligible, and the
    direct form avoids f32 cancellation — load-bearing for the
    bitwise-consistent-selection contract (BASELINE.json:5).
  * ARD lengthscales are folded into the inputs on the XLA side
    (x · e^{-log ℓ}), so tiles only square-difference, reduce, and apply
    the stationary closed form; the output scale arrives via SMEM.
  * spatial × feature composite kernels reduce the two coordinate segments
    separately inside the same tile program and multiply the two forms —
    one fused pass over the output, no second Gram.

Falls back to interpreter mode off-TPU (CI runs on a virtual CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from algp_tpu.ops.kernels import KernelParams, KernelSpec, stationary_form

_TILE = 256
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _tile_sqdist(a_ref, bt_ref, dims: int):
    """Σ_k (a[:, k, None] − bᵀ[None, k, :])² as `dims` 2-D VPU broadcasts.

    a_ref: (T, d_pad) row-layout block of X1; bt_ref: (d_pad, T) transposed
    block of X2.  `dims` is the static number of real coordinates.
    """
    a = a_ref[...]
    bt = bt_ref[...]
    acc = None
    for k in range(dims):
        diff = a[:, k : k + 1] - bt[k : k + 1, :]  # (T, T)
        sq = diff * diff
        acc = sq if acc is None else acc + sq
    return acc


def _gram_kernel_spatial(spec: KernelSpec, s_ref, x1_ref, x2t_ref, out_ref):
    r2 = _tile_sqdist(x1_ref, x2t_ref, spec.ds)
    out_ref[...] = s_ref[0] * stationary_form(spec.spatial_kind, r2)


def _gram_kernel_composite(
    spec: KernelSpec, s_ref, x1s_ref, x2st_ref, x1f_ref, x2ft_ref, out_ref
):
    r2s = _tile_sqdist(x1s_ref, x2st_ref, spec.ds)
    r2f = _tile_sqdist(x1f_ref, x2ft_ref, spec.df)
    out_ref[...] = (
        s_ref[0]
        * stationary_form(spec.spatial_kind, r2s)
        * stationary_form(spec.feature_kind, r2f)
    )


def _prep_rows(x: jax.Array, log_ls: jax.Array, n_pad: int) -> jax.Array:
    """Scale by inverse lengthscales, pad to (n_pad, d_pad) row layout."""
    xs = x * jnp.exp(-log_ls)[None, :]
    d = xs.shape[1]
    d_pad = _round_up(max(d, 1), _SUBLANE)
    return jnp.pad(xs, ((0, n_pad - xs.shape[0]), (0, d_pad - d))).astype(
        jnp.float32
    )


def _prep_cols(x: jax.Array, log_ls: jax.Array, n_pad: int) -> jax.Array:
    """Scale by inverse lengthscales, pad + transpose to (d_pad, n_pad)."""
    return _prep_rows(x, log_ls, n_pad).T


@partial(jax.jit, static_argnames=("spec", "tile", "interpret"))
def gram_pallas(
    spec: KernelSpec,
    params: KernelParams,
    x1: jax.Array,
    x2: jax.Array,
    *,
    tile: int = _TILE,
    interpret: bool | None = None,
) -> jax.Array:
    """Cross-covariance K(X1, X2), (n1, n2), built tile-by-tile on device.

    Equivalent to `ops.kernels.gram` (tested against it and the f64 oracle);
    use this for the large candidate-grid Grams (N≈10k ⇒ 400 MB f32 output
    that should never round-trip through XLA broadcast temporaries).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n1, n2 = x1.shape[0], x2.shape[0]
    n1p, n2p = _round_up(n1, tile), _round_up(n2, tile)
    scale = jnp.exp(params.log_outputscale).reshape(1).astype(jnp.float32)

    grid = (n1p // tile, n2p // tile)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def row_spec(d_pad):
        return pl.BlockSpec(
            (tile, d_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        )

    def col_spec(d_pad):
        return pl.BlockSpec(
            (d_pad, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )

    if spec.df == 0:
        x1r = _prep_rows(x1[:, : spec.ds], params.log_ls_spatial, n1p)
        x2c = _prep_cols(x2[:, : spec.ds], params.log_ls_spatial, n2p)
        kern = partial(_gram_kernel_spatial, spec)
        in_specs = [smem_spec, row_spec(x1r.shape[1]), col_spec(x2c.shape[0])]
        args = (scale, x1r, x2c)
    else:
        x1s = _prep_rows(x1[:, : spec.ds], params.log_ls_spatial, n1p)
        x2s = _prep_cols(x2[:, : spec.ds], params.log_ls_spatial, n2p)
        x1f = _prep_rows(x1[:, spec.ds :], params.log_ls_feature, n1p)
        x2f = _prep_cols(x2[:, spec.ds :], params.log_ls_feature, n2p)
        kern = partial(_gram_kernel_composite, spec)
        in_specs = [
            smem_spec,
            row_spec(x1s.shape[1]),
            col_spec(x2s.shape[0]),
            row_spec(x1f.shape[1]),
            col_spec(x2f.shape[0]),
        ]
        args = (scale, x1s, x2s, x1f, x2f)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n1p, n2p), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * spec.dim * n1p * n2p,
            bytes_accessed=4 * (n1p * n2p + spec.dim * (n1p + n2p)),
            transcendentals=n1p * n2p,
        ),
    )(*args)
    return out[:n1, :n2]


def gram_pallas_with_noise(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    noise_scale: jax.Array | None = None,
    *,
    tile: int = _TILE,
    interpret: bool | None = None,
) -> jax.Array:
    """K(X, X) + diag noise, Pallas-tiled.  Heteroscedastic via noise_scale."""
    K = gram_pallas(spec, params, x, x, tile=tile, interpret=interpret)
    nv = params.noise_var
    if noise_scale is not None:
        nv = nv * noise_scale
    n = x.shape[0]
    return K + jnp.eye(n, dtype=K.dtype) * nv
