"""Distributed dense linear algebra over the mesh — O(N²/S) memory/chip.

The shard_map MI decomposition (parallel/sharded_mi.py) keeps the O(N³)
seed factorization replicated, which is the right call while W fits one
chip (~60k candidates).  These routines remove that ceiling for larger
fields: block right-looking Cholesky and block forward-substitution
triangular INVERSE where every shard holds only its (N/S, N) row strip
and panels move as psum/all_gather block broadcasts over ICI.

Design (panel = shard strip, so panel k ↔ shard k):

  dist Cholesky, k = 0..S−1 (static unroll):
    1. shard k's diagonal block D_k broadcasts (masked psum, (nl,nl));
    2. EVERY shard factors D_k locally (replicated small chol) and forms
       W_kk = L_kk⁻¹ — redundant compute beats a serialized owner step;
    3. panel solve: shards below the panel compute their rows of
       C = A[:, strip_k] · W_kkᵀ locally (one matmul);
    4. the panel column all_gathers ((N, nl) — Σ_k N·nl = N² total ICI
       traffic for the whole factorization) and every shard applies its
       local trailing update A_loc[:, later] −= C_loc · C_laterᵀ.

  dist triangular inverse (block forward substitution), k = 0..S−1:
    W_k = W_kk · [−L_k,<k W_<k | I | 0];  the panel's row block of L
    broadcasts, each earlier shard contributes its partial product via
    one psum, and only shard k writes its W strip.

Everything is plain JAX inside shard_map — collectives are psum /
all_gather, no Pallas — so the virtual CPU mesh validates it exactly.

Numerical note: the block algorithm's arithmetic differs from XLA's
fused cholesky at the last-ulp level, so selections seeded through it
match the f64 oracle (the real contract) but are not guaranteed
bit-identical to the single-chip path at exact score ties.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from algp_tpu.ops import linalg as la


def _bcast_from(shard_val, owner: int, axis: str, me):
    """Replicate `shard_val` from the owner shard (masked psum)."""
    return lax.psum(jnp.where(me == owner, shard_val, 0.0), axis)


def dist_cholesky_strip(A_loc, S: int, axis: str):
    """In-shard-map blocked Cholesky of a row-strip-sharded SPD matrix.

    A_loc: (nl, N) — this shard's rows.  Returns the same strip of the
    lower factor L (strict upper garbage zeroed).  Static unroll over the
    S panels; each panel costs one (nl,nl) broadcast + one (N,nl)
    all_gather + one local trailing matmul.
    """
    nl, N = A_loc.shape
    assert S * nl == N, (S, nl, N)
    me = lax.axis_index(axis)
    rows_g = me * nl + jnp.arange(nl)  # global row ids of this strip

    for k in range(S):
        c0 = k * nl
        D = _bcast_from(
            lax.dynamic_slice_in_dim(A_loc, c0, nl, axis=1), k, axis, me
        )  # (nl, nl) replicated — shard k's diagonal block
        L_kk = jnp.linalg.cholesky(D)
        W_kk = la.tri_inv(L_kk)
        # panel solve on rows BELOW the panel; shard k writes L_kk rows;
        # earlier strips keep their finished columns
        mine = lax.dynamic_slice_in_dim(A_loc, c0, nl, axis=1)
        below = jnp.dot(mine, W_kk.T, precision=lax.Precision.HIGHEST)
        in_panel = (rows_g >= c0) & (rows_g < c0 + nl)
        # shard k's strip gets L_kk at its own block row
        C_loc = jnp.where(
            (rows_g >= c0 + nl)[:, None], below,
            jnp.where(in_panel[:, None], jnp.where(me == k, L_kk, 0.0),
                      mine),
        )
        A_loc = lax.dynamic_update_slice(A_loc, C_loc, (0, c0))
        if k + 1 < S:
            Cg = lax.all_gather(C_loc, axis)  # (S, nl, nl-col block)
            C_later = Cg.reshape(N, nl)[c0 + nl:]  # rows below the panel
            rem = N - (c0 + nl)
            trail = lax.dynamic_slice_in_dim(A_loc, c0 + nl, rem, axis=1)
            upd = trail - jnp.dot(
                C_loc, C_later.T, precision=lax.Precision.HIGHEST
            )
            # only rows strictly below the panel carry live trailing data
            upd = jnp.where((rows_g >= c0 + nl)[:, None], upd, trail)
            A_loc = lax.dynamic_update_slice(A_loc, upd, (0, c0 + nl))

    # zero this strip's strict upper triangle (trailing junk)
    cols_g = jnp.arange(N)[None, :]
    return jnp.where(cols_g <= rows_g[:, None], A_loc, 0.0)


def dist_tri_inv_strip(L_loc, S: int, axis: str):
    """In-shard-map W = L⁻¹ for a row-strip-sharded lower factor.

    Block forward substitution: W_k = W_kk · [−L_k,<k · W_<k | I | 0].
    Each panel: one (nl, k·nl) broadcast of the panel's L row block, one
    psum of the earlier shards' partial products, one local small solve.
    """
    nl, N = L_loc.shape
    assert S * nl == N
    me = lax.axis_index(axis)
    W_loc = jnp.zeros_like(L_loc)

    for k in range(S):
        c0 = k * nl
        D = _bcast_from(
            lax.dynamic_slice_in_dim(L_loc, c0, nl, axis=1), k, axis, me
        )
        W_kk = la.tri_inv(D)
        if k == 0:
            Wk = jnp.pad(W_kk, ((0, 0), (0, N - nl)))
        else:
            # panel's L row block left of the diagonal, broadcast from k
            Lrow = _bcast_from(L_loc[:, :c0], k, axis, me)  # (nl, c0)
            # shard t (< k) contributes L_k[:, strip_t] @ W_t; strips
            # ≥ k slice into the zero padding and contribute nothing
            Lrow_pad = jnp.pad(Lrow, ((0, 0), (0, N - c0)))
            blk = lax.dynamic_slice_in_dim(Lrow_pad, me * nl, nl, axis=1)
            Psum = lax.psum(
                jnp.dot(blk, W_loc, precision=lax.Precision.HIGHEST), axis
            )  # (nl, N) replicated = L_k,<k · W_<k
            left = -jnp.dot(W_kk, Psum, precision=lax.Precision.HIGHEST)
            # the diagonal block occupies columns [c0, c0+nl); right of it 0
            eye_blk = jnp.pad(W_kk, ((0, 0), (c0, N - c0 - nl)))
            cols_g = jnp.arange(N)[None, :]
            Wk = jnp.where(cols_g < c0, left, 0.0) + eye_blk
        W_loc = jnp.where(me == k, Wk, W_loc)

    return W_loc


# ---------------------------------------------------------------------------
# Host-facing wrappers (correctness surface; used by tests and by
# sharded_mi's distributed_seed path)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mesh",))
def dist_cholesky(mesh: Mesh, K: jax.Array) -> jax.Array:
    """Lower Cholesky factor with rows sharded over the mesh 'grid' axis."""
    S = mesh.shape["grid"]

    def f(K_loc):
        return dist_cholesky_strip(K_loc, S, "grid")

    return jax.shard_map(
        f, mesh=mesh, in_specs=P("grid", None), out_specs=P("grid", None)
    )(K)


@partial(jax.jit, static_argnames=("mesh",))
def dist_tri_inv(mesh: Mesh, L: jax.Array) -> jax.Array:
    """L⁻¹ with rows sharded over the mesh 'grid' axis."""
    S = mesh.shape["grid"]

    def f(L_loc):
        return dist_tri_inv_strip(L_loc, S, "grid")

    return jax.shard_map(
        f, mesh=mesh, in_specs=P("grid", None), out_specs=P("grid", None)
    )(L)
