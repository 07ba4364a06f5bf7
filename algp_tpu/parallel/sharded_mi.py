"""Multi-chip Krause-MI greedy selection — explicit shard_map decomposition.

The single-chip MI loop (algp_tpu.acquisition) leans on two Pallas
programs (tiled Gram seed, streamed precision-column) that GSPMD cannot
partition, so round 1 shipped MI single-chip only.  This module is the
planned shard_map decomposition of the implicit-precision passes
(SURVEY.md §2.3 TP row): the candidate axis N is block-sharded over the
mesh's 'grid' axis and every per-round pass is expressed as per-shard
dense work + one small collective, riding ICI:

  state layout (shard r owns global candidate block [r·n_loc, (r+1)·n_loc)):
    W  (N, N)  rows sharded   — L⁻¹ from the replicated seed factorization
    B  (T, N)  cols sharded   — conditioning basis
    F  (N, T)  rows sharded — Schur correction factors of the implicit
    G  (T, N)  cols sharded — complement precision  P = WᵀW − F·G
    d, pdiag, taken  (N,) sharded;  x, nv  (N,·) replicated (tiny)

  per greedy round:
    scores      : local elementwise VPU pass
    argmax      : local argmax → all_gather of (val, idx) pairs → min-index
                  tie-break (shard blocks are index-ordered, so picking the
                  lowest tying shard IS the lowest global index)
    u₀ = (WᵀW)eⱼ: per-shard partial matvec Wᵣᵀ(Wᵣ eⱼ) + psum — the O(N²)
                  dominant cost, perfectly split N²/S per chip
    B[:,j], G[:,j], d[j], pdiag[j]: one-hot masked row/scalar psum gathers
    rank-1 updates of B/F/G/d/pdiag: local

  The O(N³) seed (Cholesky + blocked tri_inv) stays REPLICATED under
  GSPMD — a deliberate design point, not an omission:
    * memory: W is N² f32 = 400 MB at N=10k; a 16 GB chip holds the
      replicated seed comfortably to ~60k candidates, far beyond the
      workload's field sizes — sharding W buys nothing until then;
    * a distributed W build wouldn't stay distributed: the bisection
      tri_inv's top-level combine (−W_c B W_a) needs a half-matrix
      operand gathered per shard, re-replicating N²/4 anyway;
    * avoiding W entirely (per-round u₀ via distributed triangular
      SOLVES against a row-sharded L) turns a 0.3 ms coalesced matvec
      into an nb-step sequential substitution with a collective per
      panel — latency-bound and strictly worse.
  What multi-chip actually buys here is per-ROUND scaling (the O(N²)
  passes split N²/S per chip), and that is what this module shards.

Fidelity: identical score arithmetic to the single-chip loop except that
cross-shard sums reduce in shard-major order (vs the Pallas kernels'
tile-major order), a ≤1-ulp-per-partial difference that only matters at
exact score ties; the mesh tests assert index-equality with the
single-device loop on tie-free fields.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from algp_tpu import acquisition as acq
from algp_tpu.ops import linalg as la
from algp_tpu.ops.kernels import KernelSpec, gram, gram_diag

_HIGH = lax.Precision.HIGHEST


def sharded_greedy_select_mi(
    mesh: Mesh,
    spec: KernelSpec,
    params,
    x: jax.Array,
    nv: jax.Array,
    pilot_idx: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
) -> acq.SelectionResult:
    """Greedy Krause-MI selection with the candidate axis sharded over
    the mesh's 'grid' axis.  Matches `acquisition.greedy_select(...,
    strategy="mi")` index-for-index on tie-free fields."""
    n_shards = mesh.shape["grid"]
    N = x.shape[0]
    align = 512 * n_shards // math.gcd(512, n_shards)
    x, nv = acq.pad_candidates(x, nv, align=align)
    rep = NamedSharding(mesh, P())
    x = jax.device_put(x, rep)
    nv = jax.device_put(nv, rep)
    pilot_idx = jax.device_put(pilot_idx, rep)
    pilot_nv = nv[pilot_idx] if num_pilot else jnp.zeros((0,), jnp.float32)
    res = _sharded_mi_jit(
        mesh, spec, params, x, nv, pilot_idx,
        jnp.asarray(num_pilot, jnp.int32), pilot_nv,
        rounds=rounds, num_pilot=num_pilot, n_valid=N, n_shards=n_shards,
    )
    if x.shape[0] != N:
        res = acq.SelectionResult(
            selected=res.selected,
            post_var=res.post_var[:N],
            scores=res.scores,
            basis=res.basis[:, :N],
        )
    return res


@partial(
    jax.jit,
    static_argnames=("mesh", "spec", "rounds", "num_pilot", "n_valid",
                     "n_shards"),
)
def _sharded_mi_jit(
    mesh, spec, params, x, nv, pilot_idx, pilot_count, pilot_nv,
    *, rounds, num_pilot, n_valid, n_shards,
):
    N = x.shape[0]
    n_loc = N // n_shards
    T = num_pilot + rounds
    shard_rows = NamedSharding(mesh, P("grid", None))
    shard_cols = NamedSharding(mesh, P(None, "grid"))
    shard_n = NamedSharding(mesh, P("grid"))

    # ---- seed + pilot phase: identical arithmetic to the single-chip
    # path (replicated under GSPMD), then shard the loop state
    d0 = gram_diag(spec, params, x)
    taken0 = jnp.arange(N) >= n_valid
    B0 = jnp.zeros((T, N), jnp.float32)
    if num_pilot:
        C, d0, taken_pilot = acq._batch_pilot_condition(
            spec, params, x, pilot_nv, pilot_idx, pilot_count, d0
        )
        taken0 = jnp.logical_or(taken0, taken_pilot)
        B0 = lax.dynamic_update_slice(B0, C, (0, 0))

    K = gram(spec, params, x, x) + jnp.diag(nv)
    W = la.tri_inv(jnp.linalg.cholesky(K))
    W = lax.with_sharding_constraint(W, shard_rows)
    pdiag0 = jnp.sum(W * W, axis=0)
    F0 = jnp.zeros((N, T), jnp.float32)
    G0 = jnp.zeros((T, N), jnp.float32)
    if num_pilot:
        F0, G0, pdiag0 = acq._implicit_pilot_delete(
            W, pilot_idx, pilot_count, F0, G0, pdiag0, num_pilot
        )

    def loop(params, x_full, nv_full, W_loc, B, d, F, G, pdiag, taken):
        shard = lax.axis_index("grid")
        g0 = shard * n_loc
        gidx = g0 + jnp.arange(n_loc)
        x_loc = lax.dynamic_slice_in_dim(x_full, g0, n_loc, axis=0)
        nv_loc = lax.dynamic_slice_in_dim(nv_full, g0, n_loc, axis=0)
        sel0 = jnp.zeros((rounds,), jnp.int32)

        def row_at(M_loc, j):
            """Column j of a (T, N) cols-sharded matrix, replicated."""
            mask = (gidx == j)[None, :]
            return lax.psum(
                jnp.sum(jnp.where(mask, M_loc, 0.0), axis=1), "grid"
            )

        def scalar_at(v_loc, j):
            return lax.psum(jnp.sum(jnp.where(gidx == j, v_loc, 0.0)), "grid")

        def body(r, state):
            B, d, F, G, pdiag, taken, sel = state
            s = jnp.where(taken, -jnp.inf, (d + nv_loc) * pdiag)
            lv = jnp.max(s)
            gj = g0 + jnp.argmax(s).astype(jnp.int32)
            # global argmax, lowest index on ties: pmax the score, then
            # pmin the winning shards' indices (local argmax already
            # breaks intra-shard ties low; blocks are index-ordered)
            vmax = lax.pmax(lv, "grid")
            j = lax.pmin(
                jnp.where(lv == vmax, gj, jnp.int32(N)), "grid"
            )

            t = num_pilot + r
            # posterior covariance column (local rows)
            xj = lax.dynamic_slice_in_dim(x_full, j, 1, axis=0)
            prior_loc = gram(spec, params, x_loc, xj)[:, 0]
            Bj = row_at(B, j)  # (T,)
            col_loc = prior_loc - jnp.dot(B.T, Bj, precision=_HIGH)
            dj = scalar_at(d, j)
            nvj = lax.dynamic_slice_in_dim(nv_full, j, 1)[0]
            c_loc = col_loc / jnp.sqrt(dj + nvj)
            B = lax.dynamic_update_slice(B, c_loc[None, :], (t, 0))
            d = d - c_loc * c_loc

            # precision column u = (WᵀW)eⱼ − F·G[:,j]
            wj_loc = lax.dynamic_slice_in_dim(W_loc, j, 1, axis=1)[:, 0]
            u0 = lax.psum(
                jnp.dot(W_loc.T, wj_loc, precision=_HIGH), "grid"
            )  # (N,) replicated
            u_loc = lax.dynamic_slice_in_dim(u0, g0, n_loc) - jnp.dot(
                F, row_at(G, j), precision=_HIGH
            )
            pjj = scalar_at(pdiag, j)
            F = lax.dynamic_update_slice(F, u_loc[:, None], (0, t))
            G = lax.dynamic_update_slice(G, (u_loc / pjj)[None, :], (t, 0))
            pdiag = pdiag - (u_loc * u_loc) / pjj
            on_j = gidx == j
            pdiag = jnp.where(on_j, 1.0, pdiag)
            taken = jnp.logical_or(taken, on_j)
            sel = lax.dynamic_update_slice(sel, j[None], (r,))
            return B, d, F, G, pdiag, taken, sel

        state = (B, d, F, G, pdiag, taken, sel0)
        if rounds:
            state = lax.fori_loop(0, rounds, body, state)
        B, d = state[0], state[1]
        sel = state[6]
        return sel, d, B

    sel, d, B = jax.shard_map(
        loop,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("grid", None), P(None, "grid"),
                  P("grid"), P("grid", None), P(None, "grid"), P("grid"),
                  P("grid")),
        out_specs=(P(), P("grid"), P(None, "grid")),
    )(
        params,
        x,
        nv,
        W,
        lax.with_sharding_constraint(B0, shard_cols),
        lax.with_sharding_constraint(d0, shard_n),
        lax.with_sharding_constraint(F0, shard_rows),
        lax.with_sharding_constraint(G0, shard_cols),
        lax.with_sharding_constraint(pdiag0, shard_n),
        lax.with_sharding_constraint(taken0, shard_n),
    )
    return acq.SelectionResult(
        selected=sel,
        post_var=d,
        scores=jnp.full((0, N), -jnp.inf, jnp.float32),
        basis=B,
    )
