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

  The seed has TWO modes:
    * default (replicated): the O(N³) Cholesky + blocked tri_inv run
      replicated under GSPMD — identical arithmetic to the single-chip
      path (bit-exact fidelity incl. score ties), and W (400 MB at
      N=10k) fits a 16 GB chip to ~60k candidates;
    * distributed_seed=True: the Gram strip, a blocked right-looking
      Cholesky, and a block forward-substitution triangular inverse run
      INSIDE the shard_map at O(N²/S) memory per chip, panels moving as
      psum/all_gather block broadcasts over ICI (parallel/dist_linalg).
      This lifts the per-chip memory ceiling for fields beyond ~60k
      candidates; block arithmetic matches the f64 oracle but not the
      replicated seed bit-for-bit at exact ties.
  Either way the per-round O(N²) passes split N²/S per chip — that is
  where multi-chip time goes.

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
from algp_tpu.ops.gram import gram_pallas_with_noise
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
    distributed_seed: bool = False,
) -> acq.SelectionResult:
    """Greedy Krause-MI selection with the candidate axis sharded over
    the mesh's 'grid' axis.  Matches `acquisition.greedy_select(...,
    strategy="mi")` index-for-index on tie-free fields.

    distributed_seed=False (default): the O(N³) seed factorization runs
    replicated (identical arithmetic to the single-chip path; right while
    W fits one chip — see the module docstring).  distributed_seed=True:
    the WHOLE pipeline — Gram strip, blocked Cholesky, triangular
    inverse, pilot phases, greedy loop — runs inside one shard_map at
    O(N²/S) memory per chip (parallel/dist_linalg.py); its block
    arithmetic matches the f64 oracle but is not bit-identical to the
    replicated seed at exact score ties.
    """
    n_shards = mesh.shape["grid"]
    N = x.shape[0]
    align = 512 * n_shards // math.gcd(512, n_shards)
    x, nv = acq.pad_candidates(x, nv, align=align)
    rep = NamedSharding(mesh, P())
    x = jax.device_put(x, rep)
    nv = jax.device_put(nv, rep)
    pilot_idx = jax.device_put(pilot_idx, rep)
    pilot_nv = nv[pilot_idx] if num_pilot else jnp.zeros((0,), jnp.float32)
    impl = _sharded_mi_dist_jit if distributed_seed else _sharded_mi_jit
    res = impl(
        mesh, spec, params, x, nv, pilot_idx,
        jnp.asarray(num_pilot, jnp.int32), pilot_nv,
        rounds=rounds, num_pilot=num_pilot, n_valid=N, n_shards=n_shards,
    )
    if x.shape[0] != N:
        res = acq.SelectionResult(
            selected=res.selected,
            post_var=res.post_var[:N],
            scores=res.scores[:, :N],
            basis=res.basis[:, :N],
        )
    return res




def _mi_loop_factory(spec, rounds, num_pilot, N, n_loc):
    """The per-round greedy body run INSIDE shard_map — shared by the
    replicated-seed and distributed-seed paths (identical loop
    arithmetic; only how W/B/F/G/pdiag were seeded differs)."""

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

    return loop

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
        C, d0, taken_pilot, _ = acq._batch_pilot_condition(
            spec, params, x, pilot_nv, pilot_idx, pilot_count, d0,
            n_valid=n_valid,
        )
        taken0 = jnp.logical_or(taken0, taken_pilot)
        B0 = lax.dynamic_update_slice(B0, C, (0, 0))

    # EXACTLY the single-chip seed construction (acquisition.
    # _greedy_select_jit): same Gram program, same diagonal assembly
    # (noise_var · (nv / noise_var)) — a plain gram + diag(nv) build
    # differed in last-ulp diagonal bits, quietly narrowing the
    # "bit-exact incl. ties" claim of the replicated-seed mode
    K = gram_pallas_with_noise(spec, params, x, nv / params.noise_var)
    W = la.tri_inv(jnp.linalg.cholesky(K))
    W = lax.with_sharding_constraint(W, shard_rows)
    pdiag0 = jnp.sum(W * W, axis=0)
    F0 = jnp.zeros((N, T), jnp.float32)
    G0 = jnp.zeros((T, N), jnp.float32)
    if num_pilot:
        F0, G0, pdiag0 = acq._implicit_pilot_delete(
            W, pilot_idx, pilot_count, F0, G0, pdiag0, num_pilot
        )

    loop = _mi_loop_factory(spec, rounds, num_pilot, N, n_loc)
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


@partial(
    jax.jit,
    static_argnames=("mesh", "spec", "rounds", "num_pilot", "n_valid",
                     "n_shards"),
)
def _sharded_mi_dist_jit(
    mesh, spec, params, x, nv, pilot_idx, pilot_count, pilot_nv,
    *, rounds, num_pilot, n_valid, n_shards,
):
    """Fully distributed variant: the seed factorization, pilot phases,
    and greedy loop all execute inside ONE shard_map at O(N²/S) memory
    per chip — every shard only ever materialises its (N/S, N) strips of
    K, L, W, F plus the (T, N/S) basis/correction columns.
    """
    from algp_tpu.parallel.dist_linalg import (
        dist_cholesky_strip,
        dist_tri_inv_strip,
    )

    N = x.shape[0]
    S = n_shards
    n_loc = N // S
    T = num_pilot + rounds
    m = num_pilot
    loop = _mi_loop_factory(spec, rounds, num_pilot, N, n_loc)

    def run(params, x_full, nv_full, pidx, pcount, pnv):
        shard = lax.axis_index("grid")
        g0 = shard * n_loc
        gidx = g0 + jnp.arange(n_loc)
        x_loc = lax.dynamic_slice_in_dim(x_full, g0, n_loc, axis=0)

        # ---- seed, fully in-shard: Gram strip → blocked Cholesky →
        # block forward-substitution inverse (dist_linalg)
        K_loc = gram(spec, params, x_loc, x_full)
        cols_g = jnp.arange(N)[None, :]
        K_loc = K_loc + jnp.where(
            cols_g == gidx[:, None],
            lax.dynamic_slice_in_dim(nv_full, g0, n_loc)[:, None], 0.0,
        )
        L_loc = dist_cholesky_strip(K_loc, S, "grid")
        W_loc = dist_tri_inv_strip(L_loc, S, "grid")
        pdiag_full = lax.psum(jnp.sum(W_loc * W_loc, axis=0), "grid")
        pdiag_loc = lax.dynamic_slice_in_dim(pdiag_full, g0, n_loc)

        d_loc = gram_diag(spec, params, x_loc)
        taken_loc = gidx >= n_valid
        B_loc = jnp.zeros((T, n_loc), jnp.float32)
        F_loc = jnp.zeros((n_loc, T), jnp.float32)
        G_loc = jnp.zeros((T, n_loc), jnp.float32)

        if num_pilot:
            # ---- pilot conditioning (the in-shard port of
            # acquisition._batch_pilot_condition: xA replicated, the
            # cross-covariance restricted to this shard's columns)
            valid = jnp.arange(m) < pcount
            idx_safe = jnp.where(valid, pidx, 0)
            xA = x_full[idx_safe]
            KA = gram(spec, params, xA, xA) + jnp.diag(pnv)
            pair = valid[:, None] & valid[None, :]
            KA = jnp.where(pair, KA, jnp.eye(m, dtype=jnp.float32))
            LA = jnp.linalg.cholesky(KA)
            Kc_loc = gram(spec, params, xA, x_loc) * valid[:, None]
            # cond_solve on the UNPADDED global count — the same gate
            # operand as acquisition._batch_pilot_condition (mesh ≡
            # single-chip; gating on the mesh-padded N would flip the
            # family in the ±one-pad-block window around the threshold)
            C_loc = acq.cond_solve(LA, Kc_loc, n_valid)  # (m, n_loc)
            d_loc = d_loc - jnp.sum(C_loc * C_loc, axis=0)
            B_loc = lax.dynamic_update_slice(B_loc, C_loc, (0, 0))
            marked = jnp.where(valid, pidx, N)
            taken_pilot = (gidx[:, None] == marked[None, :]).any(axis=1)
            taken_loc = jnp.logical_or(taken_loc, taken_pilot)

            # ---- pilot delete (in-shard port of _implicit_pilot_delete,
            # same duplicate-index dedup)
            same = (pidx[:, None] == pidx[None, :]) & pair
            dup = jnp.tril(same, k=-1).any(axis=1)
            vdel = valid & ~dup
            idx_del = jnp.where(vdel, pidx, 0)
            WE_loc = W_loc[:, idx_del] * vdel[None, :]  # (n_loc, m)
            U0 = lax.psum(
                jnp.dot(W_loc.T, WE_loc, precision=_HIGH), "grid"
            )  # (N, m) replicated = P0[:, A]
            U0 = U0 * vdel[None, :]
            PA = U0[idx_del, :] * vdel[:, None]
            paird = vdel[:, None] & vdel[None, :]
            PA = jnp.where(paird, PA, jnp.eye(m, dtype=jnp.float32))
            LA2 = jnp.linalg.cholesky(PA)
            Z = la.cho_solve(LA2, U0.T) * vdel[:, None]  # (m, N)
            U0_loc = lax.dynamic_slice(U0, (g0, 0), (n_loc, m))
            Z_loc = lax.dynamic_slice(Z, (0, g0), (m, n_loc))
            F_loc = lax.dynamic_update_slice(F_loc, U0_loc, (0, 0))
            G_loc = lax.dynamic_update_slice(G_loc, Z_loc, (0, 0))
            pdiag_loc = pdiag_loc - jnp.sum(U0_loc * Z_loc.T, axis=1)
            del_marked = jnp.where(vdel, pidx, N)
            on_del = (gidx[:, None] == del_marked[None, :]).any(axis=1)
            pdiag_loc = jnp.where(on_del, 1.0, pdiag_loc)

        # buffers created in-shard may start vma-INVARIANT (which of them
        # depends on num_pilot); the loop carries everything as varying,
        # like the replicated path's shard_map inputs — promote only the
        # ones that need it
        def _vary(v):
            if "grid" in jax.typeof(v).vma:
                return v
            return lax.pcast(v, ("grid",), to="varying")

        B_loc, d_loc, F_loc, G_loc, pdiag_loc, taken_loc = (
            _vary(v)
            for v in (B_loc, d_loc, F_loc, G_loc, pdiag_loc, taken_loc)
        )
        return loop(params, x_full, nv_full, W_loc, B_loc, d_loc,
                    F_loc, G_loc, pdiag_loc, taken_loc)

    sel, d, B = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P("grid"), P(None, "grid")),
    )(params, x, nv, pilot_idx, pilot_count, pilot_nv)
    return acq.SelectionResult(
        selected=sel,
        post_var=d,
        scores=jnp.full((0, N), -jnp.inf, jnp.float32),
        basis=B,
    )
