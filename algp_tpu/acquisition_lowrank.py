"""L2c — large-N greedy Krause-MI via a low-rank (Nyström/FITC)
complement precision.

Why this exists (SURVEY.md §2 C7, §3.4 — scaled past the exact ceiling):
the exact MI path seeds W = L⁻¹ over the full N×N candidate Gram —
O(N³) flops and O(N²) HBM.  That is 47 ms + 400 MB at N = 10k and
~50 s + 40 GB at N = 100k: off the chip.  This module replaces only the
complement-precision REPRESENTATION with an inducing-point factorization;
every selection-fidelity convention (f32 score resolution, min-index
argmax, exact incremental numerator conditioning, batched Schur deletes
of the sampled set) is shared with `acquisition.py`.

    Σ = K + diag(nv) ≈ U Uᵀ + D                  (FITC / DTC with exact
                                                  diagonal)
    U = K_xz L_zz⁻ᵀ                               (N×M Nyström factor)
    D = diag( clamp(k_diag − rowsum U², 0) + nv ) (Σ's diagonal is exact)

and by Woodbury the precision is itself low-rank-minus-diagonal:

    P̃ = Σ⁻¹ = D⁻¹ − Vᵀ V,   V = L_B⁻¹ Uᵀ D⁻¹  (M×N),
    B = I + Uᵀ D⁻¹ U         (M×M)

so the seed costs O(N M²) MXU matmuls + one M×M Cholesky, O(N M) HBM,
and the per-round precision column  P̃[:, j] = d⁻¹ⱼ eⱼ − Vᵀ (V eⱼ)  is a
single (N×M)·(M,) matvec.  With Z = X the factorization is exact up to
the Kzz jitter, and selections coincide with the exact path / the f64
oracle (tests/test_lowrank.py).

Approximation placement: the numerator σ²(y|A) + nv stays EXACT — the
incremental basis conditioning is O(N·T) regardless of N.  Only the
conditioning-on-the-complement denominator (the "everything else"
background term, which is naturally tolerant of a low-rank summary)
flows through the inducing points.

TPU notes: all heavy ops are tall-skinny (N×M)·(M×M) matmuls — ideal
MXU shapes; Vᵀ is materialised (like WT in the exact path) so the
per-round gather of row j is coalesced; the candidate axis keeps the
512 alignment contract of `acquisition.pad_candidates`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from algp_tpu import acquisition as _acq
from algp_tpu.acquisition import (
    SelectionResult,
    _batch_pilot_condition,
    _condition,
    _posterior_col,
    pad_candidates,
)
from algp_tpu.ops import linalg as la
from algp_tpu.ops.gram import gram_pallas
from algp_tpu.ops.kernels import KernelParams, KernelSpec, gram, gram_diag


def _seed_solve(L, B, n_global):
    """The seeds' (M, N)-shaped triangular solves: explicit-inverse MXU
    matmul at gated candidate counts (ops/linalg.solve_triangular_matmul
    — the XLA trisolve's row-substitution chain costs ~12 ms at
    (512, 1M), ~29 ms at (1024, 1M), measured), the plain trisolve below
    so every sub-1M preset stays bit-identical.  `n_global` is the FULL
    UNPADDED candidate count even when B is a streamed chunk or an
    in-shard strip — the matmul's columns are independent, so
    chunked/sharded passes produce bit-identical factors to the
    monolithic one (the trisolve's bits vary with RHS width —
    benchmarks/README.md, field synthesis).  Delegates to
    `acquisition.cond_solve` — the ONE family gate (tests force it by
    patching acquisition.COND_MATMUL_N)."""
    return _acq.cond_solve(L, B, n_global)


_HIGH = lax.Precision.HIGHEST

#: relative jitter on K_zz (scaled by the outputscale = diag of K) — keeps
#: the inducing Cholesky PD even with duplicated/near-duplicate centers.
_Z_JITTER = 1e-6

#: lowrank_factors_seed streams its O(N·M²) B-assembly pass once the
#: (M, N) Ut buffer would exceed this (the monolithic program peaks at
#: ~2.5 × the buffer: a 512×4.19M seed measured 16 G on a 15.75 G v5e).
#: Below it, the monolithic pass is kept so existing seeds (≤ 1M presets)
#: stay bit-identical.
_SEED_CHUNK_BYTES = 5 * 2**30
_SEED_CHUNK = 1 << 20


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LowRankPrecision:
    """Implicit prior precision  P̃ = diag(dinv) − VT · VTᵀ  over candidates.

    VT    : (N, M)  Vᵀ — row-gatherable low-rank factor
    dinv  : (N,)    1 / D  (FITC diagonal of Σ, inverted)
    pdiag : (N,)    diag P̃ (precomputed: dinv − rowsum VT²)
    """

    VT: jax.Array
    dinv: jax.Array
    pdiag: jax.Array


def check_kcenter_m(num_valid, m: int, caller: str) -> None:
    """Enforce the `kcenter_indices` contract m ≤ live rows wherever the
    live count is CONCRETE (the public eager wrappers — the episode and
    direct users hit these with host-known scalars).  A violation would
    not crash: with NO live rows left the masked maximin distances are
    −inf everywhere and every further round duplicates index 0 — possibly
    a PADDING row — poisoning the inducing design while the K_zz jitter
    keeps it factorizable: exactly the silent-wrong-rows class the
    explicit `corrections_pregathered` flag was introduced to kill.

    Deliberately NOT enforced: m ≤ DISTINCT live rows.  A heavily
    revisited sampled set (paths may re-measure nodes) can hold fewer
    distinct points than m; the maximin chain then duplicates LIVE rows
    (a duplicate's distance-0 beats the dead rows' −inf), which is
    span-equivalent to the best available design — the distinct points
    themselves — with the K_zz jitter keeping the factor PD.  Pinned by
    tests/test_sparse_gp.py::test_sparse_fit_survives_duplicate_heavy_set.
    Inside a trace the count is abstract and the check is a no-op (the
    jitted wrappers there clamp m statically instead)."""
    try:
        nv = int(num_valid)
    except Exception:
        return  # traced — the static clamp at the jit wrapper governs
    if nv < m:
        raise ValueError(
            f"{caller}: k-center inducing design needs num_valid ≥ m "
            f"(got {nv} live rows for m={m}) — maximin rounds past "
            f"exhaustion would silently duplicate index 0"
        )


@partial(jax.jit, static_argnames=("m", "start"))
def kcenter_indices(
    x: jax.Array, m: int, n_valid: Optional[jax.Array] = None,
    *, start: int = 0,
) -> jax.Array:
    """Greedy k-center (maximin) inducing-point selection, deterministic.

    Starts from index `start` (default 0 — the long-standing design,
    bit-identical), then repeatedly takes the candidate farthest (in
    raw input space) from the chosen set.  O(N·m) — one fused distance
    update per round.  Different `start` values yield distinct,
    equally-dispersed maximin designs — the deterministic variant knob
    the z-ENSEMBLE MI mode averages over (`AcquisitionConfig.
    mi_ensemble`; the measured 4M z-sensitivity is exactly the spread
    between such variants).  `n_valid` masks alignment-padding
    candidates (`pad_candidates` sentinels sit at far-away coordinates
    and would otherwise win every maximin round).

    Requires m ≤ the number of distinct live candidates: once every live
    point is chosen the maximin distance is −inf everywhere and further
    rounds duplicate index 0, leaving the K_zz jitter as the only thing
    keeping the inducing Cholesky PD.  The jit wrappers that derive z
    internally clamp m against their static candidate count; wrappers
    taking a RUNTIME `n_valid` enforce the contract at their eager
    boundary via `check_kcenter_m` (ADVICE-r2 pattern: conventions that
    can silently produce wrong rows get code, not comments).
    """
    N = x.shape[0]
    if n_valid is None:
        n_valid = jnp.asarray(N, jnp.int32)
    live = jnp.arange(N) < n_valid

    def sq(a, b):
        d = a - b[None, :]
        return jnp.sum(d * d, axis=1)

    d0 = jnp.where(live, sq(x, x[start]), -jnp.inf)
    idx0 = jnp.full((m,), start, jnp.int32)

    def body(t, state):
        idx, d = state
        j = jnp.argmax(d).astype(jnp.int32)
        idx = lax.dynamic_update_slice(idx, j[None], (t,))
        xj = lax.dynamic_slice_in_dim(x, j, 1, axis=0)[0]
        d = jnp.minimum(d, jnp.where(live, sq(x, xj), -jnp.inf))
        return idx, d

    idx, _ = lax.fori_loop(1, m, body, (idx0, d0))
    return idx


@partial(jax.jit, static_argnames=("spec", "use_pallas", "n_valid"))
def lowrank_precision_seed(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    z: jax.Array,
    *,
    use_pallas: bool = False,
    n_valid: Optional[int] = None,
) -> LowRankPrecision:
    """Build the low-rank implicit precision over all N candidates.

    O(N M²) flops, O(N M) memory — the large-N replacement for the exact
    `acquisition.implicit_complement_precision` seed.  Valid per
    (params, nv, z); re-seed after every hyperparameter refit.
    `n_valid`: the UNPADDED candidate count for the solve-family gate
    when x carries alignment padding (defaults to x's length).
    """
    n_gate = x.shape[0] if n_valid is None else n_valid
    M = z.shape[0]
    os_ = jnp.exp(params.log_outputscale)
    Kzz = gram(spec, params, z, z) + _Z_JITTER * os_ * jnp.eye(M, dtype=jnp.float32)
    # adaptive-jitter rescue: a dense k-center design on a small, smooth
    # grid can push cond(K_zz) past f32 even with the fixed relative
    # jitter; try 0 of safe_cholesky IS the plain factor bitwise, so
    # healthy seeds are unchanged while pathological ones escalate
    # instead of silently poisoning every selection with NaNs
    Lzz, _ = la.safe_cholesky(Kzz, initial_jitter=1e-5)
    if use_pallas:
        Kzx = gram_pallas(spec, params, z, x)
    else:
        Kzx = gram(spec, params, z, x)
    Ut = _seed_solve(Lzz, Kzx, n_gate)  # (M, N) = L_zz⁻¹ K_zx
    qdiag = jnp.sum(Ut * Ut, axis=0)
    d = jnp.maximum(gram_diag(spec, params, x) - qdiag, 0.0) + nv
    dinv = 1.0 / d
    A = Ut * dinv[None, :]  # (M, N) = Uᵀ D⁻¹
    B = jnp.eye(M, dtype=jnp.float32) + jnp.dot(A, Ut.T, precision=_HIGH)
    LB = jnp.linalg.cholesky(B)
    V = _seed_solve(LB, A, n_gate)  # (M, N)
    VT = V.T
    pdiag = dinv - jnp.sum(VT * VT, axis=1)
    return LowRankPrecision(VT=VT, dinv=dinv, pdiag=pdiag)


def _precision_col(lr: LowRankPrecision, j: jax.Array) -> jax.Array:
    """P̃[:, j] = d⁻¹ⱼ eⱼ − VT · VT[j]  — one coalesced row gather + one
    (N×M)·(M,) matvec (the low-rank analogue of `ops.updates.wtw_column`)."""
    vj = lax.dynamic_slice_in_dim(lr.VT, j, 1, axis=0)[0]  # (M,)
    u0 = -jnp.dot(lr.VT, vj, precision=_HIGH)
    return u0.at[j].add(lr.dinv[j])


def _lowrank_schur(lr: LowRankPrecision, idx: jax.Array, count: jax.Array):
    """Schur factors for deleting set A from P̃:  U0 = P̃0[:, A] (N, m) and
    Z = PA⁻¹ U0ᵀ (m, N), with the duplicate-index dedup that keeps PA
    nonsingular — identical algebra to `acquisition.implicit_corrections`
    but with U0 assembled from the low-rank factors instead of WᵀW."""
    m = idx.shape[0]
    valid = jnp.arange(m) < count
    same = (idx[:, None] == idx[None, :]) & valid[:, None] & valid[None, :]
    dup = jnp.tril(same, k=-1).any(axis=1)
    valid = valid & ~dup
    idx_safe = jnp.where(valid, idx, 0)
    VA = lr.VT[idx_safe]  # (m, M) coalesced row gathers
    U0 = -jnp.dot(lr.VT, VA.T, precision=_HIGH)  # (N, m)
    U0 = U0.at[idx_safe, jnp.arange(m)].add(lr.dinv[idx_safe])
    U0 = U0 * valid[None, :].astype(jnp.float32)
    PA = U0[idx_safe, :] * valid[:, None].astype(jnp.float32)
    pair = valid[:, None] & valid[None, :]
    PA = jnp.where(pair, PA, jnp.eye(m, dtype=jnp.float32))
    LA = jnp.linalg.cholesky(PA)
    Z = la.cho_solve(LA, U0.T)  # (m, N) = PA⁻¹ U0ᵀ
    Z = Z * valid[:, None].astype(jnp.float32)
    return U0, Z, valid


@jax.jit
def lowrank_corrections(
    lr: LowRankPrecision, idx: jax.Array, count: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Low-rank analogue of `acquisition.implicit_corrections`:
    P̃_V∖A = P̃0 − F · ZTᵀ restricted off A, rebuilt from the per-refit
    seed in ONE batched op — so episode delete-chain drift is
    structurally impossible, exactly as in the exact path."""
    U0, Z, _ = _lowrank_schur(lr, idx, count)
    return U0, Z.T


@jax.jit
def lowrank_corrections_at(
    lr: LowRankPrecision,
    idx: jax.Array,
    count: jax.Array,
    rows: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """`lowrank_corrections` restricted to candidate `rows` — (R, C)
    slices of F and ZT with identical per-row arithmetic.

    The fused episode step only ever READS the correction factors at
    the path sets' candidate indices (≤ a few thousand rows), so
    building the full (N, C) factors — an O(N·M·C) matmul plus an
    O(C²·N) solve and ~2·N·C·4 B of HBM churn per replan (2.8 GB at
    N = 1M) — is wasted work.  Here everything is O(R·(M+C)·C):

        F_rows  = P̃0[rows, A] = −VT[rows]·VAᵀ (+ d⁻¹ at own rows)
        ZT_rows = (PA⁻¹ U0ᵀ)ᵀ[rows] = F_rows · PA⁻¹   (PA symmetric)

    with PA = P̃0[A, A] assembled the same way (dup-dedup included)."""
    m = idx.shape[0]
    valid = jnp.arange(m) < count
    same = (idx[:, None] == idx[None, :]) & valid[:, None] & valid[None, :]
    dup = jnp.tril(same, k=-1).any(axis=1)
    valid = valid & ~dup
    idx_safe = jnp.where(valid, idx, 0)
    VA = lr.VT[idx_safe]  # (m, M)
    vf = valid.astype(jnp.float32)
    # PA = P̃0[A, A]: −VA·VAᵀ + diag(d⁻¹_A), identity-padded off `valid`
    PA = -jnp.dot(VA, VA.T, precision=_HIGH)
    PA = PA + jnp.diag(lr.dinv[idx_safe])
    pair = valid[:, None] & valid[None, :]
    PA = jnp.where(pair, PA, jnp.eye(m, dtype=jnp.float32))
    LA = jnp.linalg.cholesky(PA)
    Vr = lr.VT[rows]  # (R, M)
    F_rows = -jnp.dot(Vr, VA.T, precision=_HIGH)  # (R, m)
    own = (rows[:, None] == idx_safe[None, :]) & valid[None, :]
    F_rows = F_rows + jnp.where(own, lr.dinv[rows][:, None], 0.0)
    F_rows = F_rows * vf[None, :]
    ZT_rows = la.cho_solve(LA, F_rows.T).T * vf[None, :]  # (R, m)
    return F_rows, ZT_rows


def _pilot_delete_lowrank(lr, pilot_idx, pilot_count, F, G, pdiag):
    """Batch-remove the pilot block from the implicit precision
    (greedy-loop state update around `_lowrank_schur`)."""
    N = lr.VT.shape[0]
    U0, Z, valid = _lowrank_schur(lr, pilot_idx, pilot_count)
    F = lax.dynamic_update_slice(F, U0, (0, 0))
    G = lax.dynamic_update_slice(G, Z, (0, 0))
    pdiag = pdiag - jnp.sum(U0 * Z.T, axis=1)
    taken_mask = (
        jnp.zeros((N,), bool)
        .at[jnp.where(valid, pilot_idx, N)]
        .set(True, mode="drop")
    )
    pdiag = jnp.where(taken_mask, 1.0, pdiag)
    return F, G, pdiag


def greedy_select_lowrank(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    pilot_idx: jax.Array,
    z: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
    return_scores: bool = False,
    pilot_count: Optional[jax.Array] = None,
    pilot_nv: Optional[jax.Array] = None,
    use_pallas: bool = False,
) -> SelectionResult:
    """Greedy Krause-MI over N candidates with an M-inducing-point
    complement precision — `acquisition.greedy_select(strategy="mi")`
    for N far past the exact N³/N² ceiling.

    z : (M, dim) inducing locations (`kcenter_indices` + a gather, a
        coarse sub-grid, or any other design).  With z = x the selections
        coincide with the exact path.

        A (K, M, dim) stack runs the z-ENSEMBLE: K independent complement
        seeds (one per design variant), per-candidate MI scores averaged
        across designs before every argmax — the flat-greedy analogue of
        the fused episode step's `ensemble` mode (`AcquisitionConfig.
        mi_ensemble`; since s_k = (d+nv)·pdiag_k, the average is
        (d+nv)·mean_k pdiag_k).  The numerator conditioning is
        design-independent and stays single.  2-D z is the unchanged
        single-design path, bit-identical.

    All other arguments and the selection-fidelity conventions match
    `acquisition.greedy_select` — entropy needs no approximation at any N
    (its state is O(N·T)); use the exact entry for it.
    """
    if pilot_count is None:
        pilot_count = jnp.asarray(num_pilot, jnp.int32)
    if pilot_nv is None:
        pilot_nv = nv[pilot_idx] if num_pilot else jnp.zeros((0,), jnp.float32)
    N = x.shape[0]
    x, nv = pad_candidates(x, nv, align=512)
    res = _greedy_select_lowrank_jit(
        spec, params, x, nv, pilot_idx, pilot_count, pilot_nv, z,
        rounds=rounds, num_pilot=num_pilot, return_scores=return_scores,
        n_valid=N, use_pallas=use_pallas,
    )
    if x.shape[0] != N:
        res = SelectionResult(
            selected=res.selected,
            post_var=res.post_var[:N],
            scores=res.scores[:, :N],
            basis=res.basis[:, :N],
        )
    return res


@partial(
    jax.jit,
    static_argnames=(
        "rounds", "num_pilot", "return_scores", "n_valid", "spec",
        "use_pallas",
    ),
)
def _greedy_select_lowrank_jit(
    spec, params, x, nv, pilot_idx, pilot_count, pilot_nv, z, *,
    rounds, num_pilot, return_scores, n_valid=None, use_pallas=False,
):
    N = x.shape[0]
    if n_valid is None:
        n_valid = N
    T = num_pilot + rounds
    d0 = gram_diag(spec, params, x)
    B0 = jnp.zeros((T, N), jnp.float32)
    taken0 = jnp.arange(N) >= n_valid
    sel0 = jnp.zeros((rounds,), jnp.int32)

    if num_pilot:
        C, d0, taken_pilot, _ = _batch_pilot_condition(
            spec, params, x, pilot_nv, pilot_idx, pilot_count, d0,
            n_valid=n_valid,
        )
        taken0 = jnp.logical_or(taken0, taken_pilot)
        B0 = lax.dynamic_update_slice(B0, C, (0, 0))

    ens = z.ndim == 3  # (K, M, d): z-ensemble — K independent seeds
    if ens:
        K_ens = z.shape[0]
        lrs = [
            lowrank_precision_seed(spec, params, x, nv, z[k],
                                   use_pallas=use_pallas, n_valid=n_valid)
            for k in range(K_ens)
        ]
        lr = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *lrs)
        pdiag0 = lr.pdiag  # (K, N)
        F0 = jnp.zeros((K_ens, N, T), jnp.float32)
        G0 = jnp.zeros((K_ens, T, N), jnp.float32)
        if num_pilot:
            F0, G0, pdiag0 = jax.vmap(
                lambda l, F, G, p: _pilot_delete_lowrank(
                    l, pilot_idx, pilot_count, F, G, p
                )
            )(lr, F0, G0, pdiag0)
    else:
        lr = lowrank_precision_seed(spec, params, x, nv, z,
                                    use_pallas=use_pallas, n_valid=n_valid)
        pdiag0 = lr.pdiag
        F0 = jnp.zeros((N, T), jnp.float32)
        G0 = jnp.zeros((T, N), jnp.float32)
        if num_pilot:
            F0, G0, pdiag0 = _pilot_delete_lowrank(
                lr, pilot_idx, pilot_count, F0, G0, pdiag0
            )

    n_scores = rounds if return_scores else 0
    scores0 = jnp.full((n_scores, N), -jnp.inf, jnp.float32)

    def body(r, state):
        B, d, F, G, pdiag, taken, sel, scores = state
        s = (d + nv) * (jnp.mean(pdiag, axis=0) if ens else pdiag)
        s = jnp.where(taken, -jnp.inf, s)
        j = s.argmax().astype(jnp.int32)
        if return_scores:
            scores = lax.dynamic_update_slice(scores, s[None, :], (r, 0))
        t = num_pilot + r
        col = _posterior_col(spec, params, x, j, B)
        B, d = _condition(B, d, col, j, nv[j], t)

        def upd(lr_k, F_k, G_k, pdiag_k):
            u0 = _precision_col(lr_k, j)
            g_j = lax.dynamic_slice_in_dim(G_k, j, 1, axis=1)[:, 0]
            u = u0 - jnp.dot(F_k, g_j, precision=_HIGH)
            pjj = pdiag_k[j]
            F_k = lax.dynamic_update_slice(F_k, u[:, None], (0, t))
            G_k = lax.dynamic_update_slice(G_k, (u / pjj)[None, :], (t, 0))
            pdiag_k = pdiag_k - (u * u) / pjj
            pdiag_k = pdiag_k.at[j].set(1.0)
            return F_k, G_k, pdiag_k

        if ens:
            F, G, pdiag = jax.vmap(upd)(lr, F, G, pdiag)
        else:
            F, G, pdiag = upd(lr, F, G, pdiag)
        taken = taken.at[j].set(True)
        sel = lax.dynamic_update_slice(sel, j[None], (r,))
        return B, d, F, G, pdiag, taken, sel, scores

    state = (B0, d0, F0, G0, pdiag0, taken0, sel0, scores0)
    if rounds:
        state = lax.fori_loop(0, rounds, body, state)
    return SelectionResult(
        selected=state[6], post_var=state[1], scores=state[7], basis=state[0]
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LowRankFactors:
    """The low-rank precision reduced to its SMALL factors — O(M²) state.

    The fused episode step reads the precision ONLY at the sampled set's
    and the path sets' rows (≈ cap + num_sets·k_max ≲ 3k rows), so
    materializing the full (N, M) V factor, dinv, and pdiag at seed time
    is wasted O(N·M) HBM traffic AND 4+ GB of residency at N = 1M.
    This seed keeps just

        Lzz : (M, M) chol of K_zz (+ jitter)
        LB  : (M, M) chol of B = I + A Uᵀ   (the one pass that genuinely
              needs all N — an O(N·M²) matmul)
        z   : (M, d) inducing locations

    and `v_rows_at` reproduces any rows of VT/dinv on demand with
    identical per-row arithmetic (triangular solves are column-
    independent, so a row computed stand-alone equals the same row of
    the full factor).  Halves the re-seed cost at 1M and removes the V
    residency.  Use `lowrank_precision_seed` when a greedy LOOP needs
    the full pdiag/VT state."""

    Lzz: jax.Array
    LB: jax.Array
    z: jax.Array


@partial(jax.jit, static_argnames=("spec", "min_noise", "nv_mult",
                                   "use_pallas"))
def lowrank_factors_seed(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    z: jax.Array,
    *,
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    use_pallas: bool = False,
) -> LowRankFactors:
    """Build the small-factor low-rank seed (see LowRankFactors): ONE
    O(N·M²) pass assembling B = I + A Uᵀ, nothing N-sized kept.
    Candidate noise derived from the fitted params in-program, as
    `lowrank_seed_with_z`."""
    M = z.shape[0]
    N = x.shape[0]
    base = jnp.maximum(jnp.exp(2.0 * params.log_noise), min_noise * min_noise)
    os_ = jnp.exp(params.log_outputscale)
    Kzz = gram(spec, params, z, z) + _Z_JITTER * os_ * jnp.eye(
        M, dtype=jnp.float32
    )
    # adaptive-jitter rescue (see lowrank_precision_seed): try 0 is the
    # plain factor bitwise, so healthy seeds are unchanged
    Lzz, _ = la.safe_cholesky(Kzz, initial_jitter=1e-5)
    if 4 * M * N <= _SEED_CHUNK_BYTES:
        nv = jnp.full((N,), nv_mult, jnp.float32) * base
        if use_pallas:
            Kzx = gram_pallas(spec, params, z, x)
        else:
            Kzx = gram(spec, params, z, x)
        Ut = _seed_solve(Lzz, Kzx, N)  # (M, N)
        qdiag = jnp.sum(Ut * Ut, axis=0)
        d = jnp.maximum(gram_diag(spec, params, x) - qdiag, 0.0) + nv
        A = Ut * (1.0 / d)[None, :]
        B = jnp.eye(M, dtype=jnp.float32) + jnp.dot(A, Ut.T, precision=_HIGH)
        return LowRankFactors(Lzz=Lzz, LB=jnp.linalg.cholesky(B), z=z)

    # streamed pass: B = I + Σ_chunks A_c Ut_cᵀ — the (M, N) Ut is never
    # resident; each chunk's Gram, trisolve, diagonal, and M×M partial
    # product run inside ONE fori_loop body (still a single async
    # dispatch).  The tail chunk is padded with x[0] rows whose A-columns
    # are masked to zero, so padding contributes nothing to B.
    c = min(_SEED_CHUNK, N)
    n_pad = (N + c - 1) // c * c
    x_pad = jnp.concatenate(
        [x, jnp.broadcast_to(x[:1], (n_pad - N, x.shape[1]))]
    )
    valid = (jnp.arange(n_pad) < N).astype(jnp.float32)
    # same GLOBAL-count gate as _seed_solve, so the streamed seed stays
    # in the same arithmetic family as v_rows_at / the mesh seeds.  For
    # M ≤ 1280 streaming only triggers past the gate anyway, but a large
    # explicit M (e.g. --num-inducing 2048) streams from N ≈ 655k — the
    # old hard-wired matmul then disagreed with the sub-gate trisolve
    # family everywhere else in the episode.  The (loop-invariant)
    # explicit inverse is hoisted out of the fori body ourselves.
    use_matmul = N >= _acq.COND_MATMUL_N
    Lzz_inv = la.tri_inv(Lzz) if use_matmul else None

    def body(i, Bacc):
        xc = lax.dynamic_slice_in_dim(x_pad, i * c, c)
        vc = lax.dynamic_slice_in_dim(valid, i * c, c)
        if use_pallas:
            Kzc = gram_pallas(spec, params, z, xc)
        else:
            Kzc = gram(spec, params, z, xc)
        if use_matmul:
            Uc = jnp.dot(Lzz_inv, Kzc, precision=_HIGH)  # ≡ _seed_solve
        else:
            Uc = la.solve_triangular(Lzz, Kzc)
        qc = jnp.sum(Uc * Uc, axis=0)
        dc = (
            jnp.maximum(gram_diag(spec, params, xc) - qc, 0.0)
            + nv_mult * base
        )
        Ac = Uc * (vc / dc)[None, :]
        return Bacc + jnp.dot(Ac, Uc.T, precision=_HIGH)

    B = jnp.eye(M, dtype=jnp.float32) + lax.fori_loop(
        0, n_pad // c, body, jnp.zeros((M, M), jnp.float32)
    )
    return LowRankFactors(Lzz=Lzz, LB=jnp.linalg.cholesky(B), z=z)


def v_rows_at(
    spec: KernelSpec,
    params: KernelParams,
    fac: LowRankFactors,
    x_rows: jax.Array,
    nv_rows: jax.Array,
    n_global: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """(VT_rows (R, M), dinv_rows (R,)) of the low-rank precision at the
    given candidate locations — identical per-row arithmetic to the full
    `lowrank_precision_seed` factors (tested row-for-row).

    `n_global` is the episode's FULL candidate count: at gated sizes the
    rows must be rebuilt with the same explicit-inverse arithmetic the
    (sharded) full factors use (`_seed_solve` — per-column bit-equal to
    a matmul-built factor strip), not the trisolve, so single-chip and
    mesh episodes keep scoring paths with the same arithmetic family.
    The default 0 keeps every existing caller bit-identical."""
    Kzr = gram(spec, params, fac.z, x_rows)  # (M, R)
    Ur = _seed_solve(fac.Lzz, Kzr, n_global)
    qr = jnp.sum(Ur * Ur, axis=0)
    d_r = jnp.maximum(gram_diag(spec, params, x_rows) - qr, 0.0) + nv_rows
    dinv_r = 1.0 / d_r
    Ar = Ur * dinv_r[None, :]
    Vr = _seed_solve(fac.LB, Ar, n_global)  # (M, R)
    return Vr.T, dinv_r


@partial(jax.jit, static_argnames=("spec", "min_noise", "nv_mult",
                                   "use_pallas"))
def lowrank_seed_with_z(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    z: jax.Array,
    *,
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    use_pallas: bool = False,
) -> LowRankPrecision:
    """`lowrank_precision_seed` with the candidate noise derived from the
    fitted params INSIDE the program and the inducing design passed in —
    the episode's per-refit seed (the k-center design depends only on
    the candidate matrix, so the episode computes it ONCE and re-seeds
    with it after every refit instead of re-running the O(N·M) maximin
    chain each time)."""
    base = jnp.maximum(jnp.exp(2.0 * params.log_noise), min_noise * min_noise)
    nv = jnp.full((x.shape[0],), nv_mult, jnp.float32) * base
    return lowrank_precision_seed(spec, params, x, nv, z,
                                  use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("spec", "min_noise", "nv_mult",
                                   "path_utility"))
def plan_episode_step_lowrank(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    idx_pad: jax.Array,
    count: jax.Array,
    noise_scale_pad: jax.Array,
    y_pad: jax.Array,
    sets: jax.Array,
    set_sizes: jax.Array,
    costs: jax.Array,
    lr: LowRankPrecision,
    *,
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    path_utility: str = "per_cost",
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """`acquisition.plan_episode_step(strategy="mi")` with the low-rank
    complement precision — the large-N informative episode's ENTIRE
    per-step device work as ONE program and ONE synchronizing read:
    posterior metrics (μ, σ² from the conditioning pass) fused with
    corrections → joint path-set scoring → per-cost argmax.

    Returns (best_set_index, mean, post_var, scores)."""
    from algp_tpu.acquisition import path_set_argmax, score_candidate_sets

    cap = idx_pad.shape[0]
    base = jnp.maximum(jnp.exp(2.0 * params.log_noise), min_noise * min_noise)
    valid = jnp.arange(cap) < count
    pnv = jnp.where(valid, base * noise_scale_pad, 1.0)
    nv = jnp.full((x.shape[0],), nv_mult, jnp.float32) * base
    d0 = gram_diag(spec, params, x)
    C, d, taken, LA = _batch_pilot_condition(
        spec, params, x, pnv, idx_pad, count, d0
    )
    u = la.solve_triangular(LA, jnp.where(valid, y_pad, 0.0))
    mean = jnp.dot(C.T, u, precision=_HIGH)
    # corrections only ever feed the set scorer's row gathers — build
    # them restricted to the sets' rows (O(R·C²) instead of O(N·M·C))
    F_rows, ZT_rows = lowrank_corrections_at(
        lr, idx_pad, count, sets.reshape(-1)
    )
    scores = score_candidate_sets(
        spec, params, x, nv, C, sets, set_sizes,
        P_lowrank=(lr.VT, lr.dinv, F_rows, ZT_rows, taken), strategy="mi",
        corrections_pregathered=True,
    )
    best = path_set_argmax(scores, set_sizes, costs,
                           path_utility=path_utility)
    return best, mean, jnp.maximum(d, 0.0), scores


@partial(jax.jit, static_argnames=("spec", "min_noise", "nv_mult",
                                   "path_utility", "ensemble"))
def plan_episode_step_lowrank_factors(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    idx_pad: jax.Array,
    count: jax.Array,
    noise_scale_pad: jax.Array,
    y_pad: jax.Array,
    sets: jax.Array,
    set_sizes: jax.Array,
    costs: jax.Array,
    fac: LowRankFactors,
    *,
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    path_utility: str = "per_cost",
    ensemble: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """`plan_episode_step_lowrank` driven by the SMALL-factor seed: the
    VT/dinv rows the step needs (sampled set + path-set rows, ≲3k) are
    materialised on the fly by `v_rows_at` with arithmetic identical to
    the full factor's rows — selections match the full-seed step
    (tests/test_lowrank.py) while the per-refit seed halves its O(N·M)
    traffic and drops the (N, M) V residency entirely.

    `ensemble > 1` (z-ENSEMBLE MI): `fac` then carries a leading K axis
    of INDEPENDENT small-factor seeds (distinct k-center design
    variants); the MI scores are computed per design (vmap) and
    AVERAGED before the utility argmax.  Rationale: at ultra-sparse
    coverage (the 4.19M ladder top) the episode outcome is measurably
    sensitive to small inducing-design perturbations — equally-dispersed
    designs moved one probe field's RMSE 1.02 → 0.53, and raising M
    did not help (benchmarks/README.md) — so averaging over design
    variants attacks the variance directly.  The conditioning pass /
    posterior metrics are design-independent and computed once;
    `ensemble=1` is the unchanged single-design path."""
    from algp_tpu.acquisition import (
        _pblk_finish,
        _pblk_lowrank_prior,
        _score_sets_gathered,
        path_set_argmax,
    )

    cap = idx_pad.shape[0]
    base = jnp.maximum(jnp.exp(2.0 * params.log_noise), min_noise * min_noise)
    valid = jnp.arange(cap) < count
    pnv = jnp.where(valid, base * noise_scale_pad, 1.0)
    nv_fut = base * nv_mult  # uniform future-measurement noise variance
    d0 = gram_diag(spec, params, x)
    C, d, taken, LA = _batch_pilot_condition(
        spec, params, x, pnv, idx_pad, count, d0
    )
    u = la.solve_triangular(LA, jnp.where(valid, y_pad, 0.0))
    mean = jnp.dot(C.T, u, precision=_HIGH)

    # Schur corrections restricted to the path sets' rows, with every
    # VT/dinv row computed from the small factors (lowrank_corrections_at
    # algebra, dedup included)
    same = (idx_pad[:, None] == idx_pad[None, :]) & valid[:, None] & valid[None, :]
    dup = jnp.tril(same, k=-1).any(axis=1)
    vdel = valid & ~dup
    vf = vdel.astype(jnp.float32)
    idx_safe = jnp.where(vdel, idx_pad, 0)
    rows = sets.reshape(-1)
    tk = taken[rows].reshape(sets.shape)
    xs = x[rows].reshape(*sets.shape, -1)
    nvs = jnp.full(sets.shape, 1.0, jnp.float32) * nv_fut
    Bs = jnp.moveaxis(C[:, rows].reshape(cap, *sets.shape), 1, 0)

    def mi_scores(fac_k: LowRankFactors) -> jax.Array:
        """MI joint scores of every path set under ONE seed's complement
        precision — the fac-dependent half of the step."""
        VA, dA = v_rows_at(
            spec, params, fac_k, x[idx_safe],
            jnp.full((cap,), 1.0) * nv_fut, x.shape[0],
        )
        Vr, dr = v_rows_at(
            spec, params, fac_k, x[rows],
            jnp.full(rows.shape, 1.0) * nv_fut, x.shape[0],
        )
        PA = -jnp.dot(VA, VA.T, precision=_HIGH) + jnp.diag(dA)
        pair = vdel[:, None] & vdel[None, :]
        PA = jnp.where(pair, PA, jnp.eye(cap, dtype=jnp.float32))
        LA2 = jnp.linalg.cholesky(PA)
        F_rows = -jnp.dot(Vr, VA.T, precision=_HIGH)  # (R, cap)
        own = (rows[:, None] == idx_safe[None, :]) & vdel[None, :]
        F_rows = F_rows + jnp.where(own, dr[:, None], 0.0)
        F_rows = F_rows * vf[None, :]
        ZT_rows = la.cho_solve(LA2, F_rows.T).T * vf[None, :]

        P0 = _pblk_lowrank_prior(
            sets, Vr.reshape(*sets.shape, -1), dr.reshape(sets.shape)
        )
        Pblk = _pblk_finish(
            P0, F_rows.reshape(*sets.shape, -1),
            ZT_rows.reshape(*sets.shape, -1), tk,
        )
        return _score_sets_gathered(
            spec, params, xs, Bs, nvs, set_sizes, Pblk, strategy="mi",
            sets=sets,
        )

    if ensemble > 1:
        scores = jnp.mean(jax.vmap(mi_scores)(fac), axis=0)
    else:
        scores = mi_scores(fac)
    best = path_set_argmax(scores, set_sizes, costs,
                           path_utility=path_utility)
    return best, mean, jnp.maximum(d, 0.0), scores


@partial(jax.jit, static_argnames=("spec", "min_noise", "nv_mult",
                                   "path_utility", "ensemble"))
def plan_episode_step_lowrank_factors_metrics(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    idx_pad: jax.Array,
    count: jax.Array,
    noise_scale_pad: jax.Array,
    y_pad: jax.Array,
    sets: jax.Array,
    set_sizes: jax.Array,
    costs: jax.Array,
    fac: LowRankFactors,
    f_true: jax.Array,
    obs_mask: jax.Array,
    test_mask: jax.Array,
    *,
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    path_utility: str = "per_cost",
    ensemble: int = 1,
) -> tuple[jax.Array, ...]:
    """Device-reduced-metrics variant of the small-factor step (same
    contract as `plan_episode_step_lowrank_metrics`)."""
    best, mean, d, _ = plan_episode_step_lowrank_factors(
        spec, params, x, idx_pad, count, noise_scale_pad, y_pad,
        sets, set_sizes, costs, fac, min_noise=min_noise, nv_mult=nv_mult,
        path_utility=path_utility, ensemble=ensemble,
    )
    err = mean - f_true
    rmse = jnp.sqrt(
        jnp.sum(obs_mask * err * err) / jnp.maximum(jnp.sum(obs_mask), 1.0)
    )
    rmse_test = jnp.sqrt(
        jnp.sum(test_mask * err * err) / jnp.maximum(jnp.sum(test_mask), 1.0)
    )
    mean_var = jnp.mean(d)
    var_sites = d[sets[best]]
    return best, rmse, rmse_test, mean_var, var_sites


@partial(jax.jit, static_argnames=("spec", "min_noise", "nv_mult",
                                   "path_utility"))
def plan_episode_step_lowrank_metrics(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    idx_pad: jax.Array,
    count: jax.Array,
    noise_scale_pad: jax.Array,
    y_pad: jax.Array,
    sets: jax.Array,
    set_sizes: jax.Array,
    costs: jax.Array,
    lr: LowRankPrecision,
    f_true: jax.Array,
    obs_mask: jax.Array,
    test_mask: jax.Array,
    *,
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    path_utility: str = "per_cost",
) -> tuple[jax.Array, ...]:
    """`plan_episode_step_lowrank` with device-reduced metrics (see
    `acquisition.plan_episode_step_metrics`): the step's one
    synchronizing read returns (best, rmse, rmse_test, mean_var,
    var_sites) — bytes, not the two full N-vectors (~190 ms of tunnel
    transfer per step at N = 1M, measured)."""
    best, mean, d, _ = plan_episode_step_lowrank(
        spec, params, x, idx_pad, count, noise_scale_pad, y_pad,
        sets, set_sizes, costs, lr, min_noise=min_noise, nv_mult=nv_mult,
        path_utility=path_utility,
    )
    err = mean - f_true
    rmse = jnp.sqrt(
        jnp.sum(obs_mask * err * err) / jnp.maximum(jnp.sum(obs_mask), 1.0)
    )
    rmse_test = jnp.sqrt(
        jnp.sum(test_mask * err * err) / jnp.maximum(jnp.sum(test_mask), 1.0)
    )
    mean_var = jnp.mean(d)
    var_sites = d[sets[best]]
    return best, rmse, rmse_test, mean_var, var_sites


def fit_and_select_lowrank(
    spec: KernelSpec,
    fitcfg,
    x_train: jax.Array,
    y_train: jax.Array,
    x: jax.Array,
    pilot_idx: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
    num_inducing: int,
    key: Optional[jax.Array] = None,
    use_pallas: bool = False,
):
    """The north-star workload at 100k scale: multi-restart MLL fit +
    greedy low-rank MI selection — ONE fused device program, mirroring
    `acquisition.fit_and_select` (one dispatch, one transfer; the k-center
    inducing design is computed inside the program too).

    Returns (fit_result, SelectionResult).
    """
    N = x.shape[0]
    x_pad, _ = pad_candidates(x, jnp.ones((N,), jnp.float32))
    if key is None:
        key = jax.random.PRNGKey(0)
    fit_res, sel = _fit_and_select_lowrank_jit(
        spec, fitcfg, x_train, y_train, x_pad, pilot_idx, key,
        rounds=rounds, num_pilot=num_pilot, num_inducing=num_inducing,
        n_valid=N, use_pallas=use_pallas,
    )
    if x_pad.shape[0] != N:
        sel = SelectionResult(
            selected=sel.selected, post_var=sel.post_var[:N],
            scores=sel.scores[:, :N], basis=sel.basis[:, :N],
        )
    return fit_res, sel


@partial(
    jax.jit,
    static_argnames=("spec", "fitcfg", "rounds", "num_pilot", "num_inducing",
                     "n_valid", "use_pallas"),
)
def _fit_and_select_lowrank_jit(spec, fitcfg, x_train, y_train, x_pad,
                                pilot_idx, key, *, rounds, num_pilot,
                                num_inducing, n_valid, use_pallas):
    from algp_tpu.models import gp as gp_mod

    inits = gp_mod.make_restart_inits(spec, fitcfg, key)
    fit_res = gp_mod._fit_jit(
        spec, fitcfg, x_train, y_train, None, inits, False
    )
    nv_base = jnp.maximum(
        jnp.exp(2.0 * fit_res.params.log_noise), fitcfg.min_noise**2
    )
    nv = jnp.where(
        jnp.arange(x_pad.shape[0]) < n_valid, nv_base, 1.0
    ).astype(jnp.float32)
    zidx = kcenter_indices(x_pad, min(num_inducing, n_valid),
                           jnp.asarray(n_valid, jnp.int32))
    z = x_pad[zidx]
    sel = _greedy_select_lowrank_jit(
        spec, fit_res.params, x_pad, nv, pilot_idx,
        jnp.asarray(num_pilot, jnp.int32),
        jnp.full((num_pilot,), nv_base, jnp.float32), z,
        rounds=rounds, num_pilot=num_pilot, return_scores=False,
        n_valid=n_valid, use_pallas=use_pallas,
    )
    return fit_res, sel
