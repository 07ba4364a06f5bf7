"""L2 — greedy entropy / mutual-information acquisition, fully on device.

Capability parity (SURVEY.md §2 C6-C8; BASELINE.json:9-10): the reference
scores every grid candidate per round (posterior variance for entropy,
Krause-Singh-Guestrin ratio for MI), argmaxes, conditions the posterior on
the winner, and repeats — refactorizing the Gram each round, O(n³)/round.

TPU-native redesign — **no refactorization anywhere**:

  * The posterior over ALL N candidates is maintained incrementally via a
    growing basis matrix B (t × N): row t is the normalised posterior
    covariance column of the t-th selected point,

        c_t = (K[:, j_t] − B_{<t}ᵀ B_{<t}[:, j_t]) / √(d[j_t] + σ²_{j_t})
        d   ← d − c_t²        (d = posterior variance of every candidate)

    This *is* the rank-1 Cholesky update of the joint covariance demanded
    by BASELINE.json:5 — B's columns at the selected indices form the
    Cholesky factor of K_AA + Σ_A — but expressed so each round costs one
    (T×N) matvec + one VPU sweep: O(N·T) instead of O(N·n²).
  * The Krause-MI denominator σ²(y | V∖A∖y) uses the precision identity
    Var(z_y | z_rest) = 1/[(K_VV+Σ)⁻¹]_yy.  The complement precision is
    IMPLICIT — W = L⁻¹ (blocked MXU tri_inv) plus Schur correction
    factors F/G updated rank-1 per round; the per-round column comes from
    one flat-pipelined Pallas pass over W's contributing triangle tiles
    (ops.updates.wtw_column).
  * The whole `rounds`-round loop runs inside ONE `lax.fori_loop`; the
    host reads back only the selected index sequence (SURVEY.md §3.4).
  * Fidelity contract: scores are computed in f32 with fixed reduction
    order; argmax is `jnp.argmax` (lowest index wins ties), matching the
    f64 oracle in tests/oracle.py.

Path-constrained variants (config 5) score candidate *sets*: joint
measurement entropy ½log det(Cov_S|A + Σ_S) and set-MI via the same
precision identity, vmapped over the enumerated paths.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from algp_tpu.config import PATH_UTILITIES
from algp_tpu.ops import linalg as la
from algp_tpu.ops.gram import gram_pallas_with_noise
from algp_tpu.ops.kernels import KernelParams, KernelSpec, gram, gram_diag
from algp_tpu.ops.updates import wtw_column

_HIGH = lax.Precision.HIGHEST

# Candidate count at and above which the conditioning pass solves its
# (cap, N) system by explicit-inverse matmul instead of the XLA trisolve
# (ops/linalg.solve_triangular_matmul — measured ~25 ms/step at 4.19M,
# ~6-10 ms at 1M).  2^20 keeps every sub-1M preset — the scales the CPU
# goldens and f64 oracles pin — bit-identical; the sharded step gates on
# the same GLOBAL candidate count so mesh and single-chip agree.
COND_MATMUL_N = 1 << 20


def cond_solve(L: jax.Array, B: jax.Array, n_global: int) -> jax.Array:
    """The ONE gate between the two triangular-solve families: explicit-
    inverse MXU matmul at/above COND_MATMUL_N candidates, the plain XLA
    trisolve below.  `n_global` must be the UNPADDED global candidate
    count — callers holding an alignment-padded (256/512-multiple) or
    mesh-padded matrix must pass the true count, not its shape: gating on
    the padded length would flip the arithmetic family between the padded
    and unpadded consumers of the same episode in the ±one-pad-block
    window around the threshold (near-tie selections then diverge —
    a gate-forced mesh test caught exactly this class).  Reads the module
    attribute so tests can force the gate by patching COND_MATMUL_N."""
    if n_global >= COND_MATMUL_N:
        return la.solve_triangular_matmul(L, B)
    return la.solve_triangular(L, B)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SelectionResult:
    """Outcome of a greedy selection run.

    selected : (rounds,) int32 — chosen candidate indices, in order
    post_var : (N,) posterior variance of every candidate after all rounds
    scores   : (rounds, N) per-round score fields (all -inf at taken
               entries), or a (0, N) placeholder when traces are off
    basis    : (T, N) the conditioning basis (pilot rows first)
    """

    selected: jax.Array
    post_var: jax.Array
    scores: jax.Array
    basis: jax.Array


def pad_candidates(
    x: jax.Array, nv: jax.Array, *, align: int = 512
) -> tuple[jax.Array, jax.Array]:
    """Pad the candidate axis to an `align` multiple with inert sentinels.

    Padded candidates sit at distinct far-away coordinates (kernel ≈ 0 to
    everything) and are born `taken` downstream, so they are inert for
    selection and keep K_pad well-conditioned for the MI inversion.  The
    sharded selection paths pass align = lcm(512, shards) so every shard
    gets an equal block.
    """
    N = x.shape[0]
    N_pad = (N + align - 1) // align * align
    if N_pad == N:
        return x, nv
    pad = N_pad - N
    far = -1e6 - 1e3 * jnp.arange(1, pad + 1, dtype=jnp.float32)
    x = jnp.concatenate([x, jnp.tile(far[:, None], (1, x.shape[1]))], axis=0)
    nv = jnp.concatenate([nv, jnp.ones((pad,), nv.dtype)])
    return x, nv


def _posterior_col(spec, params, x, j, B):
    """Posterior covariance column for candidate j given the filled basis
    rows of B (unfilled rows are zero).  O(N·d + N·T), fixed reduction
    order."""
    xj = lax.dynamic_slice_in_dim(x, j, 1, axis=0)
    prior_col = gram(spec, params, x, xj)[:, 0]
    Bj = lax.dynamic_slice_in_dim(B, j, 1, axis=1)[:, 0]  # B[:, j]
    proj = jnp.dot(B.T, Bj, precision=_HIGH)
    return prior_col - proj


def _condition(B, d, col, j, nv_j, t):
    """Rank-1 conditioning on a noisy observation at candidate j."""
    denom = jnp.sqrt(d[j] + nv_j)
    c = col / denom
    B = lax.dynamic_update_slice(B, c[None, :], (t, 0))
    d = d - c * c
    return B, d


def greedy_select(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    pilot_idx: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
    strategy: str = "entropy",
    return_scores: bool = False,
    pilot_count: Optional[jax.Array] = None,
    pilot_nv: Optional[jax.Array] = None,
) -> SelectionResult:
    """Greedy active sampling over N candidates, one jitted device loop.

    x         : (N, dim) all candidate locations (+features)
    nv        : (N,) effective observation-noise variance per candidate
                (FUTURE measurements)
    pilot_idx : (num_pilot,) indices already sampled (conditioned first,
                never re-selected); pass shape-(0,) for none
    pilot_nv  : optional (num_pilot,) per-OBSERVATION noise variance for
                the pilot measurements (heteroscedastic conditioning; a
                node sampled twice with different modalities keeps both
                scales).  Defaults to nv gathered at pilot_idx
    pilot_count: optional traced scalar ≤ num_pilot — only the first
                pilot_count pilot slots are real (static-shape padding for
                the episode loop; padded slots are skipped exactly)
    strategy  : "entropy" — score = d + nv (measurement entropy, monotone
                in ½log 2πe σ²); "mi" — Krause ratio (d+nv)/(1/P_yy)

    Matches tests/oracle.py greedy_{variance,mi}_selection index-for-index.
    """
    if strategy not in ("entropy", "mi"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if pilot_count is None:
        pilot_count = jnp.asarray(num_pilot, jnp.int32)
    if pilot_nv is None:
        pilot_nv = nv[pilot_idx] if num_pilot else jnp.zeros((0,), jnp.float32)

    # Pad the candidate axis to a 512 multiple: every big op in the loop
    # (Gram, Cholesky, tri_inv, the N×N matmuls, the per-round passes over
    # P) runs measurably faster on MXU/VPU-aligned shapes (a 10000→10240
    # pad cut the seeding matmul ~2×), and the streamed precision-column
    # kernel uses 512² tiles (fewer, bigger DMAs — its per-round cost is
    # DMA-latency-bound, not bandwidth-bound).
    N = x.shape[0]
    x, nv = pad_candidates(x, nv, align=512)
    N_pad = x.shape[0]
    res = _greedy_select_jit(
        spec, params, x, nv, pilot_idx, pilot_count, pilot_nv,
        rounds=rounds, num_pilot=num_pilot, strategy=strategy,
        return_scores=return_scores, n_valid=N,
    )
    if N_pad != N:
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
        "spec", "rounds", "num_pilot", "strategy", "return_scores", "n_valid",
    ),
)
def _greedy_select_jit(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    pilot_idx: jax.Array,
    pilot_count: jax.Array,
    pilot_nv: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
    strategy: str,
    return_scores: bool,
    n_valid: Optional[int] = None,
) -> SelectionResult:
    N = x.shape[0]
    if n_valid is None:
        n_valid = N
    T = num_pilot + rounds
    d0 = gram_diag(spec, params, x)
    B0 = jnp.zeros((T, N), jnp.float32)
    # alignment-padding candidates (index ≥ n_valid) are born taken
    taken0 = jnp.arange(N) >= n_valid
    sel0 = jnp.zeros((rounds,), jnp.int32)

    # ---- pilot phase, batched (NOT a loop): one m×m Cholesky + one
    # m×N trisolve conditions on all pilots at once — mathematically
    # identical to sequential rank-1 conditioning in pilot order
    if num_pilot:
        C, d0, taken_pilot, _ = _batch_pilot_condition(
            spec, params, x, pilot_nv, pilot_idx, pilot_count, d0,
            n_valid=n_valid,
        )
        taken0 = jnp.logical_or(taken0, taken_pilot)
        B0 = lax.dynamic_update_slice(B0, C, (0, 0))

    if strategy == "mi":
        # ---- implicit complement precision:  P_t = WᵀW − F Gᵀ-stack.
        # Materialising P = (K+Σ)⁻¹ costs a 2N³ MXU matmul (≈95 ms at
        # N=10k) plus an 800 MB read-modify-write of P per round; instead
        # keep only W = L⁻¹ (blocked tri_inv) and the Schur-correction
        # factors F (N×T), G (T×N).  diag P0 is one elementwise pass over
        # W; the per-round column P_t[:,j] is two *coalesced* matvec
        # passes over W (a direct strided column gather from a 400 MB
        # matrix costs ~27 ms on v5e HBM — the matvec form reads the same
        # bytes sequentially in ~1 ms) minus a small F·G[:,j] correction.
        K = gram_pallas_with_noise(spec, params, x, nv / params.noise_var)
        W = la.tri_inv(jnp.linalg.cholesky(K))
        pdiag0 = jnp.sum(W * W, axis=0)  # diag(WᵀW) = col-sums of W²
        F0 = jnp.zeros((N, T), jnp.float32)
        G0 = jnp.zeros((T, N), jnp.float32)
        if num_pilot:
            F0, G0, pdiag0 = _implicit_pilot_delete(
                W, pilot_idx, pilot_count, F0, G0, pdiag0, num_pilot
            )
    else:
        W = jnp.zeros((0, 0), jnp.float32)
        F0 = jnp.zeros((0, 0), jnp.float32)
        G0 = jnp.zeros((0, 0), jnp.float32)
        pdiag0 = jnp.zeros((0,), jnp.float32)

    n_scores = rounds if return_scores else 0
    scores0 = jnp.full((n_scores, N), -jnp.inf, jnp.float32)

    # ---- greedy phase: `rounds` inherently-sequential device iterations
    def body(r, state):
        B, d, F, G, pdiag, taken, sel, scores = state
        num = d + nv
        # MI ratio form: num / (1/P_yy) = num · P_yy
        s = num if strategy == "entropy" else num * pdiag
        s = jnp.where(taken, -jnp.inf, s)
        j = s.argmax().astype(jnp.int32)

        if return_scores:
            scores = lax.dynamic_update_slice(scores, s[None, :], (r, 0))

        t = num_pilot + r
        col = _posterior_col(spec, params, x, j, B)
        B, d = _condition(B, d, col, j, nv[j], t)
        if strategy == "mi":
            # current precision column: u = (WᵀW)[:,j] − F·G[:,j]
            # (one fused Pallas pass over W; see ops.updates.wtw_column).
            # 512² tiles measured best at N=10k: the round is DMA-latency
            # bound, so 256² pays 4× the copy count (+60 ms/episode) while
            # 1024² coarsens the triangle skip (+9 ms) and squeezes VMEM.
            u0 = wtw_column(W, j, tile=512)
            g_j = lax.dynamic_slice_in_dim(G, j, 1, axis=1)[:, 0]
            u = u0 - jnp.dot(F, g_j, precision=_HIGH)
            pjj = pdiag[j]
            F = lax.dynamic_update_slice(F, u[:, None], (0, t))
            G = lax.dynamic_update_slice(G, (u / pjj)[None, :], (t, 0))
            pdiag = pdiag - (u * u) / pjj
            pdiag = pdiag.at[j].set(1.0)
        taken = taken.at[j].set(True)
        sel = lax.dynamic_update_slice(sel, j[None], (r,))
        return B, d, F, G, pdiag, taken, sel, scores

    state = (B0, d0, F0, G0, pdiag0, taken0, sel0, scores0)
    if rounds:
        state = lax.fori_loop(0, rounds, body, state)
    B = state[0]
    d = state[1]
    sel = state[6]
    scores = state[7]
    return SelectionResult(selected=sel, post_var=d, scores=scores, basis=B)


def _implicit_pilot_delete(W, pilot_idx, pilot_count, F, G, pdiag, num_pilot):
    """Batch-remove the pilot block from the implicit precision.

    P1 = P0 − U0 PA⁻¹ U0ᵀ with U0 = P0[:,A] = Wᵀ(W E_A): stored as
    correction factors F[:, :m] = U0, G[:m] = PA⁻¹U0ᵀ.  Padded pilot
    slots contribute exact zero columns/rows.

    Duplicate pilot indices (a node measured twice, e.g. with different
    modalities) are deduplicated: in the sequential Schur scheme the
    second delete of an already-removed index is an exact no-op, whereas
    in the batched form it would make PA singular and NaN-poison every
    MI score downstream.  Only the first occurrence participates.
    """
    N = W.shape[0]
    m = num_pilot
    valid = jnp.arange(m) < pilot_count
    same = (pilot_idx[:, None] == pilot_idx[None, :]) & valid[:, None] & valid[None, :]
    dup = jnp.tril(same, k=-1).any(axis=1)  # an earlier valid slot holds it
    valid = valid & ~dup
    idx_safe = jnp.where(valid, pilot_idx, 0)
    E = (
        jnp.zeros((N, m), jnp.float32)
        .at[idx_safe, jnp.arange(m)]
        .set(valid.astype(jnp.float32))
    )
    WE = jnp.dot(W, E, precision=_HIGH)  # (N, m) = W[:, A]
    U0 = jnp.dot(WE.T, W, precision=_HIGH).T  # (N, m) = P0[:, A]
    PA = U0[idx_safe, :] * valid[:, None].astype(jnp.float32)
    pair = valid[:, None] & valid[None, :]
    PA = jnp.where(pair, PA, jnp.eye(m, dtype=jnp.float32))
    LA = jnp.linalg.cholesky(PA)
    Z = la.cho_solve(LA, U0.T)  # (m, N) = PA⁻¹ U0ᵀ
    Z = Z * valid[:, None].astype(jnp.float32)
    F = lax.dynamic_update_slice(F, U0, (0, 0))
    G = lax.dynamic_update_slice(G, Z, (0, 0))
    pdiag = pdiag - jnp.sum(U0 * Z.T, axis=1)
    taken_mask = (
        jnp.zeros((N,), bool).at[jnp.where(valid, pilot_idx, N)]
        .set(True, mode="drop")
    )
    pdiag = jnp.where(taken_mask, 1.0, pdiag)
    return F, G, pdiag


def _batch_pilot_condition(spec, params, x, pilot_nv, pilot_idx, pilot_count,
                           d0, n_valid=None):
    """Condition the candidate field on all pilots in ONE batched op.

    Returns (C, d, taken, LA): C (m_max, N) are the basis rows (row t is
    the normalised posterior-covariance row of pilot t given pilots < t —
    the rows of L_A⁻¹ K(X_A, X) where L_A factors K_AA + Σ_A in pilot
    order), d the updated posterior variances, taken the pilot mask, LA
    the (identity-padded) Cholesky factor of K_AA + Σ_A — returned so the
    fused episode step can also form the posterior MEAN (μ = Cᵀ L_A⁻¹ y)
    without a second factorization.  Padded pilot slots (≥ pilot_count)
    are identity-padded and contribute exactly zero.

    `n_valid`: the UNPADDED candidate count for `cond_solve`'s family
    gate when x carries alignment padding (defaults to x's length —
    correct for every unpadded caller).
    """
    m_max = pilot_idx.shape[0]
    N = x.shape[0]
    valid = jnp.arange(m_max) < pilot_count
    idx_safe = jnp.where(valid, pilot_idx, 0)
    xA = x[idx_safe]
    KA = gram(spec, params, xA, xA) + jnp.diag(pilot_nv)
    pair = valid[:, None] & valid[None, :]
    KA = jnp.where(pair, KA, jnp.eye(m_max, dtype=jnp.float32))
    LA = jnp.linalg.cholesky(KA)
    Kc = gram(spec, params, xA, x) * valid[:, None].astype(jnp.float32)
    # cap-sized factor vs a ≥1M-candidate RHS: the XLA trisolve's
    # row-substitution chain costs ~27 ms/step at 4.19M where the
    # explicit-inverse matmul costs ~2.  Gated (cond_solve) so every
    # sub-1M preset — the CPU-golden and f64-oracle scales — stays
    # bit-identical.
    C = cond_solve(LA, Kc, N if n_valid is None else n_valid)
    d = d0 - jnp.sum(C * C, axis=0)
    taken = (
        jnp.zeros((N,), bool)
        .at[jnp.where(valid, pilot_idx, N)]
        .set(True, mode="drop")
    )
    return C, d, taken, LA


# ---------------------------------------------------------------------------
# Path-constrained set scoring (config 5)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("spec", "strategy",
                                  "corrections_pregathered"))
def score_candidate_sets(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    basis: jax.Array,
    sets: jax.Array,
    set_sizes: jax.Array,
    P: Optional[jax.Array] = None,
    P_implicit: Optional[tuple] = None,
    P_lowrank: Optional[tuple] = None,
    *,
    strategy: str = "entropy",
    corrections_pregathered: bool = False,
) -> jax.Array:
    """Joint utility of padded candidate *sets* (path sample sets), batched.

    sets      : (num_sets, k_max) candidate indices, padded with 0
    set_sizes : (num_sets,) true sizes; padded slots are masked to identity
    basis     : conditioning state from a previous `greedy_select`
                (or zeros for the prior)
    P         : dense complement precision — small-N reference path for
                strategy="mi" (tests cross-check the implicit path with it)
    P_implicit: (WT, F, ZT, taken) implicit complement precision
                P = WᵀW − F·ZTᵀ from `implicit_complement_precision` +
                `implicit_corrections` — the production MI path: P is
                never materialised, and the per-set blocks come from
                *row* gathers of WT/F/ZT (coalesced; a column gather from
                a 400 MB HBM-resident W costs ~27 ms on a v5e).  `taken`
                (N,) bool marks deleted/sampled candidates: their implicit
                rows are exactly zero (Schur elimination), so they get the
                dense path's inert marker (zero row/col, diag 1 ⇒ zero
                log-det contribution) — path sets MAY revisit sampled
                nodes
    P_lowrank : (VT, dinv, F, ZT, taken) — same contract as P_implicit
                but the prior precision is the inducing-point
                factorization P̃0 = diag(dinv) − VT·VTᵀ
                (acquisition_lowrank; large-N episodes): per-set blocks
                come from row gathers of VT
    corrections_pregathered : the correction factors F/ZT arrive already
                gathered at the FLATTENED set rows, shape
                (num_sets·k_max, C) (acquisition_lowrank.
                lowrank_corrections_at — the full (N, C) factors are
                never built at large N).  Explicit flag, NOT inferred
                from shapes: a grid where N == num_sets·k_max would make
                shape inference silently skip the row gather and score
                sets from the wrong correction rows

    entropy:  the INFORMATION GAIN of the measurements about the field,
              I(f_S; z_S | A) = ½[log det(Cov_S|A + Σ_S) − log det(Σ_S)]
              — non-negative by construction, so per-cost utilities rank
              correctly (raw joint entropy goes negative once posterior
              variances drop below ~1 and would then FAVOR expensive
              paths when divided by cost)
    mi:       H(z_S | A) − H(z_S | z_V∖A∖S)
              = ½[ log det(Cov_S|A + Σ_S) + log det(P_SS) ]
    Padded slots contribute identity rows ⇒ zero log-det contribution.
    One small k_max×k_max Cholesky per set, vmapped over the path batch.

    Structure: all candidate-axis GATHERS happen first, then the scoring
    runs on the gathered per-set blocks (`_pblk_finish` +
    `_score_sets_gathered`) — the sharded episode step
    (parallel.sharded_episode) performs the same gathers as masked psums
    over the mesh and reuses those helpers verbatim, so mesh and
    single-chip path choices follow identical arithmetic.
    """
    if strategy == "mi" and P is None and P_implicit is None \
            and P_lowrank is None:
        raise ValueError(
            "score_candidate_sets(strategy='mi') needs the complement "
            "precision — implicit_complement_precision + "
            "implicit_corrections (production), lowrank_precision_seed + "
            "lowrank_corrections (large N), or complement_precision "
            "(dense reference)"
        )
    idx_flat = sets.reshape(-1)

    if strategy == "mi" and (P_implicit is not None or P_lowrank is not None):
        if P_implicit is not None:
            WT, F, ZT, taken = P_implicit
            Wr = WT[idx_flat].reshape(*sets.shape, -1)  # (S, k, N) row gathers
            P0 = jnp.einsum("skn,sln->skl", Wr, Wr, precision=_HIGH)
        else:
            VT, dinv, F, ZT, taken = P_lowrank
            Vr = VT[idx_flat].reshape(*sets.shape, -1)  # (S, k, M)
            dr = dinv[idx_flat].reshape(sets.shape)  # (S, k)
            P0 = _pblk_lowrank_prior(sets, Vr, dr)
        if corrections_pregathered:
            Fr = F.reshape(*sets.shape, -1)
            Zr = ZT.reshape(*sets.shape, -1)
        else:
            Fr = F[idx_flat].reshape(*sets.shape, -1)  # (S, k, C)
            Zr = ZT[idx_flat].reshape(*sets.shape, -1)
        tk = taken[idx_flat].reshape(sets.shape)  # (S, k)
        Pblk = _pblk_finish(P0, Fr, Zr, tk)
    elif strategy == "mi":
        Pblk = P[sets[:, :, None], sets[:, None, :]]  # dense reference
    else:
        Pblk = None

    xs = x[idx_flat].reshape(*sets.shape, -1)  # (S, k, dim)
    nvs = nv[idx_flat].reshape(sets.shape)  # (S, k)
    Bs = jnp.moveaxis(
        basis[:, idx_flat].reshape(basis.shape[0], *sets.shape), 1, 0
    )  # (S, T, k)
    return _score_sets_gathered(
        spec, params, xs, Bs, nvs, set_sizes, Pblk, strategy=strategy,
        sets=sets,
    )


def _pblk_lowrank_prior(sets, Vr, dr):
    """Per-set prior precision blocks from gathered low-rank rows:
    P̃0_SS = −Vr·Vrᵀ with the diagonal D⁻¹ term wherever two set slots
    reference the SAME candidate (paths may revisit a node) — exactly as
    the dense/WᵀW forms place P̃_ii there naturally."""
    P0 = -jnp.einsum("skm,slm->skl", Vr, Vr, precision=_HIGH)
    same = (sets[:, :, None] == sets[:, None, :]).astype(jnp.float32)
    return P0 + same * dr[:, :, None]


def _pblk_finish(P0, Fr, Zr, tk):
    """Apply the gathered Schur corrections and the inert marker for
    already-deleted entries to per-set prior precision blocks.

    P0 (S, k, k), Fr/Zr (S, k, C), tk (S, k) bool.  Deleted/sampled
    candidates' implicit rows are exactly zero (Schur elimination), so
    they get the dense path's inert marker (zero row/col, diag 1 ⇒ zero
    log-det contribution) — path sets MAY revisit sampled nodes."""
    k_max = tk.shape[1]
    Pblk = P0 - jnp.einsum("skc,slc->skl", Fr, Zr, precision=_HIGH)
    off = tk[:, :, None] | tk[:, None, :]
    Pblk = jnp.where(off, 0.0, Pblk)
    eye = jnp.eye(k_max, dtype=bool)[None]
    return jnp.where(eye & tk[:, :, None], 1.0, Pblk)


def _score_sets_gathered(
    spec, params, xs, Bs, nvs, set_sizes, Pblk, *, strategy, sets=None
):
    """Joint set utilities from PRE-GATHERED per-set blocks:
    xs (S, k, dim) candidate locations, Bs (S, T, k) basis columns,
    nvs (S, k) measurement noise, Pblk (S, k, k) complement-precision
    blocks (mi) or None (entropy).  Shared by `score_candidate_sets`
    (plain gathers) and the mesh episode step (masked-psum gathers).

    `sets` (S, k int32, optional): the integer candidate indices behind
    the gathered rows.  When given, WITHIN-set duplicate slots (a path
    that re-enters an unsampled cell — reachable on narrow grids once
    the budget slice covers a row round-trip) are masked like padding:
    a set is a SET, so the duplicate contributes zero information.
    Without the mask the duplicate's two identical precision rows make
    the per-set MI block exactly singular and its f32 Cholesky NaN,
    which then WINS `path_set_argmax` (NaN propagates through max and
    argmax).  Duplicate-free sets are bit-identical either way."""
    k_max = xs.shape[1]
    if sets is not None:
        dup = jnp.tril(
            sets[:, :, None] == sets[:, None, :], k=-1
        ).any(axis=2)  # (S, k): slot repeats an earlier slot's candidate
        first = ~dup
    else:
        first = jnp.ones(xs.shape[:2], bool)

    def one(x_s, B_s, nv_s, size, f_s, Pss):
        mask = (jnp.arange(k_max) < size) & f_s
        Kp = gram(spec, params, x_s, x_s)  # prior block
        Kpost = Kp - jnp.dot(B_s.T, B_s, precision=_HIGH)
        M1 = Kpost + jnp.diag(nv_s)
        M1 = jnp.where(mask[:, None] & mask[None, :], M1, 0.0)
        M1 = M1 + jnp.diag(jnp.where(mask, 1e-6, 1.0))
        L1 = jnp.linalg.cholesky(M1)
        h = jnp.sum(jnp.log(jnp.diagonal(L1)))
        if strategy == "entropy":
            # subtract the noise-entropy floor ⇒ information gain ≥ 0
            return h - 0.5 * jnp.sum(jnp.where(mask, jnp.log(nv_s), 0.0))
        Pss = jnp.where(mask[:, None] & mask[None, :], Pss, 0.0)
        Pss = Pss + jnp.diag(jnp.where(mask, 0.0, 1.0))
        L2 = jnp.linalg.cholesky(Pss)
        return h + jnp.sum(jnp.log(jnp.diagonal(L2)))

    if Pblk is not None:
        return jax.vmap(one)(xs, Bs, nvs, set_sizes, first, Pblk)
    return jax.vmap(lambda a, b, c, s, f: one(a, b, c, s, f, None))(
        xs, Bs, nvs, set_sizes, first
    )


def fit_and_select(
    spec: KernelSpec,
    fitcfg,
    x_train: jax.Array,
    y_train: jax.Array,
    x: jax.Array,
    pilot_idx: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
    strategy: str = "mi",
    key: Optional[jax.Array] = None,
):
    """The north-star workload — multi-restart MLL fit + greedy selection
    over all N candidates — as ONE fused device program (one dispatch,
    one transfer; each separate call through this environment's TPU relay
    costs ~27 ms).  Candidate noise is the FITTED base noise variance.
    This is the public entry bench.py / tests/test_perf.py measure.

    Returns (fit_result, SelectionResult).
    """
    N = x.shape[0]
    x_pad, _ = pad_candidates(x, jnp.ones((N,), jnp.float32))
    if key is None:
        key = jax.random.PRNGKey(0)
    fit_res, sel = _fit_and_select_jit(
        spec, fitcfg, x_train, y_train, x_pad, pilot_idx, key,
        rounds=rounds, num_pilot=num_pilot, strategy=strategy, n_valid=N,
    )
    if x_pad.shape[0] != N:
        sel = SelectionResult(
            selected=sel.selected, post_var=sel.post_var[:N],
            scores=sel.scores[:, :N], basis=sel.basis[:, :N],
        )
    return fit_res, sel


@partial(
    jax.jit,
    static_argnames=("spec", "fitcfg", "rounds", "num_pilot", "strategy",
                     "n_valid"),
)
def _fit_and_select_jit(spec, fitcfg, x_train, y_train, x_pad, pilot_idx,
                        key, *, rounds, num_pilot, strategy, n_valid):
    from algp_tpu.models import gp as gp_mod

    # restart inits derived INSIDE the program: doing this eagerly in the
    # wrapper costs several relay dispatches per episode (~40 ms measured)
    inits = gp_mod.make_restart_inits(spec, fitcfg, key)
    fit_res = gp_mod._fit_jit(
        spec, fitcfg, x_train, y_train, None, inits, False
    )
    nv_base = jnp.maximum(
        jnp.exp(2.0 * fit_res.params.log_noise), fitcfg.min_noise**2
    )
    # padded sentinel candidates keep the inert nv = 1 convention
    nv = jnp.where(
        jnp.arange(x_pad.shape[0]) < n_valid, nv_base, 1.0
    ).astype(jnp.float32)
    sel = _greedy_select_jit(
        spec, fit_res.params, x_pad, nv, pilot_idx,
        jnp.asarray(num_pilot, jnp.int32),
        jnp.full((num_pilot,), nv_base, jnp.float32),
        rounds=rounds, num_pilot=num_pilot, strategy=strategy,
        return_scores=False, n_valid=n_valid,
    )
    return fit_res, sel


#: "per_sample" price gate: paths whose cost-per-sample exceeds the
#: enumeration's best by more than this factor are ineligible (they buy
#: strictly less campaign data for the same budget).
_PRICE_TOL = 1.25


def path_set_argmax(
    scores: jax.Array,
    set_sizes: jax.Array,
    costs: jax.Array,
    *,
    path_utility: str = "per_cost",
    price_tol: float = _PRICE_TOL,
) -> jax.Array:
    """Pick the winning path set from its joint-information scores — the
    single cost-model of every fused planning step (exact, low-rank,
    sharded).

    "per_cost" (default, bit-identical to the pre-round-4 rule):
    information gain per unit path cost, clamped ≥ 0 so a tiny negative
    f32 score can never make an expensive path beat a cheap one;
    jnp.argmax keeps the deterministic min-index tie-break.

    "per_sample" (yield-aware, SURVEY §8c item 14 / VERDICT r3 #2):
    when `samples_per_step` caps what a path can yield, every qualifying
    path buys at most k_max samples, so a path at twice the cost halves
    the campaign's total data no matter how well its spread-out set
    scores — measured at the 4.19M ladder top, where per-cost MI spent
    the whole budget in 9 long paths (168 samples) while entropy bought
    ~200 in 15-16 short ones and won the paired study
    (benchmarks/README.md, 4M mechanism section).  Here the argmax is
    restricted to paths within `price_tol` of the enumeration's best
    cost-per-sample (the sample price a budget actually pays) and ranks
    THOSE by information per expected sample — placement quality decides
    among the paths with equally good sample economics, never against
    them.
    """
    if path_utility not in PATH_UTILITIES:
        raise ValueError(
            f"unknown path_utility {path_utility!r}; use {PATH_UTILITIES}"
        )
    pos = jnp.maximum(scores, 0.0)
    valid = set_sizes > 0
    if path_utility == "per_cost":
        util = pos / (costs + 1e-6)
        return jnp.argmax(jnp.where(valid, util, -jnp.inf)).astype(jnp.int32)
    k = jnp.maximum(set_sizes.astype(jnp.float32), 1.0)
    price = costs / k
    p_min = jnp.min(jnp.where(valid, price, jnp.inf))
    eligible = valid & (price <= price_tol * p_min)
    util = jnp.where(eligible, pos / k, -jnp.inf)
    return jnp.argmax(util).astype(jnp.int32)


@partial(jax.jit, static_argnames=("spec", "strategy", "path_utility"))
def plan_path_step(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    idx_pad: jax.Array,
    count: jax.Array,
    pilot_nv: jax.Array,
    sets: jax.Array,
    set_sizes: jax.Array,
    costs: jax.Array,
    W: Optional[jax.Array] = None,
    WT: Optional[jax.Array] = None,
    *,
    strategy: str = "entropy",
    path_utility: str = "per_cost",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The episode's ENTIRE per-replan device work as ONE program:
    conditioning on everything sampled → (MI) fresh implicit-precision
    corrections → joint path-set scoring → utility argmax
    (`path_set_argmax`; per-cost default, yield-aware "per_sample").

    Returns (best_set_index, post_var, scores).  Collapsing the separate
    conditioning / corrections / scoring calls into one jit matters on
    this environment: each device call through the TPU relay carries a
    ~27 ms dispatch floor and the episode host code read results between
    them, so a 10k planning step paid 3-4 round trips of pure overhead
    (benchmarks/README.md).

    idx_pad/count/pilot_nv: fixed-capacity padded sampled set and its
    per-observation noise (as `greedy_select`'s pilot machinery).
    costs: (num_sets,) path costs (entries with set_sizes == 0 ignored).
    W/WT: the per-refit implicit-precision seed (strategy="mi" only).
    """
    if strategy == "mi" and (W is None or WT is None):
        raise ValueError(
            "plan_path_step(strategy='mi') needs the implicit-precision "
            "seed — build (W, WT) with implicit_complement_precision"
        )
    d0 = gram_diag(spec, params, x)
    C, d, taken, _ = _batch_pilot_condition(
        spec, params, x, pilot_nv, idx_pad, count, d0
    )
    if strategy == "mi":
        F, ZT = implicit_corrections(W, WT, idx_pad, count)
        scores = score_candidate_sets(
            spec, params, x, nv, C, sets, set_sizes,
            P_implicit=(WT, F, ZT, taken), strategy="mi",
        )
    else:
        scores = score_candidate_sets(
            spec, params, x, nv, C, sets, set_sizes, strategy="entropy",
        )
    best = path_set_argmax(scores, set_sizes, costs,
                           path_utility=path_utility)
    return best, d, scores


@partial(
    jax.jit,
    static_argnames=("spec", "strategy", "min_noise", "nv_mult",
                     "path_utility"),
)
def plan_episode_step(
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
    W: Optional[jax.Array] = None,
    WT: Optional[jax.Array] = None,
    *,
    strategy: str = "entropy",
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    path_utility: str = "per_cost",
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """The episode's ENTIRE per-step device work as ONE program and ONE
    host-synchronizing read: the posterior METRICS for the current state
    (mean + variance over the whole grid) fused with the next-path choice
    (plan_path_step's conditioning → corrections → set scoring →
    `path_set_argmax` utility argmax).

    Why: on this environment every host-SYNCHRONIZING exchange through the
    TPU relay costs ~27 ms.  The unfused step paid one sync to read the
    plan argmax, a second to fetch the posterior field for metrics, and a
    third per refit to read the fitted noise for host-side conditioning
    buffers — this program returns (best, mean, var) in a single transfer
    and derives the noise model from `params` ON DEVICE, so a planning
    step costs exactly one sync.

    The posterior mean/variance are byproducts of the conditioning pass
    the plan needs anyway: with LA = chol(K_AA + Σ_A) and basis rows
    C = L_A⁻¹ K(X_A, X),

        σ²* = diag(K) − colsum(C²)      (the `d` the scorer conditions on)
        μ*  = Cᵀ (L_A⁻¹ y_A)            (one extra small trisolve + matvec)

    so no separate posterior factorization, growth, or predict program
    runs on a planning step at all — the O(n³)-per-step refactorization
    the reference performs (SURVEY.md §3.4) is replaced by ONE batched
    conditioning whose cost is the cap×N trisolve the plan already pays.

    Noise convention (C5): per-OBSERVATION conditioning noise is
    base · noise_scale_pad with base = max(exp(2·log_noise), min_noise²)
    — the fitted base variance scaled by each measurement's recorded
    modality; FUTURE measurements are scored at base · nv_mult (the
    episode's modality policy: cheap-sensor variance for "cheap"/"mixed").

    idx_pad / noise_scale_pad / y_pad: fixed-capacity padded sampled set,
    its per-observation noise SCALES, and its observations (invalid slots
    ≥ count are ignored exactly).

    Returns (best_set_index, mean, post_var, scores).
    """
    if strategy == "mi" and (W is None or WT is None):
        raise ValueError(
            "plan_episode_step(strategy='mi') needs the implicit-precision "
            "seed — build (W, WT) with implicit_precision_seed"
        )
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
    if strategy == "mi":
        F, ZT = implicit_corrections(W, WT, idx_pad, count)
        scores = score_candidate_sets(
            spec, params, x, nv, C, sets, set_sizes,
            P_implicit=(WT, F, ZT, taken), strategy="mi",
        )
    else:
        scores = score_candidate_sets(
            spec, params, x, nv, C, sets, set_sizes, strategy="entropy",
        )
    best = path_set_argmax(scores, set_sizes, costs,
                           path_utility=path_utility)
    return best, mean, jnp.maximum(d, 0.0), scores


@partial(jax.jit, static_argnames=("spec", "strategy", "min_noise",
                                   "nv_mult", "path_utility"))
def plan_episode_step_metrics(
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
    f_true: jax.Array,
    obs_mask: jax.Array,
    test_mask: jax.Array,
    W: Optional[jax.Array] = None,
    WT: Optional[jax.Array] = None,
    *,
    strategy: str = "entropy",
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
    path_utility: str = "per_cost",
) -> tuple[jax.Array, ...]:
    """`plan_episode_step` with the posterior METRICS reduced ON DEVICE
    against the (simulator-resident) ground truth: returns only scalars
    plus the chosen path's site variances, so the step's synchronizing
    read moves a few dozen bytes instead of two full N-vectors.

    Why: the relay tunnel moves ~8 MB of mean/var per step at N = 1M —
    measured ~190 ms of pure transfer inside the ~27 ms-floor sync.
    The full field is still available on demand (the episode fetches it
    once at the end via the posterior path).

    f_true/obs_mask/test_mask: truth and masks (f32 0/1), device-resident
    for the whole episode.  Returns
    (best, rmse, rmse_test, mean_var, var_sites) with var_sites the
    posterior variances at sets[best] (ordered as the set)."""
    best, mean, d, _ = plan_episode_step(
        spec, params, x, idx_pad, count, noise_scale_pad, y_pad,
        sets, set_sizes, costs, W, WT,
        strategy=strategy, min_noise=min_noise, nv_mult=nv_mult,
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


# ---------------------------------------------------------------------------
# Precision seeding / maintenance helpers for episode-level MI (config 5)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("spec",))
def complement_precision(
    spec: KernelSpec, params: KernelParams, x: jax.Array, nv: jax.Array
) -> jax.Array:
    """(K(X,X) + diag nv)⁻¹ over all candidates, blocked on-device inverse.

    Dense (N×N materialised) — the small-N REFERENCE implementation that
    the tests cross-check `implicit_complement_precision` against; the
    episode's production MI path never materialises P (at N=10k that is a
    400 MB buffer plus a ~95 ms 2N³ seeding matmul)."""
    K = gram_pallas_with_noise(spec, params, x, nv / params.noise_var)
    return la.spd_inverse_from_chol(jnp.linalg.cholesky(K))


@partial(jax.jit, static_argnames=("spec",))
def implicit_complement_precision(
    spec: KernelSpec, params: KernelParams, x: jax.Array, nv: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Seed the implicit prior precision P0 = (K+Σ)⁻¹ = WᵀW over ALL
    candidates: returns (W, WT) with W = L⁻¹ (blocked MXU tri_inv).

    WT = Wᵀ is materialised once so downstream per-set blocks
    (WᵀW)_SS = WT[S] · WT[S]ᵀ come from coalesced ROW gathers — a strided
    column gather from an HBM-resident 400 MB W costs ~27 ms on a v5e,
    the same bytes as rows ≈ 1 ms (benchmarks/README.md).
    Valid per (params, nv); re-seeded by the episode after every refit.
    """
    K = gram_pallas_with_noise(spec, params, x, nv / params.noise_var)
    W = la.tri_inv(jnp.linalg.cholesky(K))
    return W, W.T


@partial(jax.jit, static_argnames=("spec", "min_noise", "nv_mult"))
def implicit_precision_seed(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    *,
    min_noise: float = 1e-3,
    nv_mult: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """`implicit_complement_precision` with the candidate noise derived
    from the fitted params INSIDE the program — the episode's per-refit
    seed.  Reading the fitted noise on the host just to rebuild the
    constant nv vector costs a ~27 ms relay sync per refit; here
    nv = nv_mult · max(exp(2·log_noise), min_noise²) stays on device
    (nv_mult = the modality policy's future-measurement variance scale).
    """
    base = jnp.maximum(jnp.exp(2.0 * params.log_noise), min_noise * min_noise)
    nv = jnp.full((x.shape[0],), nv_mult, jnp.float32) * base
    K = gram_pallas_with_noise(spec, params, x, nv / params.noise_var)
    W = la.tri_inv(jnp.linalg.cholesky(K))
    return W, W.T


@jax.jit
def implicit_corrections(
    W: jax.Array,
    WT: jax.Array,
    idx: jax.Array,
    count: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Schur correction factors for deleting the sampled set A from the
    implicit precision:  P_V∖A = WᵀW − F · ZTᵀ  (restricted off A).

        U  = P0[:, A] = Wᵀ(W E_A)          (N, C)
        PA = U[A, :]                        (C, C)
        Z  = PA⁻¹ Uᵀ                        (C, N)   → returned as ZT = Zᵀ

    Block-Schur elimination of a set equals sequential elimination of its
    elements exactly, so rebuilding F/ZT from W in ONE batched op per
    replan (instead of chaining per-sample rank-1 deletes) makes the
    episode's precision-drift story structural: errors cannot accumulate
    across hundreds of deletes, and no periodic refresh is needed.

    idx is padded to a FIXED capacity C with any value; only the first
    `count` slots are real.  Duplicate indices (a node measured twice)
    are exact no-ops, as in the sequential scheme.  O(N²·C) MXU matmuls —
    ~1 ms at N=10k, C=256.
    """
    m = idx.shape[0]
    valid = jnp.arange(m) < count
    same = (idx[:, None] == idx[None, :]) & valid[:, None] & valid[None, :]
    dup = jnp.tril(same, k=-1).any(axis=1)
    valid = valid & ~dup
    idx_safe = jnp.where(valid, idx, 0)
    WE = WT[idx_safe].T * valid[None, :].astype(jnp.float32)  # (N, C) = W[:, A]
    U = jnp.dot(W.T, WE, precision=_HIGH)  # (N, C) = (WᵀW)[:, A]
    U = U * valid[None, :].astype(jnp.float32)
    PA = U[idx_safe, :] * valid[:, None].astype(jnp.float32)
    pair = valid[:, None] & valid[None, :]
    PA = jnp.where(pair, PA, jnp.eye(m, dtype=jnp.float32))
    LA = jnp.linalg.cholesky(PA)
    Z = la.cho_solve(LA, U.T)  # (C, N)
    Z = Z * valid[:, None].astype(jnp.float32)
    return U, Z.T
