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
    Var(z_y | z_rest) = 1/[(K_VV+Σ)⁻¹]_yy.  The complement precision P is
    seeded once by a blocked on-device inversion (ops.linalg.tri_inv — MXU
    matmuls) and thereafter maintained by O(N²) Schur rank-1 *downdates*
    (ops.linalg.precision_delete), one fused VPU pass per round.
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

from algp_tpu.ops import linalg as la
from algp_tpu.ops.gram import gram_pallas_with_noise
from algp_tpu.ops.kernels import KernelParams, KernelSpec, gram, gram_diag

_HIGH = lax.Precision.HIGHEST


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


def _posterior_col(spec, params, x, j, B, d, t):
    """Posterior covariance column for candidate j given the first t basis
    rows, and its normaliser.  O(N·d + N·T) with fixed reduction order."""
    xj = lax.dynamic_slice_in_dim(x, j, 1, axis=0)
    prior_col = gram(spec, params, x, xj)[:, 0]
    Bj = lax.dynamic_slice_in_dim(B, j, 1, axis=1)[:, 0]  # B[:, j]
    proj = jnp.dot(B.T, Bj, precision=_HIGH)  # rows ≥ t are zero
    return prior_col - proj


def _condition(B, d, col, j, nv_j, t):
    """Rank-1 conditioning on a noisy observation at candidate j."""
    denom = jnp.sqrt(d[j] + nv_j)
    c = col / denom
    B = lax.dynamic_update_slice(B, c[None, :], (t, 0))
    d = d - c * c
    return B, d


def _mi_den(P):
    """Krause denominator per candidate: Var(z_y | z_complement∖y) = 1/P_yy."""
    return 1.0 / jnp.diagonal(P)


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
) -> SelectionResult:
    """Greedy active sampling over N candidates, one jitted device loop.

    x         : (N, dim) all candidate locations (+features)
    nv        : (N,) effective observation-noise variance per candidate —
                for pilot entries this must already reflect the *observed*
                modality (heteroscedastic conditioning)
    pilot_idx : (num_pilot,) indices already sampled (conditioned first,
                never re-selected); pass shape-(0,) for none
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
    return _greedy_select_jit(
        spec, params, x, nv, pilot_idx, pilot_count,
        rounds=rounds, num_pilot=num_pilot, strategy=strategy,
        return_scores=return_scores,
    )


@partial(
    jax.jit,
    static_argnames=("spec", "rounds", "num_pilot", "strategy", "return_scores"),
)
def _greedy_select_jit(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    pilot_idx: jax.Array,
    pilot_count: jax.Array,
    *,
    rounds: int,
    num_pilot: int,
    strategy: str,
    return_scores: bool,
) -> SelectionResult:
    N = x.shape[0]
    T = num_pilot + rounds
    d0 = gram_diag(spec, params, x)
    B0 = jnp.zeros((T, N), jnp.float32)
    taken0 = jnp.zeros((N,), bool)
    sel0 = jnp.zeros((rounds,), jnp.int32)

    if strategy == "mi":
        # complement precision over ALL candidates (noisy joint), seeded by
        # one blocked inversion; pilots are deleted inside the loop
        K = gram_pallas_with_noise(spec, params, x, nv / params.noise_var)
        P0 = la.spd_inverse_from_chol(jnp.linalg.cholesky(K))
    else:
        P0 = jnp.zeros((0, 0), jnp.float32)

    n_scores = rounds if return_scores else 0
    scores0 = jnp.full((n_scores, N), -jnp.inf, jnp.float32)

    def body(t, state):
        B, d, P, taken, sel, scores = state
        is_pilot = t < num_pilot
        # padded pilot slots (pilot_count ≤ t < num_pilot) are exact no-ops
        active = jnp.logical_or(jnp.logical_not(is_pilot), t < pilot_count)

        def pick_greedy():
            num = d + nv
            if strategy == "entropy":
                s = num
            else:
                s = num / _mi_den(P)
            s = jnp.where(taken, -jnp.inf, s)
            r = t - num_pilot
            return s, r

        def apply(args):
            B, d, P, taken, sel, scores = args
            if num_pilot:
                j = lax.cond(
                    is_pilot,
                    lambda: pilot_idx[jnp.clip(t, 0, num_pilot - 1)],
                    lambda: pick_greedy()[0].argmax().astype(jnp.int32),
                )
            else:
                j = pick_greedy()[0].argmax().astype(jnp.int32)

            if return_scores:
                s, r = pick_greedy()
                scores = lax.cond(
                    is_pilot,
                    lambda sc: sc,
                    lambda sc: lax.dynamic_update_slice(sc, s[None, :], (r, 0)),
                    scores,
                )

            col = _posterior_col(spec, params, x, j, B, d, t)
            B, d = _condition(B, d, col, j, nv[j], t)
            if strategy == "mi":
                P = la.precision_delete(P, j)
            taken = taken.at[j].set(True)
            if rounds:  # rounds=0 → conditioning-only pass, no sel buffer
                r = jnp.clip(t - num_pilot, 0, rounds - 1)
                sel = lax.cond(
                    is_pilot,
                    lambda s: s,
                    lambda s: lax.dynamic_update_slice(
                        s, j[None].astype(jnp.int32), (r,)
                    ),
                    sel,
                )
            return B, d, P, taken, sel, scores

        return lax.cond(active, apply, lambda a: a,
                        (B, d, P, taken, sel, scores))

    state = (B0, d0, P0, taken0, sel0, scores0)
    B, d, P, taken, sel, scores = lax.fori_loop(0, T, body, state)
    return SelectionResult(selected=sel, post_var=d, scores=scores, basis=B)


# ---------------------------------------------------------------------------
# Path-constrained set scoring (config 5)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("spec", "strategy"))
def score_candidate_sets(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    nv: jax.Array,
    basis: jax.Array,
    post_var: jax.Array,
    sets: jax.Array,
    set_sizes: jax.Array,
    P: Optional[jax.Array] = None,
    *,
    strategy: str = "entropy",
) -> jax.Array:
    """Joint utility of padded candidate *sets* (path sample sets), batched.

    sets      : (num_sets, k_max) candidate indices, padded with 0
    set_sizes : (num_sets,) true sizes; padded slots are masked to identity
    basis / post_var: conditioning state from a previous `greedy_select`
                (or zeros for the prior)
    P         : complement precision (required for strategy="mi")

    entropy:  H(z_S | A) = ½ log det(Cov_S|A + Σ_S)   (+ const, dropped)
    mi:       H(z_S | A) − H(z_S | z_V∖A∖S)
              = ½[ log det(Cov_S|A + Σ_S) + log det(P_SS) ]
    Padded slots contribute identity rows ⇒ zero log-det contribution.
    One small k_max×k_max Cholesky per set, vmapped over the path batch.
    """
    k_max = sets.shape[1]

    def one(idx, size):
        mask = jnp.arange(k_max) < size
        xs = x[idx]  # (k, dim)
        Kp = gram(spec, params, xs, xs)  # prior block
        Bs = basis[:, idx]  # (T, k)
        Kpost = Kp - jnp.dot(Bs.T, Bs, precision=_HIGH)
        M1 = Kpost + jnp.diag(nv[idx])
        M1 = jnp.where(mask[:, None] & mask[None, :], M1, 0.0)
        M1 = M1 + jnp.diag(jnp.where(mask, 1e-6, 1.0))
        L1 = jnp.linalg.cholesky(M1)
        h = jnp.sum(jnp.log(jnp.diagonal(L1)))
        if strategy == "entropy":
            return h
        Pss = P[idx[:, None], idx[None, :]]
        Pss = jnp.where(mask[:, None] & mask[None, :], Pss, 0.0)
        Pss = Pss + jnp.diag(jnp.where(mask, 0.0, 1.0))
        L2 = jnp.linalg.cholesky(Pss)
        return h + jnp.sum(jnp.log(jnp.diagonal(L2)))

    return jax.vmap(one)(sets, set_sizes)


# ---------------------------------------------------------------------------
# Precision seeding / maintenance helpers for episode-level MI (config 5)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("spec",))
def complement_precision(
    spec: KernelSpec, params: KernelParams, x: jax.Array, nv: jax.Array
) -> jax.Array:
    """(K(X,X) + diag nv)⁻¹ over all candidates, blocked on-device inverse."""
    K = gram_pallas_with_noise(spec, params, x, nv / params.noise_var)
    return la.spd_inverse_from_chol(jnp.linalg.cholesky(K))


@jax.jit
def delete_from_precision(P: jax.Array, idx: jax.Array) -> jax.Array:
    """Remove a batch of points from the complement precision, in order.

    Entries of `idx` that are negative are skipped exactly — callers pad
    to a FIXED length with -1 so this compiles once per (N, pad) shape
    instead of once per batch size (the episode loop's step cadence).
    """

    def body(P, j):
        return lax.cond(j >= 0, lambda p: la.precision_delete(p, j),
                        lambda p: p, P), None

    P, _ = lax.scan(body, P, idx)
    return P
