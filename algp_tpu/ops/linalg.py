"""L0 dense linear algebra for the GP stack, designed TPU-first.

Capability parity target: the reference (`sumitsk/algp`, SURVEY.md §2 C9)
leans on LAPACK via ``torch.cholesky`` / ``cholesky_solve`` / log-det and
refactorizes the Gram matrix from scratch every acquisition round.  The
TPU-native mandate (BASELINE.json:5) replaces that with:

  * on-device Cholesky (XLA's blocked `lax.linalg.cholesky`, f32, with
    adaptive diagonal jitter for f32 stability at N≈10k),
  * *blocked* triangular solves — a full 10k×10k RHS trisolve OOMs HBM on a
    v5e (SURVEY.md §7.6), so RHS is processed in column panels,
  * a recursive-bisection blocked triangular **inverse** whose work is almost
    entirely MXU matmuls (XLA's triangular_solve is row-sequential and slow
    for large RHS; the bisection form runs at matmul speed),
  * an O(n²) incremental **row-append** factor update (`chol_append_row`,
    identity-padded) so the episode posterior between refits never
    refactorizes.  (Rank-1 up/downdates of the *selection* state live on
    the basis/precision side: acquisition.py's basis-row conditioning IS
    the Cholesky-factor row update, and the Krause-MI complement is
    maintained by batched Schur corrections against the seed inverse —
    see acquisition.implicit_corrections.)

All functions are pure, jit-safe (static shapes only), and f32 by default.
Padded variants take an explicit active-size scalar `m` so they can live
inside `lax.fori_loop` acquisition loops with preallocated buffers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Cholesky with adaptive jitter
# ---------------------------------------------------------------------------


def cholesky(K: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor of SPD ``K`` (+ optional fixed jitter·I)."""
    n = K.shape[-1]
    if jitter:
        K = K + jitter * jnp.eye(n, dtype=K.dtype)
    return jnp.linalg.cholesky(K)


def safe_cholesky(
    K: jax.Array,
    initial_jitter: float = 1e-6,
    max_tries: int = 5,
    growth: float = 10.0,
) -> tuple[jax.Array, jax.Array]:
    """Cholesky with adaptive diagonal jitter, jit-safe.

    f32 Gram matrices at N≈10k routinely need a jitter of ~1e-6·mean(diag)
    to factor (SURVEY.md §7.5 hard part 1).  Escalates jitter ×`growth` up
    to `max_tries` times until the factor is finite.

    Returns ``(L, jitter_used)``; ``jitter_used`` is the absolute jitter
    added to the diagonal (0 if the first try at `initial_jitter` scale
    succeeded with zero initial jitter).
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    scale = jnp.mean(jnp.diagonal(K))

    def try_factor(jit_abs):
        L = jnp.linalg.cholesky(K + jit_abs * eye)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    def cond(state):
        i, _, ok, _ = state
        return jnp.logical_and(~ok, i < max_tries)

    def body(state):
        i, jit_abs, _, _ = state
        jit_next = jnp.where(i == 0, scale * initial_jitter, jit_abs * growth)
        L, ok = try_factor(jit_next)
        return i + 1, jit_next, ok, L

    L0, ok0 = try_factor(jnp.zeros((), K.dtype))
    init = (jnp.zeros((), jnp.int32), jnp.zeros((), K.dtype), ok0, L0)
    _, jit_used, _, L = lax.while_loop(cond, body, init)
    return L, jit_used


# ---------------------------------------------------------------------------
# Triangular solves (blocked for large RHS) and SPD solves
# ---------------------------------------------------------------------------


def solve_triangular(
    L: jax.Array, b: jax.Array, *, lower: bool = True, trans: bool = False
) -> jax.Array:
    """Solve ``op(L) x = b`` where op is identity or transpose."""
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    x = lax.linalg.triangular_solve(
        L, b, left_side=True, lower=lower, transpose_a=trans
    )
    return x[:, 0] if vec else x


def blocked_solve_triangular(
    L: jax.Array,
    B: jax.Array,
    *,
    lower: bool = True,
    trans: bool = False,
    block: int = 512,
) -> jax.Array:
    """Triangular solve with the RHS processed in column panels.

    XLA stages ~O(n·m) of dynamic-update-slice temporaries for an n×m
    trisolve; at n=m=10k that OOMs a v5e's 16 GB HBM (SURVEY.md §7.6).
    Solving ≤`block`-column panels keeps the footprint bounded while each
    panel still saturates the device.

    Panel-sized factors (n ≤ 512) are never blocked: each RHS column's
    arithmetic is independent of the panelling, so results are identical,
    but chopping a small-factor solve into thousands of sequential
    panels is pure dispatch-chain overhead — measured 218 ms vs 25 ms
    for a (352, 1M) cho_solve on a v5e (the 1M-episode corrections).
    """
    if B.ndim == 1 or B.shape[1] <= block or L.shape[0] <= 512:
        return solve_triangular(L, B, lower=lower, trans=trans)
    n, m = B.shape
    pad = (-m) % block
    if pad:
        B = jnp.pad(B, ((0, 0), (0, pad)))
    panels = B.reshape(n, -1, block).transpose(1, 0, 2)  # (k, n, block)
    solve = partial(solve_triangular, L, lower=lower, trans=trans)
    out = lax.map(solve, panels)  # sequential over panels, bounded temps
    out = out.transpose(1, 0, 2).reshape(n, -1)
    return out[:, :m] if pad else out


def cho_solve(L: jax.Array, b: jax.Array, *, block: int = 512) -> jax.Array:
    """Solve ``K x = b`` given lower Cholesky factor ``L`` of K."""
    y = blocked_solve_triangular(L, b, lower=True, trans=False, block=block)
    return blocked_solve_triangular(L, y, lower=True, trans=True, block=block)


def solve_triangular_matmul(L: jax.Array, B: jax.Array) -> jax.Array:
    """``L⁻¹ B`` for a SMALL lower factor with a HUGE RHS, as one MXU
    matmul against the explicit bisection inverse.

    XLA's (n, m) trisolve is a chain of ~n row-substitution steps over
    the full m-column panel; for the episode's conditioning pass — a
    cap-sized factor against the whole candidate axis — that chain is
    the cost, not the flops.  Measured on a v5e (2026-08-18, forced
    sync, this module's probe): (224, 4.19M) trisolve ≈ 27.6 ms of
    device time vs ≈ 2 ms for ``tri_inv(L) @ B``; (640, 1M) saves
    ~10 ms.  The explicit triangular inverse is the same numerical tool
    the exact MI seed already rests on (`tri_inv` builds W = L⁻¹ at
    N = 10k); against the trisolve the conditioning checksum agreed to
    ≤ 3e-7 relative at every probed shape.
    """
    return jnp.dot(tri_inv(L), B, precision=lax.Precision.HIGHEST)


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """log|K| from its lower Cholesky factor."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


# ---------------------------------------------------------------------------
# Blocked triangular inverse + SPD inverse (MXU-friendly)
# ---------------------------------------------------------------------------


def _batched_leaf_inv(D: jax.Array) -> jax.Array:
    """Inverse of a batch of lower-triangular (b, p, p) blocks by a
    log-depth Neumann-doubling product — EXACT, not iterative.

    Write T = Dg(I + M) with Dg = diag(T) and M = Dg⁻¹·strict_lower(T).
    M is nilpotent (Mᵖ = 0), so the inverse geometric series terminates:

        (I + M)⁻¹ = Σ_{i<p} (−M)ⁱ,   built by doubling
        S_{2m} = (I + (−M)^m) S_m  —  ⌈log₂ p⌉ squarings + combines.

    Replaces p sequential row-substitution steps per block (the XLA
    trisolve) with ~2·log₂ p BATCHED MXU matmuls across all blocks at
    once — at N=10k/leaf=256 that is 16 matmuls instead of 10 240
    dependency-chained row ops, the serial tail of the MI-seed inversion.

    Conditioning: on ill-conditioned factors (kernel Gram at long
    lengthscale + small jitter, cond ~1e6) the unit-triangular part M has
    large entries and the doubling sum cancels to ~4e-4 relative error —
    one Newton step W ← W + W(I − T·W) squares the residual back to the
    substitution path's ~1e-6 (asserted vs SciPy on exactly that case in
    tests/test_linalg.py).
    """
    b, p, _ = D.shape
    _H = lax.Precision.HIGHEST
    d = jnp.diagonal(D, axis1=1, axis2=2)  # (b, p)
    eye = jnp.eye(p, dtype=D.dtype)
    Mneg = -(jnp.tril(D, k=-1) / d[:, :, None])  # −Dg⁻¹·strict_lower
    S = eye[None] + Mneg
    P = jnp.einsum("bij,bjk->bik", Mneg, Mneg, precision=_H)
    steps = max(0, (p - 1).bit_length() - 1)  # S already covers 2 terms
    for _ in range(steps):
        S = S + jnp.einsum("bij,bjk->bik", P, S, precision=_H)
        P = jnp.einsum("bij,bjk->bik", P, P, precision=_H)
    W = S / d[:, None, :]  # (I+M)⁻¹ Dg⁻¹ (column scaling)
    # Newton residual against the CLEAN lower triangle: a caller's block
    # buffer may hold junk above the diagonal (blocked factorizations do)
    Dt = jnp.tril(D)
    R = eye[None] - jnp.einsum("bij,bjk->bik", Dt, W, precision=_H)
    W = W + jnp.einsum("bij,bjk->bik", W, R, precision=_H)
    return jnp.tril(W)


def tri_inv(L: jax.Array, *, leaf: int = 256) -> jax.Array:
    """Inverse of a lower-triangular matrix: recursive bisection over
    MXU matmuls + ONE batched log-depth leaf inversion.

    For L = [[A, 0], [B, C]]:  L⁻¹ = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]].
    The recursion (unrolled at trace time, splits at `leaf` multiples)
    turns all off-diagonal work into dense MXU matmuls; every diagonal
    `leaf` block is inverted UP FRONT in one `_batched_leaf_inv` call, so
    the only dependency chain left is ~2·log₂(leaf) batched matmuls —
    the per-leaf sequential XLA trisolves this replaces were the serial
    tail of the whole inversion (40 chained 256-row substitutions at
    N=10k).  Ragged N is identity-padded to a leaf multiple (exact).

    Measured alternative (2026-08-16, v5e, N=10240): a bottom-up batched
    formulation (per-level batched −W_c B W_a einsums) is ~2× SLOWER than
    this recursion — the block-diagonal gather/scatter reshuffles over
    the 400 MB buffer at every level cost more than the recursion's
    concatenations.  Keep the recursion; batch only the leaves.
    """
    n = L.shape[-1]
    if n <= leaf:
        return _batched_leaf_inv(L[None])[0]
    n_pad = (n + leaf - 1) // leaf * leaf
    if n_pad != n:
        Lp = jnp.eye(n_pad, dtype=L.dtype)
        Lp = lax.dynamic_update_slice(Lp, L, (0, 0))
        # [[L,0],[0,I]]⁻¹ = [[L⁻¹,0],[0,I]] — padding is exact
        return tri_inv(Lp, leaf=leaf)[:n, :n]
    nb = n // leaf
    leaves = _batched_leaf_inv(
        jnp.stack([L[i * leaf:(i + 1) * leaf, i * leaf:(i + 1) * leaf]
                   for i in range(nb)])
    )

    def rec(off_b: int, nb_: int):
        if nb_ == 1:
            return leaves[off_b]
        mb = nb_ // 2
        m = mb * leaf
        o = off_b * leaf
        sz = nb_ * leaf
        B = lax.dynamic_slice(L, (o + m, o), (sz - m, m))
        Wa = rec(off_b, mb)
        Wc = rec(off_b + mb, nb_ - mb)
        # HIGHEST precision: the TPU default lowers f32 matmuls to bf16
        # MXU passes, which destroys the selection-fidelity contract.
        Wb = -jnp.dot(
            Wc, jnp.dot(B, Wa, precision=lax.Precision.HIGHEST),
            precision=lax.Precision.HIGHEST,
        )
        top = jnp.concatenate([Wa, jnp.zeros((m, sz - m), L.dtype)], axis=1)
        bot = jnp.concatenate([Wb, Wc], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    return rec(0, nb)


def spd_inverse_from_chol(L: jax.Array, *, leaf: int = 256) -> jax.Array:
    """K⁻¹ = L⁻ᵀ L⁻¹ from the lower Cholesky factor, via blocked tri_inv.

    One big MXU matmul dominates; used to seed the Krause-MI complement
    precision matrix (acquisition.py) which is then maintained by O(N²)
    rank-1 downdates instead of re-inversion.
    """
    W = tri_inv(L, leaf=leaf)
    return jnp.dot(W.T, W, precision=lax.Precision.HIGHEST)


def spd_inverse(K: jax.Array, *, leaf: int = 256) -> jax.Array:
    """Dense SPD inverse via Cholesky + blocked triangular inverse."""
    return spd_inverse_from_chol(cholesky(K), leaf=leaf)


# ---------------------------------------------------------------------------
# Incremental factor growth (append a row) — padded, loop-safe
# ---------------------------------------------------------------------------


def chol_append_row(
    L_pad: jax.Array, m: jax.Array, k_vec: jax.Array, k_ss: jax.Array
) -> jax.Array:
    """Grow a padded Cholesky factor by one point, in place, O(n_max²).

    Given ``L_pad`` whose leading m×m block factors K_AA, the cross-
    covariances ``k_vec`` (entries ≥ m must be 0) and self-covariance
    ``k_ss`` of a new point s, writes row m:

        c = L⁻¹ k_vec (leading block),   d = sqrt(k_ss − cᵀc)

    Padding convention: rows/cols ≥ m of ``L_pad`` are identity, which
    makes the full-size trisolve act like the leading-block solve.
    Jit/fori_loop-safe: all shapes static, `m` is a traced scalar.
    """
    n_max = L_pad.shape[-1]
    c = solve_triangular(L_pad, k_vec, lower=True)
    idx = jnp.arange(n_max)
    c = jnp.where(idx < m, c, 0.0)
    d = jnp.sqrt(jnp.maximum(k_ss - jnp.dot(c, c), 1e-12))
    new_row = jnp.where(idx == m, d, c)
    # replace identity padding row m with the new factor row
    L_pad = lax.dynamic_update_slice(L_pad, new_row[None, :], (m, 0))
    return L_pad


def identity_padded_factor(n_max: int, dtype=jnp.float32) -> jax.Array:
    """Fresh padded factor: identity, ready for `chol_append_row` growth."""
    return jnp.eye(n_max, dtype=dtype)


def pad_factor(L: jax.Array, n_max: int) -> jax.Array:
    """Embed an m×m factor into the identity-padded n_max×n_max layout."""
    m = L.shape[-1]
    out = jnp.eye(n_max, dtype=L.dtype)
    return lax.dynamic_update_slice(out, L.astype(out.dtype), (0, 0))


