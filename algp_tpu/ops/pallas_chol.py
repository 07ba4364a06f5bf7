"""Pallas blocked Cholesky — the full factorization in ONE kernel.

STATUS after TWO rounds of optimization (2026-08-16, v5e, N=10240, honest
sum-forced timings; every number below measured this way):

  round-1 kernel (row-sweep tri-inv, serial chain)            54.6 ms
  + log-depth doubling micro tri-inv (no row-sweep chain)     52.3 ms
  + symmetric-trailing column extraction (no per-col
    transpose relayout on the chain)                          52.5 ms (≈)
  lookahead kernel (chain chunks interleaved into the
    trailing emit_pipeline body via persistent scratch)       52.9 ms
  same, interleaving disabled (chain after stream)            54.8 ms
  MXU dot_general outer product instead of VPU broadcast      58.8 ms (worse)
  manual double-buffered trailing stream (vs emit_pipeline)   +3 ms (worse)
  XLA `lax.linalg.cholesky`                                   46.5–48 ms

CONCLUSION (definitive for this hardware/compiler generation): the
factorization is bound by the per-column dependency chain — two masked
cross-lane REDUCTIONS per column whose multi-step shuffle latency
(~2.5 µs × 10 240 columns ≈ 26 ms) cannot be pipelined away.  Lookahead
interleaving of the chain with the trailing DMA/MXU stream — the round-1
hypothesis — WORKS but only recovers ~1.4 ms: Mosaic's in-order issue
gives no genuine async compute overlap, so the chain executes inside the
stream rather than alongside it.  The chain is inherent to ANY exact
factorization (each pivot needs the previous column's update), XLA pays
the same chain, and its remaining ~5 ms edge is scheduling quality.
`ops.linalg.cholesky` (XLA) therefore stays the default in the hot
paths; this module is the native-algorithm reference and the measured
map of the design space for whoever revisits it with a future compiler.

XLA's `lax.linalg.cholesky` at N≈10k runs at ~7 TFLOP effective on a v5e
(~48 ms).  This kernel keeps the matrix in HBM and drives the classic
right-looking blocked algorithm entirely on-chip (SURVEY.md §7.3 step 1
"Pallas blocked Cholesky"):

  grid = (nb,) — TPU grid steps execute sequentially, so each grid step
  is one panel iteration k working on the trailing submatrix the previous
  steps already updated in place (input_output_aliases on the HBM buffer):

    1. DMA the diagonal block A_kk into VMEM; factor it with an in-VMEM
       column-sweep micro-Cholesky (256 VPU steps, ~50 µs),
    2. build W = L_kk⁻¹ by an in-VMEM forward substitution (needed so the
       panel solves below are MXU matmuls, not substitutions),
    3. for each row tile i > k: DMA A_ik, compute L_ik = A_ik Wᵀ on the
       MXU, DMA it back,
    4. trailing update: for each lower tile (i, j > k):
       A_ij -= L_ik L_jkᵀ, double-buffered DMA in/out, MXU matmuls.

  Only lower-triangle tiles are ever touched: total HBM traffic is
  Θ(nb³/6) tiles — the syrk floor — instead of whole-matrix sweeps.

Constraints: N must be a multiple of the panel (callers keep the
acquisition path 256-aligned); the strict upper triangle of the output is
left untouched (callers use `jnp.tril` semantics, matching
`jnp.linalg.cholesky`'s garbage-free-lower contract via an explicit tril).

Falls back to `jnp.linalg.cholesky` off-TPU and for ragged sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PANEL = 256


def _chol_col_step(panel: int):
    """One column step of the right-looking in-VMEM sweep, as a reusable
    (c, A) -> A body (the lookahead kernel runs these in chunks
    interleaved with the trailing-update stream)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 1)
    rid = jax.lax.broadcasted_iota(jnp.int32, (panel, 1), 0)

    def step(c, A):
        # Mosaic cannot lower value-space dynamic_slice — extract the
        # pivot column with full-tile masked reductions instead.  The
        # TRAILING block of A stays symmetric throughout the sweep, so
        # the column's row-layout twin comes from a second masked reduce
        # over row c — no (p,1)→(1,p) reshape, whose relayout (a VPU
        # transpose) would sit on the serial dependency chain.  (An MXU
        # dot_general outer product is also worse: measured +6.5 ms
        # total at N=10240 — matmul issue latency on the chain.)
        lo = rows >= c
        l_col = jnp.sum(
            jnp.where((cols == c) & lo, A, 0.0), axis=1, keepdims=True
        )
        l_row = jnp.sum(
            jnp.where((rows == c) & (cols >= c), A, 0.0),
            axis=0, keepdims=True,
        )
        pivot = jnp.sum(jnp.where(rid == c, l_col, 0.0))
        inv_d = jax.lax.rsqrt(pivot)
        lc = l_col * inv_d  # L[:, c] at rows ≥ c (zero above)
        lr = l_row * inv_d  # its transpose, by symmetry
        # trailing update A[i, j] -= l_i l_j for i, j > c — pure 2-D
        # VPU broadcast, no relayout
        upd = lc * lr
        mask = jnp.logical_and(rows > c, cols > c)
        A = A - jnp.where(mask, upd, 0.0)
        # write column c: L values at rows ≥ c
        A = jnp.where(cols == c, jnp.where(lo, lc, A), A)
        return A

    return step


def _micro_cholesky(A, panel: int):
    """In-VMEM column-sweep Cholesky of a (panel, panel) block.

    Right-looking: per column c — scale by rsqrt of the pivot, rank-1
    update of the trailing block.  All ops are full-tile VPU passes with
    row/col masks; ~panel × few-µs total.
    """
    return jax.lax.fori_loop(0, panel, _chol_col_step(panel), A)


def _micro_tri_inv(L, panel: int):
    """In-VMEM W = L⁻¹ for a (panel, panel) lower block, log-depth.

    Neumann doubling on the unit-triangular part (the same exact identity
    as ops.linalg._batched_leaf_inv): M = Dg⁻¹·strict_lower(L) is
    nilpotent, so (I+M)⁻¹ = Σ(−M)ⁱ terminates and builds in ⌈log₂ p⌉
    squarings — ~2·log₂ p chained MXU matmuls instead of p chained row
    substitutions (the row sweep was a major share of the kernel's serial
    tail).  One Newton step guards f32 accuracy on ill-conditioned
    factors (large |M| cancellation; see ops/linalg.py).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 1)
    eye = (rows == cols).astype(jnp.float32)
    # diag as BOTH layouts via two reductions (a (p,1)→(1,p) reshape is a
    # relayout Mosaic may refuse)
    d_col = jnp.sum(jnp.where(rows == cols, L, 0.0), axis=1, keepdims=True)
    d_row = jnp.sum(jnp.where(rows == cols, L, 0.0), axis=0, keepdims=True)
    Mneg = -jnp.where(rows > cols, L, 0.0) / d_col  # −Dg⁻¹·strict_lower
    S = eye + Mneg

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    P = mm(Mneg, Mneg)
    for _ in range(max(0, (panel - 1).bit_length() - 1)):
        S = S + mm(P, S)
        P = mm(P, P)
    W = S / d_row  # column scaling by 1/diag
    # Newton refinement — against the CLEAN lower triangle (callers may
    # pass blocks whose strict upper part still holds unfactored junk)
    Lt = jnp.where(rows >= cols, L, 0.0)
    R = eye - mm(Lt, W)
    W = W + mm(W, R)
    return jnp.where(rows >= cols, W, 0.0)


def _tri_decode(t):
    """Flat index → (ir, jr) over the lower-triangular pairs jr ≤ ir,
    enumerated row-major: t = ir(ir+1)/2 + jr.  Exact for t < 2²³."""
    t = jnp.asarray(t, jnp.int32)
    ir = jnp.floor((jnp.sqrt(8.0 * t.astype(jnp.float32) + 1.0) - 1.0) / 2.0)
    ir = ir.astype(jnp.int32)
    # fix float-sqrt boundary error in either direction
    ir = jnp.where(ir * (ir + 1) // 2 > t, ir - 1, ir)
    ir = jnp.where((ir + 1) * (ir + 2) // 2 <= t, ir + 1, ir)
    jr = t - ir * (ir + 1) // 2
    return ir, jr


def _embed(block, panel: int, r0: int, c0: int):
    """Place a small block into a zero (panel, panel) tile at a static
    offset (lax.pad lowers in Mosaic; dynamic_update_slice does not)."""
    s0, s1 = block.shape
    return jax.lax.pad(
        block, jnp.float32(0.0),
        ((r0, panel - r0 - s0, 0), (c0, panel - c0 - s1, 0)),
    )


def _micro_cholesky_blocked(A, panel: int, sub: int = 128):
    """Hierarchical in-VMEM Cholesky of a (panel, panel) tile.

    The column-sweep micro-Cholesky's cost is panel sequential steps of
    full-tile VPU ops — at panel=256 that is ~8× more VPU work per column
    than necessary and dominates the whole kernel (measured: ~39 ms of a
    57 ms factorization at N=10k).  Blocking the panel into `sub`-wide
    sub-panels runs the unavoidable sequential column sweeps on (sub, sub)
    tiles and does everything between them (sub-panel solves, trailing
    updates) as MXU matmuls.  Static Python loop ⇒ static shapes, no
    dynamic slicing (Mosaic-lowerable).
    """
    for b0 in range(0, panel, sub):
        D = A[b0 : b0 + sub, b0 : b0 + sub]
        Ld = _micro_cholesky(D, sub)
        rem = panel - b0 - sub
        if rem > 0:
            Wd = _micro_tri_inv(Ld, sub)
            A21 = A[b0 + sub :, b0 : b0 + sub]
            L21 = jax.lax.dot_general(
                A21, Wd,
                dimension_numbers=(((1,), (1,)), ((), ())),  # A21 Wdᵀ
                preferred_element_type=jnp.float32,
            )
            A22 = A[b0 + sub :, b0 + sub :]
            A22 = A22 - jax.lax.dot_general(
                L21, L21,
                dimension_numbers=(((1,), (1,)), ((), ())),  # L21 L21ᵀ
                preferred_element_type=jnp.float32,
            )
            # reassemble: keep factored columns ≤ b0+sub, new trailing block
            A = (
                _embed(Ld, panel, b0, b0)
                + _embed(L21, panel, b0 + sub, b0)
                + _embed(A22, panel, b0 + sub, b0 + sub)
                + _keep_before(A, panel, b0)
            )
        else:
            A = _embed(Ld, panel, b0, b0) + _keep_before(A, panel, b0)
    return A


def _keep_before(A, panel: int, b0: int):
    """Zero everything except the already-factored columns < b0 (lower)."""
    if b0 == 0:
        return jnp.zeros_like(A)
    cols = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 0)
    return jnp.where((cols < b0) & (rows >= cols), A, 0.0)


def _chol_kernel(panel: int, nb: int, sub: int, in_ref, hbm_ref,
                 diag_buf, winv_buf, sems):
    k = pl.program_id(0)
    p = panel

    copy_diag_in = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(k * p, p), pl.ds(k * p, p)], diag_buf, sems.at[0]
    )
    copy_diag_in.start()
    copy_diag_in.wait()
    Lkk = _micro_cholesky_blocked(diag_buf[...], p, sub)
    diag_buf[...] = Lkk
    copy_diag_out = pltpu.make_async_copy(
        diag_buf, hbm_ref.at[pl.ds(k * p, p), pl.ds(k * p, p)], sems.at[0]
    )
    copy_diag_out.start()
    winv_buf[...] = _micro_tri_inv(Lkk, p)  # log-depth doubling inverse
    copy_diag_out.wait()

    nrem = nb - k - 1

    # ---- panel solves: L_ik = A_ik Wᵀ — software-pipelined RMW sweep
    def panel_body(a_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            a_ref[...], winv_buf[...],
            dimension_numbers=(((1,), (1,)), ((), ())),  # A_ik @ Wᵀ
            preferred_element_type=jnp.float32,
        )

    @pl.when(nrem > 0)
    def _():
        pltpu.emit_pipeline(
            panel_body,
            grid=(nrem,),
            in_specs=[pl.BlockSpec((p, p), lambda t: (k + 1 + t, k))],
            out_specs=[pl.BlockSpec((p, p), lambda t: (k + 1 + t, k))],
        )(hbm_ref, hbm_ref)

    # ---- trailing update A_ij -= L_ik L_jkᵀ over the flattened
    # triangular tile space (j ≤ i), double-buffered by emit_pipeline
    def trail_body(a_ref, lik_ref, ljk_ref, out_ref):
        out_ref[...] = a_ref[...] - jax.lax.dot_general(
            lik_ref[...], ljk_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),  # L_ik L_jkᵀ
            preferred_element_type=jnp.float32,
        )

    def ij_spec(which):
        def index_map(t):
            ir, jr = _tri_decode(t)
            i = k + 1 + ir
            j = k + 1 + jr
            if which == "a":
                return (i, j)
            if which == "lik":
                return (i, k)
            return (j, k)

        return pl.BlockSpec((p, p), index_map)

    n_tiles = nrem * (nrem + 1) // 2

    @pl.when(n_tiles > 0)
    def _():
        pltpu.emit_pipeline(
            trail_body,
            grid=(n_tiles,),
            in_specs=[ij_spec("a"), ij_spec("lik"), ij_spec("ljk")],
            out_specs=[ij_spec("a")],
        )(hbm_ref, hbm_ref, hbm_ref, hbm_ref)


@partial(jax.jit, static_argnames=("panel", "sub", "interpret"))
def cholesky_pallas(
    K: jax.Array, *, panel: int = _PANEL, sub: int = 128,
    interpret: bool | None = None
) -> jax.Array:
    """Lower Cholesky factor of SPD K, Pallas blocked kernel.

    Returns tril(L) (upper triangle zeroed).  Falls back to XLA for
    ragged sizes or off-TPU execution (tests run the kernel in interpret
    mode explicitly; see tests/test_pallas_chol.py).
    """
    n = K.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if interpret or n % panel != 0 or n == panel:
        # emit_pipeline has no interpret-mode emulation; off-TPU runs use
        # the XLA factorization (micro-kernels are unit-tested directly)
        return jnp.tril(jnp.linalg.cholesky(K))
    nb = n // panel
    out = pl.pallas_call(
        partial(_chol_kernel, panel, nb, sub),
        out_shape=jax.ShapeDtypeStruct(K.shape, K.dtype),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((panel, panel), jnp.float32),  # diag_buf
            pltpu.VMEM((panel, panel), jnp.float32),  # winv_buf
            pltpu.SemaphoreType.DMA((1,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=4 * n * n,
            transcendentals=0,
        ),
    )(K)
    return jnp.tril(out)


# ---------------------------------------------------------------------------
# Lookahead-pipelined variant: hide the serial factorization chain under
# the trailing-update stream (the round-1 isolated bottleneck)
# ---------------------------------------------------------------------------


def _chol_kernel_la(panel: int, nb: int, interleave: bool, in_ref, hbm_ref,
                    diag_buf, winv_buf, lk1_buf, nd_buf, cnt, sems):
    """One grid step = one panel iteration with LOOKAHEAD.

    `diag_buf` (VMEM scratch, persistent across the sequential grid)
    enters step k holding the ALREADY-FACTORED L_kk — produced by step
    k−1's lookahead.  Step k:

      1. W = L_kk⁻¹ (log-depth doubling — no row-sweep chain),
      2. panel solves L_ik = A_ik Wᵀ (emit_pipeline RMW sweep),
      3. pre-update the NEXT diagonal: A_{k+1,k+1} −= L_{k+1,k}L_{k+1,k}ᵀ
         into `nd_buf`,
      4. trailing tiles (i,j) ≠ (k+1,k+1) stream through emit_pipeline;
         with `interleave`, each body invocation ALSO advances the next
         diagonal's column-sweep factorization by a chunk (state in
         `nd_buf`, progress counter in SMEM `cnt`) — the serial VPU
         chain executes inside the stream's DMA bubbles,
      5. leftover chain columns finish after the stream; the factored
         L_{k+1,k+1} stays in diag_buf for step k+1 and is written back.

    Round-1 isolated numbers (N=10240): diagonal chains 28–32 ms,
    panel+trailing ≈ 22 ms, fully serialized at 54.6 ms total; XLA 48.
    Overlap targets max(chain, stream) + panel solves.
    """
    k = pl.program_id(0)
    p = panel

    @pl.when(k == 0)
    def _():
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(0, p), pl.ds(0, p)], nd_buf, sems.at[0]
        )
        cp.start()
        cp.wait()
        diag_buf[...] = _micro_cholesky_blocked(nd_buf[...], p)
        cp = pltpu.make_async_copy(
            diag_buf, hbm_ref.at[pl.ds(0, p), pl.ds(0, p)], sems.at[0]
        )
        cp.start()
        cp.wait()

    winv_buf[...] = _micro_tri_inv(diag_buf[...], p)
    nrem = nb - k - 1

    # ---- panel solves: L_ik = A_ik Wᵀ — software-pipelined RMW sweep
    def panel_body(a_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            a_ref[...], winv_buf[...],
            dimension_numbers=(((1,), (1,)), ((), ())),  # A_ik @ Wᵀ
            preferred_element_type=jnp.float32,
        )

    @pl.when(nrem > 0)
    def _():
        pltpu.emit_pipeline(
            panel_body,
            grid=(nrem,),
            in_specs=[pl.BlockSpec((p, p), lambda t: (k + 1 + t, k))],
            out_specs=[pl.BlockSpec((p, p), lambda t: (k + 1 + t, k))],
        )(hbm_ref, hbm_ref)

        # park L_{k+1,k} and the next diagonal block, then pre-update
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds((k + 1) * p, p), pl.ds(k * p, p)],
            lk1_buf, sems.at[0],
        )
        cp.start()
        cp2 = pltpu.make_async_copy(
            hbm_ref.at[pl.ds((k + 1) * p, p), pl.ds((k + 1) * p, p)],
            nd_buf, sems.at[1],
        )
        cp2.start()
        cp.wait()
        cp2.wait()
        nd_buf[...] = nd_buf[...] - jax.lax.dot_general(
            lk1_buf[...], lk1_buf[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cnt[0] = 0

        n_t = nrem * (nrem + 1) // 2 - 1  # trailing tiles minus (k+1,k+1)
        # chain chunk size: spread the p columns across the stream
        chunk = jnp.maximum(1, (p + n_t - 1) // jnp.maximum(1, n_t))
        col_step = _chol_col_step(p)

        def trail_body(a_ref, lik_ref, ljk_ref, out_ref):
            if interleave:
                c0 = cnt[0]
                todo = jnp.minimum(chunk, p - c0)
                nd_buf[...] = jax.lax.fori_loop(
                    c0, c0 + todo, col_step, nd_buf[...]
                )
                cnt[0] = c0 + todo
            out_ref[...] = a_ref[...] - jax.lax.dot_general(
                lik_ref[...], ljk_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),  # L_ik L_jkᵀ
                preferred_element_type=jnp.float32,
            )

        def ij_spec(which):
            def index_map(t):
                ir, jr = _tri_decode(t + 1)  # skip tile 0 = (k+1,k+1)
                i = k + 1 + ir
                j = k + 1 + jr
                if which == "a":
                    return (i, j)
                if which == "lik":
                    return (i, k)
                return (j, k)

            return pl.BlockSpec((p, p), index_map)

        @pl.when(n_t > 0)
        def _():
            pltpu.emit_pipeline(
                trail_body,
                grid=(n_t,),
                in_specs=[ij_spec("a"), ij_spec("lik"), ij_spec("ljk")],
                out_specs=[ij_spec("a")],
            )(hbm_ref, hbm_ref, hbm_ref, hbm_ref)

        # finish whatever chain columns the stream did not cover
        diag_buf[...] = jax.lax.fori_loop(
            cnt[0], p, col_step, nd_buf[...]
        )
        cp = pltpu.make_async_copy(
            diag_buf,
            hbm_ref.at[pl.ds((k + 1) * p, p), pl.ds((k + 1) * p, p)],
            sems.at[1],
        )
        cp.start()
        cp.wait()


@partial(jax.jit, static_argnames=("panel", "interleave", "interpret"))
def cholesky_pallas_la(
    K: jax.Array, *, panel: int = _PANEL, interleave: bool = True,
    interpret: bool | None = None
) -> jax.Array:
    """Lower Cholesky factor — lookahead-pipelined Pallas kernel.

    Same contract as `cholesky_pallas` (tril output, XLA fallback for
    ragged sizes / off-TPU).
    """
    n = K.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if interpret or n % panel != 0 or n == panel:
        return jnp.tril(jnp.linalg.cholesky(K))
    nb = n // panel
    out = pl.pallas_call(
        partial(_chol_kernel_la, panel, nb, interleave),
        out_shape=jax.ShapeDtypeStruct(K.shape, K.dtype),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((panel, panel), jnp.float32),  # diag_buf
            pltpu.VMEM((panel, panel), jnp.float32),  # winv_buf
            pltpu.VMEM((panel, panel), jnp.float32),  # lk1_buf
            pltpu.VMEM((panel, panel), jnp.float32),  # nd_buf
            pltpu.SMEM((1,), jnp.int32),  # cnt — chain progress
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=4 * n * n,
            transcendentals=0,
        ),
    )(K)
    return jnp.tril(out)
