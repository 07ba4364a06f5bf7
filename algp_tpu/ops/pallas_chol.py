"""Pallas blocked Cholesky — the full factorization in ONE kernel.

STATUS (2026-08-16, v5e, N=10240, honest sum-forced timing): correct to
f32 (checksum parity with XLA to 7 digits) at **54.6 ms vs XLA's 48.1 ms**.
Bottleneck definitively isolated: the diagonal micro-factorizations ALONE
cost 32.2 ms (measured with trailing updates removed), and FULL loop
unrolling only improves that to 28.3 ms — so it is the inherent serial
column-dependency critical path (10 240 dependent column steps × ~2.8 µs
of chained VPU ops), not loop overhead.  Any blocked Cholesky pays this
chain; XLA's 48 ms is mostly the same chain.  Also measured: fusing the
per-step op chain (pivot extracted from the column vector, single
combined write) does NOT help either (32.9 ms) — the floor is the
per-iteration carried-state latency, not op count.  Beating it requires
OVERLAPPING the trailing-update DMA/MXU stream with the chain (lookahead:
factor panel k+1's diagonal while panel k's trailing tiles stream), which
needs the trailing pipeline and the micro-factorization interleaved in
one instruction stream — budgeted for a later round.  Until then
`ops.linalg.cholesky` (XLA) remains the default in the hot paths and
this kernel is the native-algorithm reference.

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


def _micro_cholesky(A, panel: int):
    """In-VMEM column-sweep Cholesky of a (panel, panel) block.

    Right-looking: per column c — scale by rsqrt of the pivot, rank-1
    update of the trailing block.  All ops are full-tile VPU passes with
    row/col masks; ~panel × few-µs total.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 1)

    def step(c, A):
        # Mosaic cannot lower value-space dynamic_slice — extract the
        # pivot / column with full-tile masked reductions instead
        pivot = jnp.sum(jnp.where((rows == c) & (cols == c), A, 0.0))
        inv_d = jax.lax.rsqrt(pivot)
        col = jnp.sum(jnp.where(cols == c, A, 0.0), axis=1, keepdims=True)
        rid = jax.lax.broadcasted_iota(jnp.int32, (panel, 1), 0)
        l = jnp.where(rid >= c, col * inv_d, 0.0)  # L[:, c], zero above
        # trailing update A[i, j] -= l_i l_j  for i, j > c
        upd = l * l.reshape(1, panel)  # (p, p) outer product
        mask = jnp.logical_and(rows > c, cols > c)
        A = A - jnp.where(mask, upd, 0.0)
        # write column c: L values at rows ≥ c
        A = jnp.where(cols == c, jnp.where(rows >= c, l, A), A)
        return A

    return jax.lax.fori_loop(0, panel, step, A)


def _micro_tri_inv(L, panel: int):
    """In-VMEM forward substitution: W = L⁻¹ for a (panel, panel) lower
    block.  Row sweep: W[c, :] = (e_c − L[c, :c] W[:c, :]) / L[c, c]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (panel, panel), 0)

    def step(c, W):
        Lrow = jnp.sum(jnp.where(rows == c, L, 0.0), axis=0, keepdims=True)
        rid = jax.lax.broadcasted_iota(jnp.int32, (1, panel), 1)
        Lrow_below = jnp.where(rid < c, Lrow, 0.0)  # L[c, :c]
        pivot = jnp.sum(jnp.where((rows == c) & (cols == c), L, 0.0))
        acc = jnp.dot(Lrow_below, W, preferred_element_type=jnp.float32)
        e_c = (rid == c).astype(jnp.float32)
        new_row = (e_c - acc) / pivot  # (1, p)
        W = jnp.where(rows == c, new_row, W)
        return W

    return jax.lax.fori_loop(0, panel, step, jnp.zeros_like(L))


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


def _micro_tri_inv_blocked(L, panel: int, sub: int = 128):
    """Hierarchical W = L⁻¹ of a (panel, panel) lower tile: sub-diagonal
    inverses by row sweep on (sub, sub), off-diagonal blocks by MXU
    combines (same bisection identity as ops.linalg.tri_inv)."""
    nbl = panel // sub
    Ws = []
    for b in range(nbl):
        Ws.append(
            _micro_tri_inv(L[b * sub : (b + 1) * sub, b * sub : (b + 1) * sub], sub)
        )
    W = jnp.zeros_like(L)
    for b, Wb in enumerate(Ws):
        W = W + _embed(Wb, panel, b * sub, b * sub)
    # fill sub-diagonal block columns bottom-up: W_ib = -W_ii (Σ L_ik W_kb)
    for bcol in range(nbl - 1):
        for brow in range(bcol + 1, nbl):
            acc = jnp.zeros((sub, sub), jnp.float32)
            for k in range(bcol, brow):
                Lik = L[brow * sub : (brow + 1) * sub, k * sub : (k + 1) * sub]
                Wkb = W[k * sub : (k + 1) * sub, bcol * sub : (bcol + 1) * sub]
                acc = acc + jax.lax.dot_general(
                    Lik, Wkb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            Wib = -jax.lax.dot_general(
                Ws[brow], acc,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            W = W + _embed(Wib, panel, brow * sub, bcol * sub)
    return W


def _chol_kernel(panel: int, nb: int, in_ref, hbm_ref,
                 diag_buf, winv_buf, sems):
    k = pl.program_id(0)
    p = panel

    copy_diag_in = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(k * p, p), pl.ds(k * p, p)], diag_buf, sems.at[0]
    )
    copy_diag_in.start()
    copy_diag_in.wait()
    Lkk = _micro_cholesky_blocked(diag_buf[...], p)
    diag_buf[...] = Lkk
    copy_diag_out = pltpu.make_async_copy(
        diag_buf, hbm_ref.at[pl.ds(k * p, p), pl.ds(k * p, p)], sems.at[0]
    )
    copy_diag_out.start()
    winv_buf[...] = _micro_tri_inv_blocked(Lkk, p)
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


@partial(jax.jit, static_argnames=("panel", "interpret"))
def cholesky_pallas(
    K: jax.Array, *, panel: int = _PANEL, interpret: bool | None = None
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
        partial(_chol_kernel, panel, nb),
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
