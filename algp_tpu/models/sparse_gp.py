"""L1c — Sparse variational GP regression (SGPR, Titsias' collapsed bound).

Beyond-reference capability (the reference's GPR is exact-only, SURVEY.md
§2 C3): when the SAMPLED set grows into the thousands — long campaigns,
pooled multi-field data — the exact O(n³)-per-optimizer-step MLL fit stops
being free.  SGPR fits hyperparameters by maximising the collapsed
variational lower bound over M inducing points:

    ELBO = log N(y | 0, Q + Λ) − ½ tr(Λ⁻¹ (K − Q)),
    Q = K_xz K_zz⁻¹ K_zx,   Λ = diag(per-sample noise variance)

computed without materialising any n×n matrix:

    A = L_zz⁻¹ K_zx Λ^{-½}           (M×n)
    B = I + A Aᵀ,  L_B = chol(B)     (M×M)
    c = L_B⁻¹ A Λ^{-½} y             (M,)

    log N(y|0, Q+Λ) = −½[ n log 2π + Σᵢ log λᵢ + 2 Σ log diag L_B
                          + yᵀΛ⁻¹y − cᵀc ]
    trace term      = −½ Σᵢ (kᵢᵢ − qᵢᵢ)/λᵢ

All heavy ops are tall-skinny (M×n)·(n×M) MXU matmuls + one M×M
Cholesky — O(n·M²) per optimizer step.  The fit reuses the exact path's
one-jit machinery verbatim (`models.gp._opt_loop`: scan the iterations,
vmap the restarts, best-ever tracking), heteroscedastic Λ and
identity-padded `num_valid` buffers included, so episode integration
follows the same static-shape discipline.

The bound is exact when Z = X (ELBO = MLL, posterior = exact posterior
— tested against models.gp and the f64 oracle), and monotone in the
inducing set (Titsias 2009).  Kernel-quality caveat: like the exact
path, everything is f32 with HIGHEST-precision matmuls.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from algp_tpu.config import FitConfig
from algp_tpu.models.gp import (
    FitResult,
    _opt_loop,
    effective_noise_var,
    make_restart_inits,
)
from algp_tpu.ops import linalg as la
from algp_tpu.ops.gram import gram_pallas
from algp_tpu.ops.kernels import KernelParams, KernelSpec, gram, gram_diag

_HIGH = lax.Precision.HIGHEST
_LOG2PI = 1.8378770664093453

#: relative jitter on K_zz (matches acquisition_lowrank._Z_JITTER)
_Z_JITTER = 1e-6


def neg_elbo(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    *,
    min_noise: float = 1e-3,
    jitter: float = 1e-6,
    num_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Negative collapsed SGPR bound  −ELBO  (see module docstring).

    Mirrors `models.gp.neg_mll`'s conventions: heteroscedastic
    `noise_scale` multiplies the fitted noise VARIANCE per sample;
    `num_valid` identity-pads the training buffers (padded entries
    contribute exactly zero to every term).  `jitter` is accepted for
    signature parity with `neg_mll` but unused: Λ is already bounded
    below by min_noise², and K_zz carries its own relative jitter.
    """
    del jitter
    n = x.shape[0]
    M = z.shape[0]
    nv = effective_noise_var(params, min_noise, noise_scale)
    lam = jnp.broadcast_to(nv, (n,)).astype(jnp.float32)
    if num_valid is not None:
        mask = (jnp.arange(n) < num_valid).astype(jnp.float32)
        count = num_valid
    else:
        mask = jnp.ones((n,), jnp.float32)
        count = n
    lam = jnp.where(mask > 0, lam, 1.0)  # padded slots: λ=1, zero terms
    y = y * mask
    os_ = jnp.exp(params.log_outputscale)
    Kzz = gram(spec, params, z, z) + _Z_JITTER * os_ * jnp.eye(
        M, dtype=jnp.float32
    )
    Lzz = jnp.linalg.cholesky(Kzz)
    Kzx = gram(spec, params, z, x) * mask[None, :]
    U = la.solve_triangular(Lzz, Kzx)  # (M, n) = L_zz⁻¹ K_zx
    rl = jax.lax.rsqrt(lam)
    A = U * rl[None, :]
    B = jnp.eye(M, dtype=jnp.float32) + jnp.dot(A, A.T, precision=_HIGH)
    LB = jnp.linalg.cholesky(B)
    c = la.solve_triangular(LB, jnp.dot(A, y * rl, precision=_HIGH))
    qdiag = jnp.sum(U * U, axis=0)
    kdiag = gram_diag(spec, params, x)
    trace = 0.5 * jnp.sum(
        mask * jnp.maximum(kdiag - qdiag, 0.0) / lam
    )
    quad = 0.5 * (jnp.dot(y, y * (1.0 / lam)) - jnp.dot(c, c))
    logdet = jnp.sum(mask * jnp.log(lam)) * 0.5 + jnp.sum(
        jnp.log(jnp.diagonal(LB))
    )
    return quad + logdet + 0.5 * count * _LOG2PI + trace


def _fit_single_sparse(spec, cfg, x, y, z, noise_scale, params0, num_valid):
    def loss(p):
        if not cfg.learn_noise:
            p = dataclasses.replace(p, log_noise=lax.stop_gradient(p.log_noise))
        return neg_elbo(
            spec, p, x, y, z, noise_scale, min_noise=cfg.min_noise,
            jitter=cfg.jitter, num_valid=num_valid,
        )

    return _opt_loop(cfg, loss, params0)


@partial(jax.jit, static_argnames=("spec", "cfg", "has_noise_scale",
                                   "has_num_valid"))
def _fit_sparse_jit(spec, cfg, x, y, z, noise_scale, inits, has_noise_scale,
                    num_valid=None, has_num_valid=False):
    ns = noise_scale if has_noise_scale else None
    nvalid = num_valid if has_num_valid else None
    run = lambda p0: _fit_single_sparse(spec, cfg, x, y, z, ns, p0, nvalid)
    best_p, best_nll, trace = jax.vmap(run)(inits)
    k = jnp.argmin(best_nll)  # lowest index wins ties (oracle contract)
    params = jax.tree_util.tree_map(lambda a: a[k], best_p)
    return FitResult(
        params=params, nll=best_nll[k], all_nlls=best_nll,
        nll_trace=trace, best_restart=k,
    )


def fit_sparse(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    num_valid: Optional[jax.Array] = None,
) -> FitResult:
    """Multi-restart −ELBO fit — `models.gp.fit` with the SGPR objective:
    ONE jitted program, vmap over `cfg.restarts` inits × scan over
    `cfg.iters` steps.  `nll` in the result is the best −ELBO (an upper
    bound on the exact −MLL)."""
    inits = make_restart_inits(spec, cfg, key)
    return _fit_sparse_jit(
        spec, cfg, x, y, z, noise_scale, inits, noise_scale is not None,
        num_valid, num_valid is not None,
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "num_inducing",
                                   "has_noise_scale"))
def _fit_step_sparse_jit(spec, cfg, x, y, noise_scale, base_key, step,
                         num_valid, *, num_inducing, has_noise_scale):
    from algp_tpu.acquisition_lowrank import kcenter_indices

    key = jax.random.fold_in(base_key, step)
    inits = make_restart_inits(spec, cfg, key)
    # k-center inducing design over the VALID rows of the padded buffer,
    # derived INSIDE the program (one async dispatch per refit, like
    # gp.fit_step)
    zidx = kcenter_indices(x, num_inducing, num_valid)
    z = x[zidx]
    return _fit_sparse_jit(
        spec, cfg, x, y, z, noise_scale, inits, has_noise_scale,
        num_valid, True,
    )


def fit_step_sparse(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array],
    base_key: jax.Array,
    step,
    num_valid: jax.Array,
    *,
    num_inducing: int,
) -> FitResult:
    """Episode-refit variant of `fit_sparse` — `gp.fit_step` with the
    collapsed −ELBO objective and a k-center inducing design over the
    sampled set, everything (key fold_in, restart inits, z) derived
    INSIDE one jitted program.  The episode swaps this in for the exact
    refit once the sampled set exceeds `FitConfig.sparse_threshold`
    (long campaigns: the exact fit is O(n³) per optimizer step, this is
    O(n·M²)).  Requires num_valid ≥ num_inducing when invoked — the
    episode's threshold rule guarantees it (threshold ≥ sparse_inducing
    is validated at Agent construction) and `check_kcenter_m` enforces
    it here for every other caller."""
    from algp_tpu.acquisition_lowrank import check_kcenter_m

    check_kcenter_m(num_valid, min(num_inducing, x.shape[0]),
                    "fit_step_sparse")
    return _fit_step_sparse_jit(
        spec, cfg, x, y, noise_scale, base_key,
        jnp.asarray(step, jnp.uint32), jnp.asarray(num_valid, jnp.int32),
        num_inducing=min(num_inducing, x.shape[0]),
        has_noise_scale=noise_scale is not None,
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "num_inducing",
                                   "has_noise_scale"))
def _fit_step_sparse_warm_jit(spec, cfg, x, y, noise_scale, base_key, step,
                              num_valid, incumbent, *, num_inducing,
                              has_noise_scale):
    from algp_tpu.acquisition_lowrank import kcenter_indices

    key = jax.random.fold_in(base_key, step)
    inits = make_restart_inits(spec, cfg, key)
    # restart 0 = incumbent (see gp.fit_step_warm): best-ever tracking
    # makes the warm refit's −ELBO ≤ the incumbent's on the new data
    inits = jax.tree_util.tree_map(
        lambda stacked, inc: stacked.at[0].set(inc), inits, incumbent
    )
    zidx = kcenter_indices(x, num_inducing, num_valid)
    z = x[zidx]
    return _fit_sparse_jit(
        spec, cfg, x, y, z, noise_scale, inits, has_noise_scale,
        num_valid, True,
    )


def fit_step_sparse_warm(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array],
    base_key: jax.Array,
    step,
    num_valid: jax.Array,
    incumbent,
    *,
    num_inducing: int,
) -> FitResult:
    """`fit_step_sparse` with a warm incumbent restart and
    `gp.refit_cfg`'s shrunk iters/restarts — the long-campaign refit
    (O(n·M²) per optimizer step ×150 sequential steps) is the dominant
    per-refit cost there, and the optimum moves little per step."""
    from algp_tpu.acquisition_lowrank import check_kcenter_m
    from algp_tpu.models.gp import refit_cfg

    check_kcenter_m(num_valid, min(num_inducing, x.shape[0]),
                    "fit_step_sparse_warm")
    return _fit_step_sparse_warm_jit(
        spec, refit_cfg(cfg), x, y, noise_scale, base_key,
        jnp.asarray(step, jnp.uint32), jnp.asarray(num_valid, jnp.int32),
        incumbent, num_inducing=min(num_inducing, x.shape[0]),
        has_noise_scale=noise_scale is not None,
    )


# ---------------------------------------------------------------------------
# Posterior
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparsePosterior:
    """Cached SGPR predictive state — O(M²), independent of n.

    Lzz : (M, M) chol of K_zz (+ jitter)
    LB  : (M, M) chol of I + A Aᵀ
    c   : (M,)   L_B⁻¹ A Λ^{-½} y
    z   : (M, d) inducing locations
    """

    Lzz: jax.Array
    LB: jax.Array
    c: jax.Array
    z: jax.Array


@partial(jax.jit, static_argnames=("spec", "min_noise", "has_noise_scale",
                                   "has_num_valid"))
def _posterior_sparse_jit(spec, params, x, y, z, noise_scale, min_noise,
                          has_noise_scale, num_valid=None,
                          has_num_valid=False):
    ns = noise_scale if has_noise_scale else None
    n = x.shape[0]
    M = z.shape[0]
    nv = effective_noise_var(params, min_noise, ns)
    lam = jnp.broadcast_to(nv, (n,)).astype(jnp.float32)
    if has_num_valid:
        mask = (jnp.arange(n) < num_valid).astype(jnp.float32)
    else:
        mask = jnp.ones((n,), jnp.float32)
    lam = jnp.where(mask > 0, lam, 1.0)
    y = y * mask
    os_ = jnp.exp(params.log_outputscale)
    Kzz = gram(spec, params, z, z) + _Z_JITTER * os_ * jnp.eye(
        M, dtype=jnp.float32
    )
    Lzz = jnp.linalg.cholesky(Kzz)
    Kzx = gram(spec, params, z, x) * mask[None, :]
    U = la.solve_triangular(Lzz, Kzx)
    rl = jax.lax.rsqrt(lam)
    A = U * rl[None, :]
    B = jnp.eye(M, dtype=jnp.float32) + jnp.dot(A, A.T, precision=_HIGH)
    LB = jnp.linalg.cholesky(B)
    c = la.solve_triangular(LB, jnp.dot(A, y * rl, precision=_HIGH))
    return SparsePosterior(Lzz=Lzz, LB=LB, c=c, z=z)


def posterior_sparse(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    *,
    min_noise: float = 1e-3,
    num_valid: Optional[jax.Array] = None,
) -> SparsePosterior:
    return _posterior_sparse_jit(
        spec, params, x, y, z, noise_scale, min_noise,
        noise_scale is not None, num_valid, num_valid is not None,
    )


@partial(jax.jit, static_argnames=("spec", "use_pallas"))
def predict_sparse(
    spec: KernelSpec,
    params: KernelParams,
    post: SparsePosterior,
    x_test: jax.Array,
    *,
    use_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """SGPR predictive mean/variance at `x_test` (the q(f*) marginals):

        V1 = L_zz⁻¹ K_z*          μ* = V1ᵀ L_B⁻ᵀ c
        V2 = L_B⁻¹ V1             σ²* = k** − colsum V1² + colsum V2²
    """
    if use_pallas:
        Kzs = gram_pallas(spec, params, post.z, x_test)
    else:
        Kzs = gram(spec, params, post.z, x_test)
    V1 = la.solve_triangular(post.Lzz, Kzs)  # (M, N)
    V2 = la.solve_triangular(post.LB, V1)
    mean = jnp.dot(V2.T, post.c, precision=_HIGH)
    var = (
        gram_diag(spec, params, x_test)
        - jnp.sum(V1 * V1, axis=0)
        + jnp.sum(V2 * V2, axis=0)
    )
    return mean, jnp.maximum(var, 0.0)


class SparseGP:
    """Stateful façade mirroring `models.gp.ExactGP` for the sparse model:
    `fit(x, y)` / `predict(x*)` with an M-point k-center inducing design
    (or an explicit `z`)."""

    def __init__(self, spec: KernelSpec, num_inducing: int = 256,
                 fit_config: Optional[FitConfig] = None):
        self.spec = spec
        self.num_inducing = num_inducing
        self.fit_config = fit_config or FitConfig()
        self.params: Optional[KernelParams] = None
        self.post: Optional[SparsePosterior] = None

    def fit(self, x, y, noise_scale=None, key=None, z=None) -> FitResult:
        from algp_tpu.acquisition_lowrank import kcenter_indices

        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if z is None:
            m = min(self.num_inducing, x.shape[0])
            z = x[kcenter_indices(x, m)]
        else:
            z = jnp.asarray(z, jnp.float32)
        res = fit_sparse(self.spec, self.fit_config, x, y, z, noise_scale,
                         key)
        self.params = res.params
        self.post = posterior_sparse(
            self.spec, res.params, x, y, z, noise_scale,
            min_noise=self.fit_config.min_noise,
        )
        return res

    def predict(self, x_test, *, use_pallas: bool = False):
        if self.post is None:
            raise RuntimeError("fit() first")
        return predict_sparse(
            self.spec, self.params, self.post,
            jnp.asarray(x_test, jnp.float32), use_pallas=use_pallas,
        )
