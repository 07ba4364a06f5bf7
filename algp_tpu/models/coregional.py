"""Coregionalized multi-trait GP (ICM — intrinsic coregionalization model).

Beyond-reference model family (SURVEY.md §2 C12's multi-trait experiments;
the reference `sumitsk/algp` fits one trait per run and `models.gp.fit_multi`
batches INDEPENDENT per-trait GPs).  Phenotype traits are often strongly
correlated (height and biomass share genetics), and some traits are
expensive or destructive to measure — so they are observed at only a
fraction of visited plots (the table loader's `observed_traits` mask records
exactly this).  The ICM couples the traits through a learnable trait
covariance so densely-measured traits carry information into
sparsely-measured ones:

    cov[f_t(x), f_s(x')] = B[t, s] · k(x, x'),     B = A Aᵀ + diag(κ)

with the spatial(×feature) kernel k shared across traits and the T×T PSD
trait covariance B learned by marginal likelihood alongside k's
hyperparameters.  The joint system over n plots × T traits is the nT×nT
Gram kron(K_x, B) + per-(plot,trait) noise; per-trait observation masks are
handled by the same identity-padding trick as the exact GP
(`gp._masked_gram_with_noise`), so arbitrary missing (plot, trait) cells
contribute exactly zero to the likelihood.

TPU-first design:
  * One jitted multi-restart fit reusing `gp._opt_loop` (scan over steps ×
    vmap over restarts); nT stays in the hundreds-to-few-thousand range
    (sampled plots × a handful of traits), so each step's nT×nT Cholesky
    is one MXU-friendly batched factorization.
  * The kernel's own outputscale and base noise are FIXED during the ICM
    fit (stop-gradient): B absorbs the per-trait signal variance and
    `log_noise_t` carries per-trait noise — the standard ICM
    identifiability choice.
  * Prediction reuses the cached nT Cholesky: per-trait means for ALL
    traits cost one (n,N) cross-Gram + one matmul (μ_t = K_cᵀ(α_mat B)_t);
    variances run one panel-blocked trisolve per trait.

Measured behavior: benchmarks/coregional_study.py — on correlated traits
with sparsely-observed secondary traits the ICM beats independent fits on
the sparse traits; at zero correlation or full observation it is neutral.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from algp_tpu.config import FitConfig
from algp_tpu.models import gp as gp_mod
from algp_tpu.ops import linalg as la
from algp_tpu.ops.kernels import (
    KernelParams,
    KernelSpec,
    gram,
    gram_diag,
)

_LOG2PI = gp_mod._LOG2PI


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ICMParams:
    """ICM hyperparameters — a JAX pytree.

    kernel      : shared spatial(×feature) kernel hyperparameters
                  (its log_outputscale / log_noise are held FIXED by the
                  fit: B and log_noise_t own those degrees of freedom)
    coreg_a     : (T, r) factor of the trait covariance B = A Aᵀ + diag(κ)
    log_coreg_kappa : (T,) log of B's diagonal boost κ (keeps B PSD with
                  full support even at rank r < T)
    log_noise_t : (T,) per-trait log observation-noise std (the
                  heteroscedastic per-sample `noise_scale` multiplies the
                  resulting variance, exactly as in the exact GP)
    """

    kernel: KernelParams
    coreg_a: jax.Array
    log_coreg_kappa: jax.Array
    log_noise_t: jax.Array


def trait_cov(params: ICMParams) -> jax.Array:
    """The T×T PSD trait covariance B = A Aᵀ + diag(exp κ)."""
    A = params.coreg_a
    return A @ A.T + jnp.diag(jnp.exp(params.log_coreg_kappa))


def _flat_mask(n, T, obs_mask, num_valid):
    m = jnp.ones((n, T), bool) if obs_mask is None else obs_mask
    if num_valid is not None:
        m = m & (jnp.arange(n) < num_valid)[:, None]
    return m.reshape(-1)


def _icm_system(spec, params, x, obs_mask, noise_scale, min_noise, jitter,
                num_valid):
    """The masked nT×nT joint Gram + its flattened observation mask.

    Flattening is plot-major: entry m = i·T + t is (plot i, trait t), so
    kron(K_x, B)[m, m'] = K_x[i, j]·B[t, s].  Masked (unobserved) entries
    are identity-padded — rows/cols become e_m, so with y = 0 there they
    contribute 0 to both the quadratic form and the log-det (the exact
    contract `gp._masked_gram_with_noise` establishes for the exact GP).
    """
    n = x.shape[0]
    T = params.log_noise_t.shape[0]
    Kx = gram(spec, params.kernel, x, x)
    B = trait_cov(params)
    C = jnp.kron(Kx, B)
    nv_t = jnp.maximum(
        jnp.exp(2.0 * params.log_noise_t), min_noise * min_noise
    )
    ns = (
        jnp.ones((n,), jnp.float32)
        if noise_scale is None
        else noise_scale
    )
    nv = (ns[:, None] * nv_t[None, :]).reshape(-1)
    C = C + jnp.diag(nv + jitter)
    mf = _flat_mask(n, T, obs_mask, num_valid)
    pair = mf[:, None] & mf[None, :]
    C = jnp.where(pair, C, jnp.eye(n * T, dtype=jnp.float32))
    return C, mf


def neg_mll_icm(
    spec: KernelSpec,
    params: ICMParams,
    x: jax.Array,
    Y: jax.Array,
    obs_mask: Optional[jax.Array] = None,
    noise_scale: Optional[jax.Array] = None,
    *,
    min_noise: float = 1e-3,
    jitter: float = 1e-6,
    num_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Joint negative log marginal likelihood of the ICM over (n, T) traits.

    Equals the dense sub-problem restricted to observed (plot, trait)
    cells exactly (identity padding; pinned by tests vs the f64 oracle
    `tests/oracle.icm_nll`).  Y entries at masked cells are ignored.
    """
    n, T = Y.shape
    C, mf = _icm_system(
        spec, params, x, obs_mask, noise_scale, min_noise, jitter, num_valid
    )
    y = jnp.where(mf, Y.reshape(-1), 0.0)
    L = jnp.linalg.cholesky(C)
    alpha = la.cho_solve(L, y)
    count = jnp.sum(mf.astype(jnp.float32))
    return (
        0.5 * jnp.dot(y, alpha)
        + jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * count * _LOG2PI
    )


# ---------------------------------------------------------------------------
# Fitting: multi-restart optimizer on the joint -MLL (reuses gp._opt_loop)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ICMFitResult:
    params: ICMParams
    nll: jax.Array
    all_nlls: jax.Array
    nll_trace: jax.Array
    best_restart: jax.Array


def make_icm_inits(
    spec: KernelSpec,
    cfg: FitConfig,
    T: int,
    rank: int,
    key: Optional[jax.Array] = None,
) -> ICMParams:
    """Stacked multi-restart ICM inits (restart axis leading).

    Restart 0 is deterministic (unperturbed kernel init, A = 0.3/√r,
    κ = 0.5, per-trait noise = cfg.init_noise → B ≈ 0.59·I + small
    cross-terms); the rest perturb A additively and the log-space leaves
    by cfg.perturb, mirroring `gp.make_restart_inits`.  The kernel's
    outputscale init is FORCED to 1.0 (B owns the signal variance).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_kernel, k_coreg = jax.random.split(key)
    cfg_os1 = dataclasses.replace(cfg, init_outputscale=1.0)
    kernel_inits = gp_mod.make_restart_inits(spec, cfg_os1, k_kernel)
    # the fit stop-gradients log_outputscale/log_noise, so whatever a
    # restart STARTS with is where it stays — pin both to the restart-0
    # values across ALL restarts (make_restart_inits perturbs every
    # leaf), otherwise a winning perturbed restart would carry a random
    # frozen outputscale and B's diagonal would no longer read as the
    # per-trait signal variance
    kernel_inits = dataclasses.replace(
        kernel_inits,
        log_outputscale=jnp.zeros_like(kernel_inits.log_outputscale),
        log_noise=jnp.full_like(
            kernel_inits.log_noise, jnp.log(cfg.init_noise)
        ),
    )

    a0 = jnp.full((T, rank), 0.3 / np.sqrt(rank), jnp.float32)
    lk0 = jnp.full((T,), jnp.log(0.5), jnp.float32)
    ln0 = jnp.full((T,), jnp.log(cfg.init_noise), jnp.float32)
    keys = jax.random.split(k_coreg, cfg.restarts)

    def one(i):
        if i == 0:
            return a0, lk0, ln0
        ka, kk, kn = jax.random.split(keys[i], 3)
        return (
            a0 + cfg.perturb * jax.random.normal(ka, a0.shape, jnp.float32),
            lk0 + cfg.perturb * jax.random.normal(kk, lk0.shape, jnp.float32),
            ln0 + cfg.perturb * jax.random.normal(kn, ln0.shape, jnp.float32),
        )

    As, lks, lns = zip(*(one(i) for i in range(cfg.restarts)))
    return ICMParams(
        kernel=kernel_inits,
        coreg_a=jnp.stack(As),
        log_coreg_kappa=jnp.stack(lks),
        log_noise_t=jnp.stack(lns),
    )


def _icm_loss_fn(spec, cfg, x, Y, obs_mask, noise_scale, num_valid):
    def loss(p: ICMParams):
        pk = dataclasses.replace(
            p.kernel,
            # B absorbs the signal variance, log_noise_t the noise —
            # freeze the kernel's own copies (zero gradient ⇒ Adam/L-BFGS
            # leave them at their init, exactly like gp's learn_noise)
            log_outputscale=lax.stop_gradient(p.kernel.log_outputscale),
            log_noise=lax.stop_gradient(p.kernel.log_noise),
        )
        p = dataclasses.replace(p, kernel=pk)
        if not cfg.learn_noise:
            p = dataclasses.replace(
                p, log_noise_t=lax.stop_gradient(p.log_noise_t)
            )
        return neg_mll_icm(
            spec, p, x, Y, obs_mask, noise_scale,
            min_noise=cfg.min_noise, jitter=cfg.jitter, num_valid=num_valid,
        )

    return loss


@partial(jax.jit, static_argnames=(
    "spec", "cfg", "has_obs_mask", "has_noise_scale", "has_num_valid"))
def _fit_icm_jit(spec, cfg, x, Y, obs_mask, noise_scale, inits,
                 has_obs_mask, has_noise_scale, num_valid=None,
                 has_num_valid=False):
    om = obs_mask if has_obs_mask else None
    ns = noise_scale if has_noise_scale else None
    nvalid = num_valid if has_num_valid else None
    loss = _icm_loss_fn(spec, cfg, x, Y, om, ns, nvalid)
    run = lambda p0: gp_mod._opt_loop(cfg, loss, p0)
    best_p, best_nll, trace = jax.vmap(run)(inits)
    k = jnp.argmin(best_nll)  # lowest index wins ties (oracle contract)
    params = jax.tree_util.tree_map(lambda a: a[k], best_p)
    return ICMFitResult(
        params=params,
        nll=best_nll[k],
        all_nlls=best_nll,
        nll_trace=trace,
        best_restart=k,
    )


def _shard_restart_inputs(mesh, inits, *arrays):
    """DP over restarts: shard the restart-leading init pytree across the
    mesh's 'restarts' axis and replicate the (tiny) training buffers —
    the ICM analog of parallel.sharded.sharded_fit.  Each device subset
    runs its restarts locally; the only cross-device traffic is the final
    NLL argmin.  Falls back to replication when the restart count does
    not divide the axis (e.g. 3 restarts on a 2-wide axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    r_axis = mesh.shape.get("restarts", 1)
    n_restarts = int(inits.coreg_a.shape[0])
    spec_r = (
        P("restarts") if r_axis > 1 and n_restarts % r_axis == 0 else P()
    )
    shard = NamedSharding(mesh, spec_r)
    inits = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, shard), inits
    )
    out = [None if a is None else jax.device_put(a, rep) for a in arrays]
    return (inits, *out)


def fit_icm(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    Y: jax.Array,
    obs_mask: Optional[jax.Array] = None,
    noise_scale: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    *,
    rank: int = 1,
    num_valid: Optional[jax.Array] = None,
    mesh=None,
) -> ICMFitResult:
    """Multi-restart joint MLL fit of the ICM.  One jitted program
    (vmap over `cfg.restarts` inits × scan over `cfg.iters` steps through
    `gp._opt_loop`); each step factorizes the R stacked nT×nT systems in
    one batched Cholesky.

    obs_mask : (n, T) bool — True where trait t was genuinely measured at
               plot i (the table loader's `observed_traits`); None = all.
    rank     : r of B = A Aᵀ + diag(κ); rank 1 is the classic ICM and is
               usually enough for a handful of correlated traits.
    mesh     : optional jax.sharding.Mesh with a 'restarts' axis — the
               restart batch shards across it (DP, exactly like the exact
               GP's parallel.sharded.sharded_fit); None = single device.
    """
    T = Y.shape[1]
    inits = make_icm_inits(spec, cfg, T, rank, key)
    if mesh is not None:
        inits, x, Y, obs_mask, noise_scale, num_valid = (
            _shard_restart_inputs(
                mesh, inits, x, Y, obs_mask, noise_scale, num_valid
            )
        )
    return _fit_icm_jit(
        spec, cfg, x, Y, obs_mask, noise_scale, inits,
        obs_mask is not None, noise_scale is not None,
        num_valid, num_valid is not None,
    )


# ---------------------------------------------------------------------------
# Posterior / prediction
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ICMPosterior:
    """Cached ICM posterior over the flattened (plot, trait) training set.

    L     : (nT, nT) lower Cholesky of the masked joint system
    alpha : (nT,)    Σ⁻¹ vec(Y)  (0 at masked entries)
    x     : (n, d)   training inputs (plots)
    mask  : (nT,)    1.0 at observed (plot, trait) entries
    B     : (T, T)   the fitted trait covariance
    """

    L: jax.Array
    alpha: jax.Array
    x: jax.Array
    mask: jax.Array
    B: jax.Array


@partial(jax.jit, static_argnames=(
    "spec", "min_noise", "jitter", "has_obs_mask", "has_noise_scale",
    "has_num_valid"))
def _posterior_icm_jit(spec, params, x, Y, obs_mask, noise_scale,
                       min_noise, jitter, has_obs_mask, has_noise_scale,
                       num_valid=None, has_num_valid=False):
    om = obs_mask if has_obs_mask else None
    ns = noise_scale if has_noise_scale else None
    nvalid = num_valid if has_num_valid else None
    C, mf = _icm_system(
        spec, params, x, om, ns, min_noise, jitter, nvalid
    )
    y = jnp.where(mf, Y.reshape(-1), 0.0)
    L = jnp.linalg.cholesky(C)
    alpha = la.cho_solve(L, y)
    return ICMPosterior(
        L=L, alpha=alpha, x=x, mask=mf.astype(jnp.float32),
        B=trait_cov(params),
    )


def posterior_icm(
    spec: KernelSpec,
    params: ICMParams,
    x: jax.Array,
    Y: jax.Array,
    obs_mask: Optional[jax.Array] = None,
    noise_scale: Optional[jax.Array] = None,
    *,
    min_noise: float = 1e-3,
    jitter: float = 1e-6,
    num_valid: Optional[jax.Array] = None,
) -> ICMPosterior:
    return _posterior_icm_jit(
        spec, params, x, Y, obs_mask, noise_scale, min_noise, jitter,
        obs_mask is not None, noise_scale is not None,
        num_valid, num_valid is not None,
    )


@partial(jax.jit, static_argnames=("spec",))
def predict_icm_mean(
    spec: KernelSpec,
    params: ICMParams,
    post: ICMPosterior,
    x_test: jax.Array,
) -> jax.Array:
    """Per-trait posterior MEANS at `x_test`, (N, T) — one (n, N)
    cross-Gram + one matmul for every trait at once:
    μ[j, t] = Σ_{i,s} k(x_i, x*_j)·B[s, t]·α[i, s] = (K_cᵀ (α_mat B))[j, t].
    The variance path (predict_icm) additionally runs one (nT, N)
    panel-blocked trisolve PER TRAIT — skip it when only means are
    consumed (the end-of-episode RMSE evaluation)."""
    n = post.x.shape[0]
    T = post.B.shape[0]
    Kc = gram(spec, params.kernel, post.x, x_test)  # (n, N)
    amat = post.alpha.reshape(n, T)
    return Kc.T @ (amat @ post.B)  # (N, T)


@partial(jax.jit, static_argnames=("spec", "block"))
def predict_icm(
    spec: KernelSpec,
    params: ICMParams,
    post: ICMPosterior,
    x_test: jax.Array,
    *,
    block: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Per-trait posterior mean and variance at `x_test`: (N, T) each.

    Means as in `predict_icm_mean`.  Variances run one panel-blocked
    (nT, N) trisolve per trait (T is a handful; chunk the test axis at
    the call site for ≥100k-point grids — V is materialized at nT·N
    floats per trait).
    """
    n = post.x.shape[0]
    T = post.B.shape[0]
    Kc = gram(spec, params.kernel, post.x, x_test)  # (n, N)
    amat = post.alpha.reshape(n, T)
    means = Kc.T @ (amat @ post.B)  # (N, T)
    kdiag = gram_diag(spec, params.kernel, x_test)  # (N,)
    cols = []
    for t in range(T):
        # rows (i, s) of the flattened cross-covariance to trait t
        cross = (Kc[:, None, :] * post.B[:, t][None, :, None]).reshape(
            n * T, -1
        )
        cross = cross * post.mask[:, None]
        V = la.blocked_solve_triangular(post.L, cross, block=block)
        cols.append(post.B[t, t] * kdiag - jnp.sum(V * V, axis=0))
    var = jnp.stack(cols, axis=1)
    return means, jnp.maximum(var, 0.0)


def fit_predict_icm(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    Y: jax.Array,
    x_test: jax.Array,
    obs_mask: Optional[jax.Array] = None,
    noise_scale: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    *,
    rank: int = 1,
    test_chunk: int = 65536,
    compute_var: bool = True,
    mesh=None,
) -> tuple[jax.Array, Optional[jax.Array], ICMFitResult]:
    """fit_icm + posterior + per-trait prediction, chunking the test axis
    so the per-chunk buffers stay bounded on big grids (every chunk
    shares one compiled program; the last is zero-padded to the chunk
    size and trimmed — bit-identical per column, matmul/trisolve columns
    are independent).

    compute_var=False skips the T per-trait (nT, chunk) trisolves and
    returns (means, None, res) — the right call when only mean fields
    are consumed (the end-of-episode RMSE evaluation): the variance pass
    dominates the eval cost and its transients scale with nT·chunk·T.

    mesh shards the fit's restart batch across the mesh's 'restarts'
    axis (see fit_icm); posterior/prediction run replicated (they are a
    single factorization + matmuls on the final parameters)."""
    res = fit_icm(
        spec, cfg, x, Y, obs_mask, noise_scale, key, rank=rank, mesh=mesh
    )
    post = posterior_icm(
        spec, res.params, x, Y, obs_mask, noise_scale,
        min_noise=cfg.min_noise, jitter=cfg.jitter,
    )
    N = x_test.shape[0]

    def one(chunk):
        if compute_var:
            return predict_icm(spec, res.params, post, chunk)
        return predict_icm_mean(spec, res.params, post, chunk), None

    if N <= test_chunk:
        mean, var = one(x_test)
        return mean, var, res
    means, vars_ = [], []
    for s in range(0, N, test_chunk):
        chunk = x_test[s : s + test_chunk]
        pad = test_chunk - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad, x_test.shape[1]), x_test.dtype)]
            )
        m, v = one(chunk)
        if pad:
            m = m[:-pad]
            v = v[:-pad] if v is not None else None
        means.append(m)
        vars_.append(v)
    var = jnp.concatenate(vars_) if compute_var else None
    return jnp.concatenate(means), var, res
