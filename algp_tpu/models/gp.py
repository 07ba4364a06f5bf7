"""L1b — Exact Gaussian-process regression, fitted by marginal likelihood.

Capability parity (SURVEY.md §2 C3-C5, §3.2-3.3; BASELINE.json:7-8): the
reference's `GPR` fits kernel hyperparameters by Adam on the negative log
marginal likelihood with multi-restart, supports heteroscedastic per-sample
noise, and predicts posterior mean/variance over the full field grid.

TPU-first design decisions:
  * The whole fit is ONE jitted program: `lax.scan` over optimizer steps
    (Adam via optax, or L-BFGS with zoom linesearch via optax.lbfgs),
    `vmap` over restarts — R restarts cost one batched O(R n³) Cholesky
    per step instead of R sequential loops (SURVEY.md §3.2 "vmap
    restarts, scan the iterations").  n is the *sampled* set (hundreds),
    so each step's Cholesky is microseconds on the MXU.
  * Hyperparameters stay in unconstrained log space (ops.kernels); the
    noise floor is enforced smoothly inside the likelihood
    (`effective_noise_var`) so both optimizers see a C¹ objective.
  * Prediction over the 10k-point grid: the n×N cross-Gram comes from the
    tiled Pallas kernel when N is large, and the n×N triangular solve is
    panel-blocked (ops.linalg) to bound HBM temporaries — the full-RHS
    solve OOMs a v5e at N=10k (SURVEY.md §7.6).
  * The best restart is selected by final NLL with lowest-index
    tie-breaking, matching the f64 oracle's convention so golden tests
    can compare selected hyperparameters deterministically.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from algp_tpu.config import FitConfig
from algp_tpu.ops import linalg as la
from algp_tpu.ops.gram import gram_pallas
from algp_tpu.ops.kernels import (
    KernelParams,
    KernelSpec,
    gram,
    gram_diag,
)

_LOG2PI = 1.8378770664093453


def effective_noise_var(
    params: KernelParams, min_noise: float, noise_scale: Optional[jax.Array]
) -> jax.Array:
    """Per-sample noise variance with a hard floor for f32 conditioning.

    noise_scale multiplies the *variance* per sample — the heteroscedastic
    modality weights of BASELINE.json:11 (cheap/noisy sensor ⇒ scale > 1).
    """
    nv = jnp.maximum(params.noise_var, min_noise * min_noise)
    if noise_scale is not None:
        nv = nv * noise_scale
    return nv


def _masked_gram_with_noise(spec, params, x, nv, jitter, num_valid):
    """K + diag(noise) with identity padding beyond `num_valid`.

    Padded rows/cols are exactly e_i: together with y=0 padding they
    contribute 0 to the quadratic form AND 0 to the log-det, so the padded
    NLL equals the unpadded one exactly.  This is what lets the episode
    loop keep ONE static training-buffer shape while the sampled set grows
    (SURVEY.md §7.5 hard part 4 — no per-step recompilation)."""
    n = x.shape[0]
    K = gram(spec, params, x, x) + jnp.eye(n, dtype=jnp.float32) * (nv + jitter)
    if num_valid is None:
        return K
    mask = jnp.arange(n) < num_valid
    pair = mask[:, None] & mask[None, :]
    return jnp.where(pair, K, jnp.eye(n, dtype=jnp.float32))


def neg_mll(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    *,
    min_noise: float = 1e-3,
    jitter: float = 1e-6,
    num_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Negative log marginal likelihood  ½yᵀK⁻¹y + ½log|K| + (n/2)log 2π.

    K = K_kernel(X, X) + diag(noise).  Differentiable in all params; the
    Cholesky path gives both the quadratic form and the log-det in one
    factorization (SURVEY.md §3.2).  With `num_valid`, entries ≥ num_valid
    are identity-padded and contribute exactly zero (y must be 0 there).
    """
    n = x.shape[0]
    nv = effective_noise_var(params, min_noise, noise_scale)
    if num_valid is not None:
        y = y * (jnp.arange(n) < num_valid)
        count = num_valid
    else:
        count = n
    K = _masked_gram_with_noise(spec, params, x, nv, jitter, num_valid)
    L = jnp.linalg.cholesky(K)
    alpha = la.cho_solve(L, y)
    return (
        0.5 * jnp.dot(y, alpha)
        + jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * count * _LOG2PI
    )


# ---------------------------------------------------------------------------
# Fitting (C4): Adam / L-BFGS on -MLL, multi-restart via vmap
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FitResult:
    params: KernelParams  # best restart's best params
    nll: jax.Array  # its final NLL
    all_nlls: jax.Array  # (restarts,) final NLL per restart
    nll_trace: jax.Array  # (restarts, iters) NLL per step
    best_restart: jax.Array  # index of the winning restart


def _fit_single(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array],
    params0: KernelParams,
    num_valid: Optional[jax.Array] = None,
):
    """One restart: scan `cfg.iters` optimizer steps, track the best-ever."""

    def loss(p):
        if not cfg.learn_noise:
            p = dataclasses.replace(p, log_noise=lax.stop_gradient(p.log_noise))
        return neg_mll(
            spec, p, x, y, noise_scale, min_noise=cfg.min_noise,
            jitter=cfg.jitter, num_valid=num_valid,
        )

    return _opt_loop(cfg, loss, params0)


def _opt_loop(cfg: FitConfig, loss, params0: KernelParams):
    """The shared one-restart optimizer loop (scan over `cfg.iters` steps,
    best-ever tracking, non-finite guard) — `loss` is any differentiable
    objective over KernelParams (exact -MLL, sparse -ELBO, …)."""
    if cfg.optimizer == "adam":
        opt = optax.adam(cfg.learning_rate)

        def value_grad_update(p, opt_state):
            nll, g = jax.value_and_grad(loss)(p)
            updates, opt_state = opt.update(g, opt_state, p)
            return nll, updates, opt_state

    elif cfg.optimizer == "lbfgs":
        opt = optax.lbfgs()
        vg = optax.value_and_grad_from_state(loss)

        def value_grad_update(p, opt_state):
            nll, g = vg(p, state=opt_state)
            updates, opt_state = opt.update(
                g, opt_state, p, value=nll, grad=g, value_fn=loss
            )
            return nll, updates, opt_state

    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    def step(carry, _):
        p, opt_state, best_nll, best_p = carry
        nll, updates, opt_state = value_grad_update(p, opt_state)
        p_new = optax.apply_updates(p, updates)
        better = nll < best_nll
        best_nll = jnp.where(better, nll, best_nll)
        best_p = jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), p, best_p
        )
        return (p_new, opt_state, best_nll, best_p), nll

    init = (params0, opt.init(params0), jnp.inf, params0)
    (p_fin, _, best_nll, best_p), trace = lax.scan(
        step, init, None, length=cfg.iters
    )

    # the final iterate may beat the best tracked pre-update value
    nll_fin = loss(p_fin)
    better = nll_fin < best_nll
    best_nll = jnp.where(better, nll_fin, best_nll)
    best_p = jax.tree_util.tree_map(
        lambda a, b: jnp.where(better, a, b), p_fin, best_p
    )
    # non-finite guard: a diverged restart must never win the argmin
    best_nll = jnp.where(jnp.isfinite(best_nll), best_nll, jnp.inf)
    return best_p, best_nll, trace


@partial(jax.jit, static_argnames=("spec", "cfg", "has_noise_scale", "has_num_valid"))
def _fit_jit(spec, cfg, x, y, noise_scale, inits, has_noise_scale,
             num_valid=None, has_num_valid=False):
    ns = noise_scale if has_noise_scale else None
    nvalid = num_valid if has_num_valid else None
    run = lambda p0: _fit_single(spec, cfg, x, y, ns, p0, nvalid)
    best_p, best_nll, trace = jax.vmap(run)(inits)
    k = jnp.argmin(best_nll)  # lowest index wins ties (oracle contract)
    params = jax.tree_util.tree_map(lambda a: a[k], best_p)
    return FitResult(
        params=params,
        nll=best_nll[k],
        all_nlls=best_nll,
        nll_trace=trace,
        best_restart=k,
    )


def make_restart_inits(
    spec: KernelSpec, cfg: FitConfig, key: Optional[jax.Array] = None
) -> KernelParams:
    """Stacked multi-restart initial hyperparameters (restart axis leading).

    Restart 0 is always the unperturbed config init; the rest perturb in
    log space.  Single source of truth: sharded fitting relies on
    bit-identical inits to match single-device results."""
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, cfg.restarts)
    base = dict(
        ls_spatial=cfg.init_ls_spatial,
        ls_feature=cfg.init_ls_feature,
        outputscale=cfg.init_outputscale,
        noise=cfg.init_noise,
    )
    inits = [spec.init_params(**base)] + [
        spec.init_params(key=k, perturb=cfg.perturb, **base)
        for k in keys[1:]
    ]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *inits)


def fit(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    num_valid: Optional[jax.Array] = None,
) -> FitResult:
    """Multi-restart MLL fit (BASELINE.json:8).  One jitted program:
    vmap over `cfg.restarts` perturbed inits × scan over `cfg.iters` steps.

    `num_valid` enables identity-padded training buffers: x/y/noise_scale
    may be padded to a static size with only the first num_valid entries
    real (y must be 0 in the padding)."""
    inits = make_restart_inits(spec, cfg, key)
    return _fit_jit(
        spec, cfg, x, y, noise_scale, inits, noise_scale is not None,
        num_valid, num_valid is not None,
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "has_noise_scale",
                                   "has_num_valid"))
def _fit_step_jit(spec, cfg, x, y, noise_scale, base_key, step,
                  has_noise_scale, num_valid=None, has_num_valid=False):
    key = jax.random.fold_in(base_key, step)
    inits = make_restart_inits(spec, cfg, key)
    return _fit_jit(
        spec, cfg, x, y, noise_scale, inits, has_noise_scale,
        num_valid, has_num_valid,
    )


def fit_step(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array],
    base_key: jax.Array,
    step,
    num_valid: Optional[jax.Array] = None,
) -> FitResult:
    """Episode-refit variant of `fit`: the per-step key derivation
    (fold_in(base_key, step)) AND the restart inits are computed INSIDE
    the jitted program.  Identical results to `fit` with an eagerly
    folded key (threefry is bit-exact under jit), but the refit costs
    one async dispatch instead of ~a dozen small eager device ops
    (measured ~30-40 ms of enqueue overhead per refit on this
    environment's TPU relay)."""
    return _fit_step_jit(
        spec, cfg, x, y, noise_scale, base_key,
        jnp.asarray(step, jnp.uint32), noise_scale is not None,
        num_valid, num_valid is not None,
    )


def refit_cfg(cfg: FitConfig) -> FitConfig:
    """The FitConfig a warm REFIT runs under: `refit_iters`/`refit_restarts`
    override `iters`/`restarts` when set (0 keeps the full-fit value).
    Identity when warm refits are disabled — single source of the
    override rule for the exact and sparse warm paths."""
    if not (cfg.refit_iters or cfg.refit_restarts):
        return cfg
    return dataclasses.replace(
        cfg,
        iters=cfg.refit_iters or cfg.iters,
        restarts=cfg.refit_restarts or cfg.restarts,
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "has_noise_scale",
                                   "has_num_valid"))
def _fit_step_warm_jit(spec, cfg, x, y, noise_scale, base_key, step,
                       incumbent, has_noise_scale, num_valid=None,
                       has_num_valid=False):
    key = jax.random.fold_in(base_key, step)
    inits = make_restart_inits(spec, cfg, key)
    # restart 0: the incumbent replaces the unperturbed config init —
    # best-ever NLL tracking evaluates it before the first update, so
    # the refit result is never worse than the params it started from
    inits = jax.tree_util.tree_map(
        lambda stacked, inc: stacked.at[0].set(inc), inits, incumbent
    )
    return _fit_jit(
        spec, cfg, x, y, noise_scale, inits, has_noise_scale,
        num_valid, has_num_valid,
    )


def fit_step_warm(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array],
    base_key: jax.Array,
    step,
    incumbent: KernelParams,
    num_valid: Optional[jax.Array] = None,
) -> FitResult:
    """`fit_step` with a WARM restart 0: the incumbent params seed the
    first restart and `refit_cfg` shrinks iters/restarts (the refit
    program is latency-bound — `cfg.iters` SEQUENTIAL small-op steps —
    and its device time drains into the next fused episode step's sync).
    Deterministic for resume exactly like `fit_step`: the key is
    fold_in(base_key, step) and the incumbent is part of episode state."""
    return _fit_step_warm_jit(
        spec, refit_cfg(cfg), x, y, noise_scale, base_key,
        jnp.asarray(step, jnp.uint32), incumbent, noise_scale is not None,
        num_valid, num_valid is not None,
    )


@partial(jax.jit, static_argnames=("spec", "cfg", "has_noise_scale"))
def _fit_multi_jit(spec, cfg, x, Y, noise_scale, inits, has_noise_scale):
    ns = noise_scale if has_noise_scale else None

    def one_trait(y):
        run = lambda p0: _fit_single(spec, cfg, x, y, ns, p0)
        best_p, best_nll, trace = jax.vmap(run)(inits)
        k = jnp.argmin(best_nll)
        params = jax.tree_util.tree_map(lambda a: a[k], best_p)
        return FitResult(params=params, nll=best_nll[k], all_nlls=best_nll,
                         nll_trace=trace, best_restart=k)

    return jax.vmap(one_trait, in_axes=1)(Y)


def fit_multi(
    spec: KernelSpec,
    cfg: FitConfig,
    x: jax.Array,
    Y: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> FitResult:
    """Fit independent GPs for T traits sharing the same plots, batched.

    Phenotyping measures several traits per plot (height, width, counts…);
    the reference fits one trait per run.  Here Y is (n, T) and the whole
    traits × restarts × iters space runs as ONE jitted program (nested
    vmap: T·R Cholesky factorizations batched per optimizer step), so
    fitting 10 traits costs barely more wall-clock than one.

    Returns a FitResult whose leaves carry a leading trait axis; use
    `trait_result(res, t)` to extract one trait's result.
    """
    inits = make_restart_inits(spec, cfg, key)
    return _fit_multi_jit(
        spec, cfg, x, Y, noise_scale, inits, noise_scale is not None
    )


def trait_result(res: FitResult, t: int) -> FitResult:
    """Extract trait t's FitResult from a `fit_multi` batch."""
    return jax.tree_util.tree_map(lambda a: a[t], res)


# ---------------------------------------------------------------------------
# Posterior (C3): predictive mean / variance over the grid
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Posterior:
    """Cached GP posterior: factor + weights over the training set.

    L     : (n, n) lower Cholesky of K(X,X) + diag(noise), identity-padded
    alpha : (n,)   K⁻¹ y  (0 in the padding)
    x     : (n, d) training inputs
    mask  : (n,)   1.0 for real training points, 0.0 for padding
    """

    L: jax.Array
    alpha: jax.Array
    x: jax.Array
    mask: jax.Array


@partial(jax.jit, static_argnames=("spec", "min_noise", "jitter",
                                   "has_noise_scale", "has_num_valid"))
def _posterior_jit(spec, params, x, y, noise_scale, min_noise, jitter,
                   has_noise_scale, num_valid=None, has_num_valid=False):
    ns = noise_scale if has_noise_scale else None
    nvalid = num_valid if has_num_valid else None
    n = x.shape[0]
    nv = effective_noise_var(params, min_noise, ns)
    K = _masked_gram_with_noise(spec, params, x, nv, jitter, nvalid)
    if nvalid is not None:
        mask = (jnp.arange(n) < nvalid).astype(jnp.float32)
        y = y * mask
    else:
        mask = jnp.ones((n,), jnp.float32)
    L = jnp.linalg.cholesky(K)
    alpha = la.cho_solve(L, y)
    return Posterior(L=L, alpha=alpha, x=x, mask=mask)


def posterior(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    *,
    min_noise: float = 1e-3,
    jitter: float = 1e-6,
    num_valid: Optional[jax.Array] = None,
) -> Posterior:
    return _posterior_jit(
        spec, params, x, y, noise_scale, min_noise, jitter,
        noise_scale is not None, num_valid, num_valid is not None,
    )


@partial(jax.jit, static_argnames=("spec", "use_pallas", "block"))
def predict(
    spec: KernelSpec,
    params: KernelParams,
    post: Posterior,
    x_test: jax.Array,
    *,
    use_pallas: bool = False,
    block: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Posterior mean and variance at `x_test` (SURVEY.md §3.3).

    μ* = K*ᵀ α,  σ²* = k** − colsum(V²),  V = L⁻¹K*.  The trisolve is
    panel-blocked over test columns; K* comes from the Pallas Gram when
    `use_pallas` (large grids).
    """
    if use_pallas:
        Ks = gram_pallas(spec, params, post.x, x_test)
    else:
        Ks = gram(spec, params, post.x, x_test)
    Ks = Ks * post.mask[:, None]  # zero rows for identity-padded slots
    mean = Ks.T @ post.alpha
    V = la.blocked_solve_triangular(post.L, Ks, block=block)
    var = gram_diag(spec, params, x_test) - jnp.sum(V * V, axis=0)
    return mean, jnp.maximum(var, 0.0)


@partial(jax.jit, static_argnames=("spec", "jitter"))
def posterior_extend(
    spec: KernelSpec,
    params: KernelParams,
    post: Posterior,
    x_pad: jax.Array,
    y_pad: jax.Array,
    new_nv: jax.Array,
    m0: jax.Array,
    k_count: jax.Array,
    *,
    jitter: float = 1e-6,
) -> Posterior:
    """Grow a cached posterior by the step's new samples WITHOUT
    refactorizing (SURVEY.md §2 C8 "instead of refactorizing").

    Between hyperparameter refits the factor is valid — only rows for the
    newly collected samples are missing.  Each new row is appended with
    `ops.linalg.chol_append_row` (O(n_max²) per row, one trisolve), then
    α is re-solved against the updated factor.  O(k·n²) total vs the
    O(n³) full refactorization `posterior()` performs.

    x_pad/y_pad : the FULL padded training buffers (new samples already
                  written at slots [m0, m0+k_count))
    new_nv      : (k_max,) effective noise VARIANCE of each new sample
                  (entries ≥ k_count ignored)
    m0          : samples already in `post` (traced)
    k_count     : how many of the k_max new slots are real (traced)
    """
    n_max = x_pad.shape[0]
    k_max = new_nv.shape[0]
    idx = jnp.arange(n_max)

    def body(L, t):
        m = m0 + t
        active = t < k_count
        xs = lax.dynamic_slice_in_dim(x_pad, m, 1, axis=0)
        k_vec = gram(spec, params, x_pad, xs)[:, 0]
        k_vec = jnp.where(idx < m, k_vec, 0.0)
        k_ss = gram_diag(spec, params, xs)[0] + new_nv[t] + jitter
        L2 = la.chol_append_row(L, m, k_vec, k_ss)
        return jnp.where(active, L2, L), None

    L, _ = lax.scan(body, post.L, jnp.arange(k_max))
    mask = (idx < m0 + k_count).astype(jnp.float32)
    alpha = la.cho_solve(L, y_pad * mask)
    return Posterior(L=L, alpha=alpha, x=x_pad, mask=mask)


@partial(jax.jit, static_argnames=("spec", "min_noise", "jitter",
                                   "use_pallas", "block", "has_noise_scale",
                                   "has_num_valid"))
def posterior_and_predict(
    spec, params, x, y, noise_scale, x_test, *, min_noise=1e-3, jitter=1e-6,
    use_pallas=False, block=512, has_noise_scale=False, num_valid=None,
    has_num_valid=False,
):
    """posterior() + predict() as ONE device program.

    The episode calls them back to back every step.  Measured: fusing is
    TIME-NEUTRAL on this environment — back-to-back async dispatches
    already pipeline; only host-SYNCHRONIZING reads pay the ~27 ms relay
    floor (which is why plan_path_step's fusion, which removed host
    reads between stages, did win).  Kept for the one-program structure
    and the single cached-Posterior + mean/var return."""
    post = _posterior_jit(
        spec, params, x, y, noise_scale, min_noise, jitter,
        has_noise_scale, num_valid, has_num_valid,
    )
    mean, var = predict(spec, params, post, x_test,
                        use_pallas=use_pallas, block=block)
    return post, mean, var


@partial(jax.jit, static_argnames=("spec", "jitter", "use_pallas", "block"))
def extend_and_predict(
    spec, params, post, x_pad, y_pad, new_nv, m0, k_count, x_test, *,
    jitter=1e-6, use_pallas=False, block=512,
):
    """posterior_extend() + predict() as ONE device program (the
    between-refit episode step — see posterior_and_predict)."""
    post = posterior_extend(
        spec, params, post, x_pad, y_pad, new_nv, m0, k_count,
        jitter=jitter,
    )
    mean, var = predict(spec, params, post, x_test,
                        use_pallas=use_pallas, block=block)
    return post, mean, var


# ---------------------------------------------------------------------------
# Convenience façade mirroring the reference's GPR.fit / .predict surface
# ---------------------------------------------------------------------------


class ExactGP:
    """Stateful façade over the functional core (reference-API parity:
    `GPR.fit(x, y)` / `GPR.predict(x*)`, SURVEY.md §2 C3).  All heavy work
    happens in the jitted functional layer; this object only caches state.
    """

    def __init__(self, spec: KernelSpec, fit_config: Optional[FitConfig] = None):
        self.spec = spec
        self.fit_config = fit_config or FitConfig()
        self.params: Optional[KernelParams] = None
        self.post: Optional[Posterior] = None
        self._train: Optional[tuple] = None

    def fit(self, x, y, noise_scale=None, key=None) -> FitResult:
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        res = fit(self.spec, self.fit_config, x, y, noise_scale, key)
        self.params = res.params
        self._train = (x, y, noise_scale)
        self.post = posterior(
            self.spec, res.params, x, y, noise_scale,
            min_noise=self.fit_config.min_noise, jitter=self.fit_config.jitter,
        )
        return res

    def set_params(self, params: KernelParams, x, y, noise_scale=None):
        """Condition on data with given (already-fitted) hyperparameters."""
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        self.params = params
        self._train = (x, y, noise_scale)
        self.post = posterior(
            self.spec, params, x, y, noise_scale,
            min_noise=self.fit_config.min_noise, jitter=self.fit_config.jitter,
        )

    def predict(self, x_test, *, use_pallas: bool = False):
        if self.post is None:
            raise RuntimeError("fit() or set_params() first")
        return predict(
            self.spec, self.params, self.post,
            jnp.asarray(x_test, jnp.float32), use_pallas=use_pallas,
        )
