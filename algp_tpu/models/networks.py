"""Learned (deep) feature kernels — the reference's `networks.py` analog.

Capability parity (SURVEY.md §2 C1 "possibly networks.py for feature /
deep kernels"): high-throughput phenotyping features (genotype markers)
often relate to the phenotype through a nonlinear map; a deep kernel
passes the feature columns through a small learned embedding φ before
the stationary covariance,

    k(x, x') = s² · k_spatial(x_sp, x'_sp) · k_feature(φ(x_ft), φ(x'_ft)),

with φ's weights optimized JOINTLY with the kernel hyperparameters by
the same marginal-likelihood objective (deep kernel learning).

TPU-first design: φ is a tiny pure-JAX MLP whose weights live in the
same pytree as `KernelParams`, so the WHOLE joint optimization reuses
`models.gp`'s one-jit machinery unchanged — `lax.scan` over optimizer
steps × `vmap` over restarts, one program.  Embedding happens once per
input batch (an (n, df)→(n, dz) matmul chain, microseconds), after which
every existing code path — the Pallas Gram over the 10k grid, the greedy
MI loop, the episode — consumes the embedded inputs untouched: the deep
kernel is a *preprocessing contract* ([spatial | φ(features)]), not a
parallel implementation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from algp_tpu.config import FitConfig, MLPSpec
from algp_tpu.models import gp as gp_mod
from algp_tpu.ops.kernels import KernelParams, KernelSpec


def init_mlp(spec: MLPSpec, df: int, key: jax.Array) -> list:
    """Glorot-initialised weight pytree: [(W0, b0), (W1, b1), ...]."""
    dims = spec.dims(df)
    layers = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / (a + b))
        layers.append(
            (scale * jax.random.normal(sub, (a, b), jnp.float32),
             jnp.zeros((b,), jnp.float32))
        )
    return layers


_ACTIVATIONS = {"tanh": jnp.tanh, "relu": jax.nn.relu}


def embed_features(spec: MLPSpec, mlp, feats: jax.Array) -> jax.Array:
    """φ(features): (n, df) → (n, dz)."""
    try:
        act = _ACTIVATIONS[spec.activation]
    except KeyError:
        raise ValueError(
            f"unknown MLPSpec.activation {spec.activation!r}; "
            f"use one of {sorted(_ACTIVATIONS)}"
        ) from None
    z = feats
    for i, (W, b) in enumerate(mlp):
        z = jnp.dot(z, W, precision=lax.Precision.HIGHEST) + b
        if i + 1 < len(mlp):
            z = act(z)
    return z


def embed_inputs(spec: MLPSpec, mlp, x: jax.Array, ds: int) -> jax.Array:
    """[spatial | φ(features)] — the contract every downstream consumer
    (Pallas Gram, greedy loops, episode) sees."""
    return jnp.concatenate(
        [x[:, :ds], embed_features(spec, mlp, x[:, ds:])], axis=1
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeepFitResult:
    params: KernelParams  # kernel hypers at the embedded-feature spec
    mlp: list  # φ weights
    nll: jax.Array
    nll_trace: jax.Array


def deep_spec(kspec: KernelSpec, mspec: MLPSpec) -> KernelSpec:
    """The kernel spec downstream consumers use: df = embedding width."""
    return KernelSpec(
        spatial_kind=kspec.spatial_kind,
        feature_kind=kspec.feature_kind,
        ds=kspec.ds,
        df=mspec.out,
    )


@partial(jax.jit, static_argnames=("kspec", "mspec", "cfg",
                                   "has_noise_scale", "has_num_valid"))
def _deep_fit_jit(kspec, mspec, cfg, x, y, kinits, mlp0,
                  noise_scale=None, num_valid=None,
                  has_noise_scale=False, has_num_valid=False):
    espec = deep_spec(kspec, mspec)
    ns = noise_scale if has_noise_scale else None
    nvalid = num_valid if has_num_valid else None

    def loss(kp, mlp):
        if not cfg.learn_noise:
            kp = dataclasses.replace(
                kp, log_noise=lax.stop_gradient(kp.log_noise)
            )
        z = embed_inputs(mspec, mlp, x, kspec.ds)
        nll = gp_mod.neg_mll(
            espec, kp, z, y, ns, min_noise=cfg.min_noise,
            jitter=cfg.jitter, num_valid=nvalid,
        )
        if mspec.weight_decay:
            # L2 prior on the embedding weights: without it the MLP can
            # game the marginal likelihood (warp training points to
            # convenient locations) without generalizing — the standard
            # DKL regularisation.  Biases stay free.
            wd = sum(jnp.sum(W * W) for W, _ in mlp)
            nll = nll + 0.5 * mspec.weight_decay * wd
        return nll

    # the shared one-restart optimizer loop (gp._opt_loop works over any
    # parameter pytree): same scan/best-ever/non-finite-guard semantics,
    # and FitConfig.optimizer is honored — the hand-rolled Adam loop this
    # replaces silently ignored optimizer="lbfgs"
    def one_restart(kp0):
        return gp_mod._opt_loop(cfg, lambda t: loss(*t), (kp0, mlp0))

    best, best_nll, trace = jax.vmap(one_restart)(kinits)
    k = jnp.argmin(best_nll)
    kp, mlp = jax.tree_util.tree_map(lambda a: a[k], best)
    return DeepFitResult(params=kp, mlp=mlp, nll=best_nll[k],
                         nll_trace=trace)


def fit_deep(
    kspec: KernelSpec,
    mspec: MLPSpec,
    cfg: FitConfig,
    x: jax.Array,
    y: jax.Array,
    noise_scale: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    num_valid: Optional[jax.Array] = None,
) -> DeepFitResult:
    """Joint deep-kernel fit: MLP weights + kernel hypers by Adam on the
    negative MLL, multi-restart over the KERNEL inits (the MLP init is
    shared — restarts explore the hyperparameter basin, which is where
    the multimodality lives).  `kspec.df` is the RAW feature width; the
    returned params live at `deep_spec(kspec, mspec)` (df = embedding
    width) and downstream consumers pass `embed_inputs(...)`-transformed
    inputs to the standard gp/acquisition machinery.

    `noise_scale`/`num_valid` mirror `models.gp.fit` (heteroscedastic
    per-sample variance multipliers; identity-padded static buffers for
    the episode loop).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    kmlp, kinit = jax.random.split(key)
    mlp0 = init_mlp(mspec, kspec.df, kmlp)
    espec = deep_spec(kspec, mspec)
    kinits = gp_mod.make_restart_inits(espec, cfg, kinit)
    return _deep_fit_jit(
        kspec, mspec, cfg, x, y, kinits, mlp0, noise_scale, num_valid,
        noise_scale is not None, num_valid is not None,
    )
