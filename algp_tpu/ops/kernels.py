"""L1 covariance kernels: RBF, Matérn(1.5 / 2.5), composite spatial×feature.

Capability parity: the reference (`sumitsk/algp`, SURVEY.md §2 C1) provides
stationary kernels over *spatial* inputs (x, y grid coordinates) and
*feature* inputs (e.g. genotype features), plus a composite product kernel
spatial × feature, all with learnable log-lengthscales / log-outputscale
(BASELINE.json:7-8).

Design (TPU-first):
  * Hyperparameters live in an unconstrained log-space pytree
    (`KernelParams`) so the whole pytree flows through optax optimizers and
    `vmap`-ed multi-restart fitting without projection steps.
  * Kernel *structure* (which forms, input split) is static Python
    (`KernelSpec`), so jit traces exactly one fused program per structure.
  * The plain-JAX Gram construction below is the reference form used by
    autodiff during MLL fitting (n ≤ a few hundred sampled points — XLA
    fuses it into a couple of MXU/VPU passes).  The large-N candidate-grid
    Gram (10k×10k) is built by the tiled Pallas kernel in `ops.gram`,
    which evaluates these same closed forms tile-by-tile straight to HBM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

SQRT3 = 1.7320508075688772
SQRT5 = 2.23606797749979

KERNEL_KINDS = ("rbf", "matern32", "matern52")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KernelParams:
    """Unconstrained (log-space) kernel hyperparameters — a JAX pytree.

    log_ls_spatial : (ds,) ARD log-lengthscales for the spatial dims
    log_ls_feature : (df,) ARD log-lengthscales for the feature dims
                     (zero-length array when the spec has no feature part)
    log_outputscale: () log signal variance of the product kernel
    log_noise      : () log *base* observation-noise std (heteroscedastic
                     per-sample scaling is applied in the GP layer, C5)
    """

    log_ls_spatial: jax.Array
    log_ls_feature: jax.Array
    log_outputscale: jax.Array
    log_noise: jax.Array

    @property
    def noise_var(self) -> jax.Array:
        return jnp.exp(2.0 * self.log_noise)

    @property
    def outputscale(self) -> jax.Array:
        return jnp.exp(self.log_outputscale)


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """Static kernel structure: forms + input-column split.

    Inputs X are (n, ds + df): first `ds` columns are spatial coordinates,
    remaining `df` are per-point features.  The covariance is

        k(x, x') = s² · k_spatial(x_sp, x'_sp) · k_feature(x_ft, x'_ft)

    with the feature factor ≡ 1 when df == 0 (plain spatial GP).
    """

    spatial_kind: str = "rbf"
    feature_kind: str = "rbf"
    ds: int = 2
    df: int = 0

    def __post_init__(self):
        if self.spatial_kind not in KERNEL_KINDS:
            raise ValueError(f"unknown spatial kernel {self.spatial_kind!r}")
        if self.df and self.feature_kind not in KERNEL_KINDS:
            raise ValueError(f"unknown feature kernel {self.feature_kind!r}")

    @property
    def dim(self) -> int:
        return self.ds + self.df

    def init_params(
        self,
        key: Optional[jax.Array] = None,
        ls_spatial: float = 1.0,
        ls_feature: float = 1.0,
        outputscale: float = 1.0,
        noise: float = 0.1,
        perturb: float = 0.0,
    ) -> KernelParams:
        """Initial hyperparameters; `perturb` adds N(0, perturb²) log-space
        noise for multi-restart fitting (BASELINE.json:8)."""
        p = KernelParams(
            log_ls_spatial=jnp.full((self.ds,), jnp.log(ls_spatial), jnp.float32),
            log_ls_feature=jnp.full((self.df,), jnp.log(ls_feature), jnp.float32),
            log_outputscale=jnp.asarray(jnp.log(outputscale), jnp.float32),
            log_noise=jnp.asarray(jnp.log(noise), jnp.float32),
        )
        if perturb and key is not None:
            leaves, treedef = jax.tree_util.tree_flatten(p)
            keys = jax.random.split(key, len(leaves))
            leaves = [
                l + perturb * jax.random.normal(k, jnp.shape(l), jnp.float32)
                for l, k in zip(leaves, keys)
            ]
            p = jax.tree_util.tree_unflatten(treedef, leaves)
        return p


# ---------------------------------------------------------------------------
# Stationary forms (shared by the plain-JAX path and the Pallas tiles)
# ---------------------------------------------------------------------------


def stationary_form(kind: str, r2: jax.Array) -> jax.Array:
    """Unit-variance kernel value from the *scaled squared distance* r².

    r² = Σ_d (x_d − x'_d)² / ℓ_d².  Matérn forms take r = √r²; the sqrt is
    guarded for autodiff at r = 0 (∂√/∂r² diverges) — Matérn 3/2 and 5/2
    are C¹/C² at the origin so the clamped gradient is exact in the limit.
    """
    if kind == "rbf":
        return jnp.exp(-0.5 * r2)
    r = jnp.sqrt(jnp.maximum(r2, 1e-20))
    if kind == "matern32":
        a = SQRT3 * r
        return (1.0 + a) * jnp.exp(-a)
    if kind == "matern52":
        a = SQRT5 * r
        return (1.0 + a + (a * a) / 3.0) * jnp.exp(-a)
    raise ValueError(f"unknown kernel kind {kind!r}")


def scaled_sqdist(
    x1: jax.Array, x2: jax.Array, log_ls: jax.Array
) -> jax.Array:
    """Pairwise ARD-scaled squared distances, (n1, n2).

    Uses the direct broadcast difference (not the |x|²+|y|²−2xy trick):
    input dims here are tiny (2 spatial + a few features), so the O(n1·n2·d)
    VPU cost is negligible and the direct form avoids the catastrophic
    cancellation of the dot-trick in f32 — which matters for the
    bitwise-consistent-selection contract (BASELINE.json:5).
    """
    inv_ls = jnp.exp(-log_ls)
    a = x1 * inv_ls
    b = x2 * inv_ls
    d = a[:, None, :] - b[None, :, :]
    return jnp.sum(d * d, axis=-1)


# ---------------------------------------------------------------------------
# Gram construction (plain JAX reference path; C2)
# ---------------------------------------------------------------------------


def gram(
    spec: KernelSpec, params: KernelParams, x1: jax.Array, x2: jax.Array
) -> jax.Array:
    """Cross-covariance matrix K(X1, X2), (n1, n2), no noise."""
    ks = stationary_form(
        spec.spatial_kind,
        scaled_sqdist(x1[:, : spec.ds], x2[:, : spec.ds], params.log_ls_spatial),
    )
    if spec.df:
        kf = stationary_form(
            spec.feature_kind,
            scaled_sqdist(
                x1[:, spec.ds :], x2[:, spec.ds :], params.log_ls_feature
            ),
        )
        ks = ks * kf
    return jnp.exp(params.log_outputscale) * ks


def gram_diag(spec: KernelSpec, params: KernelParams, x: jax.Array) -> jax.Array:
    """diag K(X, X) — constant for stationary kernels: the outputscale."""
    return jnp.full((x.shape[0],), jnp.exp(params.log_outputscale), x.dtype)


def gram_with_noise(
    spec: KernelSpec,
    params: KernelParams,
    x: jax.Array,
    noise_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """K(X, X) + diag(noise).  `noise_scale` (n,) multiplies the base noise
    *variance* per sample — the heteroscedastic modality weights of
    BASELINE.json:11 (precise sensor → small scale, cheap sensor → large)."""
    K = gram(spec, params, x, x)
    nv = params.noise_var
    if noise_scale is not None:
        nv = nv * noise_scale
    n = x.shape[0]
    return K + jnp.eye(n, dtype=K.dtype) * nv
