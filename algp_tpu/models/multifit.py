"""Multi-trait model-family dispatch (FitConfig.multi_fit).

One entry point shared by the episode Agent's end-of-episode evaluation
and the greedy CLI driver: given the sampled plots' (n, T) trait matrix —
with NaN marking cells a visit did NOT measure (FieldConfig.
trait_obs_frac) — produce per-trait posterior mean fields over the full
candidate matrix under the configured family:

  "independent"  batched per-trait exact GPs (models.gp.fit_multi — the
                 reference's one-trait-per-run family).  Fully-observed
                 buffers keep the ONE-program batched path bit-identical;
                 under-observed buffers fall back to a per-trait
                 shape-ragged fit on each trait's own observed plots
                 (host loop, end-of-episode only).
  "icm"          coregionalized joint GP (models.coregional), fitted on
                 genuinely observed (plot, trait) cells only — per-visit
                 NaN mask ∧ the env's ground-truth observation mask
                 (table imputed cells are masked out, not conditioned on).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from algp_tpu.config import FitConfig
from algp_tpu.models import gp as gp_mod
from algp_tpu.ops.kernels import KernelSpec


def multitrait_mean_fields(
    spec: KernelSpec,
    fitcfg: FitConfig,
    X_all: jax.Array,
    idx: np.ndarray,
    Y_raw: np.ndarray,
    noise_scale: Optional[np.ndarray],
    observed_traits: np.ndarray,
    key: jax.Array,
    mesh=None,
) -> np.ndarray:
    """Per-trait posterior mean fields, (N, T) host array.

    X_all          : (N, d) effective candidate matrix (device)
    idx            : (n,) sampled grid indices
    Y_raw          : (n, T) measured traits; NaN = not measured that visit
    noise_scale    : (n,) heteroscedastic variance multipliers or None
    observed_traits: (N, T) ground-truth observation mask (env)
    mesh           : optional device mesh — the ICM family shards its
                     restart batch over the mesh's 'restarts' axis (the
                     mesh episode's end-of-episode evaluation); the
                     independent families run replicated (fit_multi is
                     already one batched program; the ragged fallback is
                     a host loop).
    """
    obs_visit = ~np.isnan(Y_raw)
    Y_np = np.nan_to_num(Y_raw, nan=0.0)
    x = X_all[jnp.asarray(idx)]
    Y = jnp.asarray(Y_np, jnp.float32)
    ns = (
        jnp.asarray(noise_scale, jnp.float32)
        if noise_scale is not None
        else None
    )
    T = Y_raw.shape[1]

    if fitcfg.multi_fit == "icm":
        from algp_tpu.models import coregional as icm_mod

        obs = jnp.asarray(obs_visit & observed_traits[idx])
        # compute_var=False: only mean fields are consumed here — the
        # variance pass would add T (nT, chunk) trisolves per chunk for
        # nothing (and its transients matter at ≥100k-point grids)
        mean, _, _ = icm_mod.fit_predict_icm(
            spec, fitcfg, x, Y, X_all, obs, noise_scale=ns, key=key,
            rank=fitcfg.icm_rank, compute_var=False, mesh=mesh,
        )
        return np.asarray(mean)
    if fitcfg.multi_fit != "independent":
        from algp_tpu.config import MULTI_FITS

        raise ValueError(
            f"unknown multi_fit {fitcfg.multi_fit!r}; use {MULTI_FITS}"
        )

    if not obs_visit.all():
        means = []
        for t in range(T):
            sub = np.flatnonzero(obs_visit[:, t])
            if len(sub) < 2:
                # a campaign can legitimately end with (almost) no
                # observations of a rarely-measured trait — the
                # independent fit then returns the (near-)prior mean
                # field, which would silently score as a fitted model.
                # Warn loudly; the ICM family handles this case by
                # transferring the correlated dense traits instead.
                import warnings

                warnings.warn(
                    f"trait {t} has only {len(sub)} observed cell(s); "
                    "its independent posterior is (near-)prior — "
                    "consider multi_fit='icm', which transfers "
                    "correlated traits",
                    RuntimeWarning,
                )
            xs = X_all[jnp.asarray(idx[sub])]
            ys = jnp.asarray(Y_np[sub, t], jnp.float32)
            nss = (
                jnp.asarray(noise_scale[sub], jnp.float32)
                if noise_scale is not None
                else None
            )
            res_t = gp_mod.fit(spec, fitcfg, xs, ys, noise_scale=nss,
                               key=key)
            post = gp_mod.posterior(
                spec, res_t.params, xs, ys, noise_scale=nss,
                min_noise=fitcfg.min_noise, jitter=fitcfg.jitter,
            )
            m_t, _ = gp_mod.predict(spec, res_t.params, post, X_all)
            means.append(np.asarray(m_t))
        return np.stack(means, axis=1)

    res = gp_mod.fit_multi(spec, fitcfg, x, Y, noise_scale=ns, key=key)
    means = []
    for t in range(T):
        rt = gp_mod.trait_result(res, t)
        post = gp_mod.posterior(
            spec, rt.params, x, Y[:, t], noise_scale=ns,
            min_noise=fitcfg.min_noise, jitter=fitcfg.jitter,
        )
        m_t, _ = gp_mod.predict(spec, rt.params, post, X_all)
        means.append(np.asarray(m_t))
    return np.stack(means, axis=1)
