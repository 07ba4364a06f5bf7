"""Field environment — row-structured agricultural grid with noisy sensing.

Capability parity (SURVEY.md §2 C10; BASELINE.json:7,11): the reference's
`FieldEnv` loads a sorghum phenotype table (plant height per (row, range)
plus genotype features) or synthesizes a field, maps grid indices ↔ map
poses, simulates noisy sample collection with two sensing modalities
(cheap/noisy vs precise/expensive), and provides a train/test split for
RMSE evaluation.

TPU-first notes: the ground-truth synthetic field is *sampled on device*
(Pallas Gram + Cholesky of the full grid covariance — a 1k-10k factor is
milliseconds on a v5e, SURVEY.md §7.6); everything else here is cheap host
orchestration by design (BASELINE.json:5 keeps the simulator host-side).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from algp_tpu.config import FieldConfig
from algp_tpu.ops import linalg as la
from algp_tpu.ops.gram import gram_pallas
from algp_tpu.ops.kernels import KernelSpec

MODALITIES = ("precise", "cheap")

# _synthesize_lowrank streams its candidate axis once the (m, n) Kzx
# buffer exceeds this (peak HBM ≈ 2.5 × the buffer; see the method)
_SYNTH_CHUNK_BYTES = 5 * 2**30
_SYNTH_CHUNK = 1 << 20

#: seconds between transient-OOM retries (see _retry_transient_oom)
_OOM_RETRY_SLEEP_S = 10.0


def _retry_transient_oom(fn, attempts: int = 3, what: str = "device work"):
    """Run `fn()` retrying on RESOURCE_EXHAUSTED — the SHARED TPU pool
    throws it transiently when another tenant's residency collides with
    a big-peak program (a c5_1m synthesis that fit at 04:12 failed at
    05:10 and fit again minutes later with 14 GB allocatable).  Only
    meaningful when `fn` is a pure recomputation; anything else must
    re-raise immediately — which non-OOM errors do."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax runtime errors share no base class
            if "RESOURCE_EXHAUSTED" not in str(e) or attempt == attempts - 1:
                raise
            import time as _time
            import warnings

            warnings.warn(
                f"{what} hit a transient device OOM (attempt "
                f"{attempt + 1}/{attempts}) — retrying in "
                f"{_OOM_RETRY_SLEEP_S:.0f} s (shared-pool residency "
                f"pressure)",
                RuntimeWarning,
            )
            _time.sleep(_OOM_RETRY_SLEEP_S)


@dataclasses.dataclass
class Sample:
    """A batch of collected measurements."""

    indices: np.ndarray  # (k,) grid indices
    y: np.ndarray  # (k,) noisy measurements
    noise_scale: np.ndarray  # (k,) variance multipliers vs base noise


class FieldEnv:
    """Row-structured field grid with synthetic or table-backed ground truth.

    Geometry: `num_rows` crop rows (y axis), each with `num_cols` ranges
    (x axis).  Grid index i ↔ (row, col) = divmod(i, num_cols); map pose of
    a point is (col·col_spacing, row·row_spacing).  The robot travels along
    rows and switches rows at the two headlands (planning.py builds the
    graph over this geometry).
    """

    def __init__(self, cfg: FieldConfig, spec: Optional[KernelSpec] = None):
        # validate pure-config ranges BEFORE any synthesis — a bad value
        # must not fail only after the (potentially ~13 GB / minutes-of-
        # remote-compile) field draw, or silently no-op past a gate
        if not 0.0 <= cfg.trait_corr < 1.0:
            raise ValueError(
                f"trait_corr must be in [0, 1) (got {cfg.trait_corr})"
            )
        if not 0.0 < cfg.trait_obs_frac <= 1.0:
            raise ValueError(
                f"trait_obs_frac must be in (0, 1] (got "
                f"{cfg.trait_obs_frac})"
            )
        self.cfg = cfg
        self.num_rows = cfg.num_rows
        self.num_cols = cfg.num_cols
        self.n = cfg.num_rows * cfg.num_cols
        self._rng = np.random.default_rng(cfg.seed)

        rows, cols = np.divmod(np.arange(self.n), cfg.num_cols)
        xy = np.stack(
            [cols * cfg.col_spacing, rows * cfg.row_spacing], axis=1
        ).astype(np.float32)

        #: device-resident f32 truth (set by _synthesize; None for table
        #: envs, whose small fields upload in one cheap transfer)
        self.f_dev = None
        if cfg.data_path is not None:
            feats, f = self._load_table(cfg.data_path)
        else:
            feats, f = self._synthesize(xy, spec)

        self.features = feats  # (n, num_features) or (n, 0)
        self.X = jnp.asarray(
            np.concatenate([xy, feats], axis=1) if feats.shape[1] else xy,
            jnp.float32,
        )
        self.f = f  # (n,) latent ground truth, f64 host array
        # cells with actual ground truth: all of them for synthetic fields;
        # for tables, only the cells present in the file (missing cells are
        # mean-imputed for GP conditioning but are NOT truth — counting
        # them in an RMSE would overstate accuracy)
        if not hasattr(self, "observed_mask"):
            self.observed_mask = np.ones(self.n, bool)
        if not hasattr(self, "observed_traits"):
            self.observed_traits = np.ones((self.n, self.traits.shape[1]), bool)
        # held-out split for RMSE eval (drawn from observed cells only)
        observed = np.flatnonzero(self.observed_mask)
        test = self._rng.permutation(observed)[: max(1, len(observed) // 5)]
        self.test_mask = np.zeros(self.n, bool)
        self.test_mask[test] = True

    # ------------------------------------------------------------------ init

    def _synthesize(self, xy: np.ndarray, spec: Optional[KernelSpec]):
        """Draw the latent field from a GP with the config's true kernel —
        sampled on device via the Pallas Gram + Cholesky path."""
        cfg = self.cfg
        df = cfg.num_features
        feats = (
            self._rng.standard_normal((self.n, df)).astype(np.float32)
            if df
            else np.zeros((self.n, 0), np.float32)
        )
        # feature_warp: the TRUTH kernel sees ψ(feats) while the env
        # exposes raw feats — a stationary feature kernel on the raw
        # features is then mis-specified (FieldConfig.feature_warp)
        truth_feats = feats
        if df and cfg.feature_warp != "none":
            if cfg.feature_warp not in ("tanh", "sin"):
                raise ValueError(
                    f"unknown feature_warp {cfg.feature_warp!r}; "
                    "use 'none', 'tanh' or 'sin'"
                )
            wrng = np.random.default_rng(cfg.seed + 7919)
            scale = 2.0 / np.sqrt(df)
            # low-dimensional latent factor structure (genotype panels:
            # many markers, few causal factors): the warp PROJECTS df
            # features onto dz = max(1, df//4) nonlinear factors.  An
            # ARD kernel on the raw features can only rescale axes — it
            # cannot rotate into the factor subspace, which is exactly
            # what a learned embedding can (the textbook DKL regime).
            dz = max(1, df // 4)
            W1 = wrng.standard_normal((df, dz)).astype(np.float32) * scale
            b1 = wrng.standard_normal((dz,)).astype(np.float32)
            if cfg.feature_warp == "tanh":
                truth_feats = np.tanh(2.0 * (feats @ W1) + b1)
            else:
                # non-monotone multi-scale variant of the same projection
                truth_feats = np.sin(2.0 * (feats @ W1) + b1)
        if spec is None:
            spec = KernelSpec("rbf", "rbf", ds=2, df=df)
        if truth_feats.shape[1] != df:
            # the warp projects to dz latent factors — the TRUTH kernel
            # samples over (xy, ψ) at feature width dz
            spec = KernelSpec(
                spatial_kind=spec.spatial_kind,
                feature_kind=spec.feature_kind or "rbf",
                ds=spec.ds, df=truth_feats.shape[1],
            )
        params = spec.init_params(
            ls_spatial=cfg.true_ls_spatial,
            ls_feature=cfg.true_ls_feature,
            outputscale=cfg.true_outputscale,
            noise=1.0,  # unused for sampling
        )
        x_all = jnp.asarray(
            np.concatenate([xy, truth_feats], axis=1) if df else xy,
            jnp.float32,
        )
        T = max(1, cfg.num_traits)

        def draw():
            if cfg.synth_inducing and cfg.synth_inducing < self.n:
                return self._synthesize_lowrank(spec, params, x_all, T)
            K = gram_pallas(spec, params, x_all, x_all)
            L, jit_used = la.safe_cholesky(K, initial_jitter=1e-5)
            z = jax.random.normal(jax.random.PRNGKey(cfg.seed), (self.n, T))
            return L @ z  # (n, T) indep.

        # The monolithic synthesis peaks near ~13 GB at the 1M preset
        # (chunking it is NOT bit-identical — XLA's trisolve varies with
        # RHS width — so the ≤1M fields keep the monolithic program and
        # their bits).  Synthesis is a pure function of the config, so
        # recompute-and-retry on a transient pool OOM is exact.
        def draw_and_fetch():
            td = draw()
            if T > 1 and cfg.trait_corr:
                # cross-trait correlation (FieldConfig.trait_corr): mix the
                # T independent draws through the Cholesky factor of the
                # equicorrelation matrix — exactly the ICM generative
                # family (models.coregional) with B = R Rᵀ.  The factor's
                # first row is e₀, so trait 0 (the planning trait) is
                # unchanged by the mixing.  (Range validated at env
                # construction, BEFORE the expensive synthesis.)
                Rho = np.full((T, T), cfg.trait_corr, np.float64)
                np.fill_diagonal(Rho, 1.0)
                Rt = np.linalg.cholesky(Rho).T.astype(np.float32)
                td = td @ jnp.asarray(Rt)
            return td, np.asarray(td, dtype=np.float64)

        traits_dev, traits = _retry_transient_oom(
            draw_and_fetch, what=f"field synthesis (n={self.n})"
        )
        # keep the f32 truth field DEVICE-resident for the episode's
        # device-side metric reductions: the f32→f64→f32 round trip is
        # exact, so this is bit-identical to re-uploading env.f — and the
        # re-upload costs ~1.5 s through the relay tunnel at 4.19M
        self.f_dev = traits_dev[:, 0]
        self.traits = traits
        f = traits[:, 0]
        if not np.isfinite(f).all():
            # safe_cholesky exhausts its jitter ladder silently; a NaN
            # ground truth would poison every downstream metric
            raise ValueError(
                "synthetic field covariance failed to factor — kernel "
                f"config is pathological (ls_spatial={cfg.true_ls_spatial}, "
                f"outputscale={cfg.true_outputscale}, n={self.n}, "
                f"synth_inducing={cfg.synth_inducing})"
            )
        return feats, f

    def _synthesize_lowrank(self, spec, params, x_all, T: int):
        """Draw the field from the FITC approximation of the true GP:
        f = U·ε_M + √(k_diag − rowsum U²)·ε_n with U = K_xz L_zz⁻ᵀ over
        M k-center inducing points — an EXACT sample from
        N(0, Q + diag(k − q)), the same family the low-rank acquisition
        conditions on (acquisition_lowrank).  O(n·M²) instead of the
        dense O(n³) factor, enabling 100k-point grids."""
        from algp_tpu.acquisition_lowrank import kcenter_indices
        from algp_tpu.ops import linalg as ops_la
        from algp_tpu.ops.kernels import gram, gram_diag

        cfg = self.cfg
        m = min(cfg.synth_inducing, self.n)
        zidx = kcenter_indices(x_all, m)
        z = x_all[zidx]
        os_ = float(cfg.true_outputscale)
        Kzz = gram(spec, params, z, z) + 1e-6 * os_ * jnp.eye(
            m, dtype=jnp.float32
        )
        # adaptive-jitter rescue: dense k-center designs on small smooth
        # grids can exceed f32 conditioning at the fixed relative jitter;
        # try 0 of safe_cholesky is the plain factor bitwise, so every
        # healthy field is unchanged
        Lzz, _ = ops_la.safe_cholesky(Kzz, initial_jitter=1e-5)
        k1, k2 = jax.random.split(jax.random.PRNGKey(cfg.seed))
        zm = jax.random.normal(k1, (m, T))
        zn = jax.random.normal(k2, (self.n, T))
        # HBM gate: the monolithic path peaks at ~2.5 × the (m, n) Kzx
        # buffer (arguments + trisolve panel temps + the Ut output — the
        # c5_4m probe measured 16.25 G at m·n·4 B = 8.6 G, a 259 M OOM on
        # a 15.75 G v5e).  Past 5 GB, stream the candidate axis through
        # ONE reused jitted chunk program instead; below it, keep the
        # monolithic program so existing fields stay bit-identical.
        if 4 * m * self.n <= _SYNTH_CHUNK_BYTES:
            Kzx = gram_pallas(spec, params, z, x_all)
            Ut = ops_la.solve_triangular(Lzz, Kzx)  # (m, n)
            resid = jnp.maximum(
                gram_diag(spec, params, x_all) - jnp.sum(Ut * Ut, axis=0),
                0.0,
            )
            return Ut.T @ zm + jnp.sqrt(resid)[:, None] * zn

        @jax.jit
        def chunk_fn(x_chunk, zn_chunk):
            Kzc = gram_pallas(spec, params, z, x_chunk)  # (m, c)
            Ut = ops_la.solve_triangular(Lzz, Kzc)
            resid = jnp.maximum(
                gram_diag(spec, params, x_chunk) - jnp.sum(Ut * Ut, axis=0),
                0.0,
            )
            return Ut.T @ zm + jnp.sqrt(resid)[:, None] * zn_chunk

        c = min(_SYNTH_CHUNK, self.n)  # peak ≈ 2.5·m·c·4 B ≈ 5.4 GB @ m=512
        n_pad = (self.n + c - 1) // c * c
        # pad with row 0 (inert: padded outputs are truncated below) so
        # every chunk runs the SAME compiled program
        x_pad = jnp.concatenate(
            [x_all, jnp.broadcast_to(x_all[:1], (n_pad - self.n,
                                                 x_all.shape[1]))]
        )
        zn_pad = jnp.concatenate(
            [zn, jnp.zeros((n_pad - self.n, T), zn.dtype)]
        )
        out = [
            chunk_fn(
                jax.lax.dynamic_slice_in_dim(x_pad, i * c, c),
                jax.lax.dynamic_slice_in_dim(zn_pad, i * c, c),
            )
            for i in range(n_pad // c)
        ]
        return jnp.concatenate(out)[: self.n]

    def _load_table(self, path: str):
        """Load a phenotype table: CSV with `row`, `range`, a value column
        (default `height`), and optional feature columns (`feat_*`)."""
        import pandas as pd

        df = pd.read_csv(path)
        need = {"row", "range"}
        if not need.issubset(df.columns):
            raise ValueError(f"table must have columns {need}, got {list(df.columns)}")
        if self.cfg.value_cols:
            value_cols = list(self.cfg.value_cols)
            missing = [c for c in value_cols if c not in df.columns]
            if missing:
                raise ValueError(f"value_cols {missing} not in table columns "
                                 f"{list(df.columns)}")
        else:
            if "height" in df.columns:
                value_cols = ["height"]
            else:
                # never guess: the old `df.columns[2]` fallback could
                # silently pick a feat_* column as the ground truth —
                # the same array then serves as BOTH the field and a GP
                # input feature, and every RMSE/selection is nonsense
                candidates = [
                    c for c in df.columns
                    if c not in ("row", "range")
                    and not c.startswith("feat_")
                ]
                if len(candidates) != 1:
                    raise ValueError(
                        "table has no 'height' column and the value "
                        "column is ambiguous — pass FieldConfig."
                        f"value_cols (non-feature candidates: {candidates})"
                    )
                value_cols = candidates
        feat_cols = [c for c in df.columns if c.startswith("feat_")]
        feats = np.zeros((self.n, len(feat_cols)), np.float32)
        rows_v = df["row"].to_numpy()
        cols_v = df["range"].to_numpy()
        # validate per-axis: a range ≥ num_cols would otherwise wrap into
        # the next row's cells and silently corrupt the grid
        valid = (
            (rows_v >= 0) & (rows_v < self.num_rows)
            & (cols_v >= 0) & (cols_v < self.num_cols)
        )
        dropped = int((~valid).sum())
        if dropped:
            import warnings

            warnings.warn(
                f"{dropped} table rows fall outside the "
                f"{self.num_rows}x{self.num_cols} grid and were dropped"
            )
        idx = rows_v * self.num_cols + cols_v
        traits = np.full((self.n, len(value_cols)), np.nan)
        for t, col in enumerate(value_cols):
            traits[idx[valid], t] = df[col].to_numpy()[valid]
        if feat_cols:
            feats[idx[valid]] = df[feat_cols].to_numpy(np.float32)[valid]
        # per-trait observation masks: a plot may have height but no width
        # — each trait's imputed cells must be excluded from ITS RMSE
        self.observed_traits = ~np.isnan(traits)
        self.observed_mask = self.observed_traits[:, 0]
        # fill gaps with each trait's mean so the grid stays complete,
        # then standardize per trait (the GP assumes zero-mean-ish fields)
        mu = np.nanmean(traits, axis=0)
        traits = np.where(np.isnan(traits), mu, traits)
        self._y_mean = traits.mean(axis=0)
        self._y_std = traits.std(axis=0) + 1e-12
        traits = (traits - self._y_mean) / self._y_std
        self.traits = traits
        return feats, traits[:, 0]

    # ------------------------------------------------------- index geometry

    def index_to_rowcol(self, i: int) -> tuple[int, int]:
        return divmod(int(i), self.num_cols)

    def rowcol_to_index(self, row: int, col: int) -> int:
        return int(row) * self.num_cols + int(col)

    def pose_of(self, i: int) -> tuple[float, float]:
        r, c = self.index_to_rowcol(i)
        return c * self.cfg.col_spacing, r * self.cfg.row_spacing

    # ------------------------------------------------------------- sensing

    def noise_std(self, modality: str = "precise") -> float:
        if modality not in MODALITIES:
            raise ValueError(f"unknown modality {modality!r}; use {MODALITIES}")
        mult = 1.0 if modality == "precise" else self.cfg.cheap_noise_mult
        return self.cfg.noise_std * mult

    def collect(self, indices, modality: str = "precise") -> Sample:
        """Simulate noisy measurements at grid indices (C10's
        collect_samples).  `noise_scale` is the *variance* multiplier vs
        the precise modality — threaded into the GP's heteroscedastic diag."""
        idx = np.asarray(indices, np.int64).ravel()
        std = self.noise_std(modality)
        y = self.f[idx] + std * self._rng.standard_normal(idx.shape)
        scale = np.full(
            idx.shape,
            1.0 if modality == "precise" else self.cfg.cheap_noise_mult**2,
            np.float64,
        )
        return Sample(indices=idx, y=y, noise_scale=scale)

    @property
    def num_traits(self) -> int:
        return self.traits.shape[1]

    def collect_traits(self, indices, modality: str = "precise"):
        """Noisy measurements of ALL traits at `indices`:
        (idx, Y, scale, obs) with Y of shape (k, T) — phenotyping measures
        several traits per plot visit; the batched `models.gp.fit_multi`
        consumes Y whole.

        `obs` (k, T) bool is the per-visit observation mask: all True by
        default; with FieldConfig.trait_obs_frac < 1 each SECONDARY trait
        (t ≥ 1) is measured only with that probability (trait 0 — the
        planning trait — always is), and unobserved Y cells are NaN so an
        accidental unmasked use fails loudly instead of silently fitting
        fabricated data.  The Bernoulli draw rides the env rng stream
        (checkpointed ⇒ resume-exact) and is skipped entirely at the 1.0
        default, so existing streams keep their bits."""
        idx = np.asarray(indices, np.int64).ravel()
        std = self.noise_std(modality)
        Y = self.traits[idx] + std * self._rng.standard_normal(
            (len(idx), self.num_traits)
        )
        scale = np.full(
            idx.shape,
            1.0 if modality == "precise" else self.cfg.cheap_noise_mult**2,
            np.float64,
        )
        frac = self.cfg.trait_obs_frac
        obs = np.ones((len(idx), self.num_traits), bool)
        if self.num_traits > 1 and frac < 1.0:
            # range validated at env construction (__init__)
            obs[:, 1:] = (
                self._rng.uniform(size=(len(idx), self.num_traits - 1))
                < frac
            )
            Y = np.where(obs, Y, np.nan)
        return idx, Y, scale, obs

    # ------------------------------------------------------------- metrics

    def rmse(self, mean, test_only: bool = False) -> float:
        """RMSE of a posterior mean field vs the latent truth.

        Only cells with actual ground truth count (all cells for synthetic
        fields; for tables, mean-imputed gaps are excluded).  With
        `test_only`, restrict further to the held-out split — the
        reference's headline evaluation (SURVEY.md §2 C14).
        """
        m = np.asarray(mean, np.float64)
        mask = self.test_mask if test_only else self.observed_mask
        return float(np.sqrt(np.mean((m[mask] - self.f[mask]) ** 2)))

    def calibration(self, mean, var, test_only: bool = False) -> dict:
        """Predictive-uncertainty calibration of a posterior (μ, σ²) field.

        The reference's headline evaluation is RMSE of the mean (SURVEY.md
        §2 C14), but a GP's product is a *distribution*; these companion
        metrics score the variance field against the latent truth, masked
        exactly like `rmse` (f64, host-side, computed once per episode):

        - ``nlpd``: mean negative log predictive density of the truth
          under N(μ, σ²) — the standard proper scoring rule
          (lower is better; sharp AND calibrated minimizes it).
        - ``cov90``/``cov95``: empirical fraction of truth cells inside
          the central 90%/95% predictive interval (calibrated ≈ 0.90/0.95;
          above = under-confident, below = over-confident).

        σ² is floored at 1e-12 so fully-determined cells (e.g. sampled
        under zero noise) cannot produce ±inf densities.
        """
        m = np.asarray(mean, np.float64)
        v = np.maximum(np.asarray(var, np.float64), 1e-12)
        mask = self.test_mask if test_only else self.observed_mask
        d = m[mask] - self.f[mask]
        vm = v[mask]
        nlpd = 0.5 * np.mean(np.log(2.0 * np.pi * vm) + d * d / vm)
        z = np.abs(d) / np.sqrt(vm)
        return {
            "nlpd": float(nlpd),
            # central-interval half-widths: Φ⁻¹(0.95), Φ⁻¹(0.975)
            "cov90": float(np.mean(z <= 1.6448536269514722)),
            "cov95": float(np.mean(z <= 1.959963984540054)),
        }

    def rmse_traits(self, means, test_only: bool = False) -> list[float]:
        """Per-trait RMSE of posterior mean fields `means` (n, T).

        Each trait uses ITS OWN observation mask — a plot measured for
        one trait but not another contributes only where truth exists.
        """
        M = np.asarray(means, np.float64)
        out = []
        for t in range(self.traits.shape[1]):
            mask = self.observed_traits[:, t]
            if test_only:
                mask = mask & self.test_mask
            d = M[mask, t] - self.traits[mask, t]
            out.append(float(np.sqrt(np.mean(d * d))))
        return out
