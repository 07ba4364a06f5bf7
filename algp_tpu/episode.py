"""L4 — the active-learning episode orchestrator (the reference's Agent).

Capability parity (SURVEY.md §2 C12, §3.5; BASELINE.json:11): pilot survey
→ initial MLL fit → repeat { enumerate budgeted paths from the pose, score
each path's candidate sample set by joint entropy / Krause MI per unit
cost, traverse the winner, collect (heteroscedastically) noisy samples,
update the model } until the travel budget is exhausted; per-round RMSE /
variance metrics throughout.  Strategy dispatch covers the reference's
baselines: "mi" / "entropy" (informative), "uniform" (random sampling),
"naive" (boustrophedon sweep).

Host/device split (BASELINE.json:5): this module is plain host Python and
calls ONLY jitted device functions.  All shapes the device sees are
padded/static so each (strategy, grid, path-batch-shape) compiles once
and is reused every replan step.

Dispatch economics (this environment's TPU relay charges ~27 ms per
host-SYNCHRONIZING exchange; async dispatches pipeline for free): an
informative (mi/entropy) step performs exactly ONE synchronizing read —
`acquisition.plan_episode_step` returns the next path choice AND the
posterior mean/variance metrics for the current state in a single fused
program, with the noise model derived from the fitted params on device.
Refit steps additionally dispatch `models.gp.fit` and the implicit-
precision seed (`acquisition.implicit_precision_seed`), both async —
no host code reads their outputs before the next fused step consumes
them.  The baseline strategies (uniform/naive) plan host-side and keep
the `gp.posterior_and_predict` / `gp.extend_and_predict` metrics path
(incremental chol_append_row growth between refits).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from algp_tpu import acquisition as acq
from algp_tpu import planning
from algp_tpu.config import (
    MULTI_FITS, ExperimentConfig, resolve_num_inducing, resolve_strategy,
)
from algp_tpu.field import FieldEnv, Sample
from algp_tpu.models import gp as gp_mod
from algp_tpu.utils.checkpoint import EpisodeState
from algp_tpu.utils.metrics import MetricsLogger

STRATEGIES = ("mi", "entropy", "uniform", "naive")

#: past _KCENTER_SUBSAMPLE candidates, the episode's k-center inducing
#: design runs over a uniform sub-grid of ~_KCENTER_TARGET points (see
#: Agent._lowrank_z) — the gate sits above every ≤1M preset
_KCENTER_SUBSAMPLE = 1 << 21
_KCENTER_TARGET = 1 << 20


def _kcenter_subgrid_indices(nr: int, nc: int, target: int) -> np.ndarray:
    """Flat indices of a uniform 2-axis sub-grid of a row-major nr×nc
    grid with ≈ `target` points (≤ nr·nc/ceil(nr·nc/target)).

    Both axes are strided: a flat ``[::s]`` stride on a row-major grid
    whose column count is divisible by s keeps every row and drops
    columns only — an anisotropic coarsening, not a uniform sub-grid
    (ADVICE r3: the 2048×2048 / stride-4 case kept all 2048 rows and 1
    in 4 columns).  Here stride s = ceil(n/target) is split s_r·s_c ≈ s
    with s_c = ceil(√s), so the sub-grid coarsens both axes evenly
    (2048×2048 / target 2²⁰ → strides 2×2 → a true 1024×1024 grid)."""
    s = -(-(nr * nc) // target)
    sc = 1
    while sc * sc < s:
        sc += 1  # ceil(sqrt(s)); s is tiny (≤ dozens)
    sr = -(-s // sc)
    return (
        np.arange(0, nr, sr, dtype=np.int64)[:, None] * nc
        + np.arange(0, nc, sc, dtype=np.int64)
    ).ravel()


@dataclasses.dataclass
class _PlanBundle:
    """One step's plan + the posterior metrics of the state it was planned
    from (mi/entropy: both from ONE fused device program / one sync).

    On large grids the metrics are reduced ON DEVICE (see
    `Agent._use_device_metrics`): `mean`/`var` are then None (the step's
    sync moves bytes, not two N-vectors) and `var_sites` carries the
    posterior variances at the chosen path's sites for the mixed-modality
    policy; the full field is fetched once at episode end."""

    nodes: list
    cost: float
    sites: list
    mean: Optional[np.ndarray]  # posterior mean over the grid, or None
    var: Optional[np.ndarray]  # posterior variance over the grid, or None
    rmse: float
    rmse_test: float
    mean_var: float
    var_sites: Optional[np.ndarray] = None

    @property
    def empty(self) -> bool:
        # len() (not truthiness): nodes may be a numpy view over the
        # native enumerator's arena rather than a list
        return len(self.nodes) == 0 or self.cost <= 0 or not self.sites


@dataclasses.dataclass
class EpisodeResult:
    state: EpisodeState
    history: list[dict]
    mean: np.ndarray  # final posterior mean over the grid
    var: np.ndarray  # final posterior variance over the grid
    rmse: float  # over all ground-truth cells
    rmse_test: float  # over the held-out split only (C14 headline eval)
    # predictive-uncertainty calibration of the FINAL posterior
    # (FieldEnv.calibration: nlpd/cov90/cov95 + *_test variants) — the
    # variance-field companion to the RMSE headline; host f64, computed
    # once at episode end so no fused step program changes
    calibration: dict = dataclasses.field(default_factory=dict)
    # multi-trait envs: per-trait held-out/all-cells RMSE of the final
    # batched fit_multi posteriors (trait 0 = the planning trait); None
    # on single-trait episodes
    trait_rmse: Optional[list] = None
    trait_rmse_test: Optional[list] = None


class Agent:
    """Episode orchestrator (reference `Agent(env, args)`; SURVEY.md §2 C12).

    `mesh`: optional jax.sharding.Mesh with a 'grid' axis — the
    informative (mi/entropy) strategies then run their ENTIRE per-step
    device program sharded over the candidate axis
    (parallel.sharded_episode): the per-refit precision seed (low-rank
    VT/dinv or exact W) is built sharded and KEPT sharded across steps,
    the conditioning strip and posterior fields live at O(N/S) rows per
    chip, and each step remains one program + one synchronizing read.
    Path choices match the single-device episode index-for-index
    (tests/test_sharded.py).  uniform/naive plan host-side regardless.
    """

    def __init__(self, env: FieldEnv, cfg: ExperimentConfig,
                 logger: Optional[MetricsLogger] = None,
                 mesh=None):
        self.env = env
        self.cfg = cfg
        self.mesh = mesh
        # deep feature kernel: every device consumer (posterior, greedy
        # loops, set scoring, precision) sees the EFFECTIVE spec over
        # [spatial | φ(features)]; only the joint fit touches raw inputs
        if cfg.deep is not None:
            from algp_tpu.models import networks as nets

            if cfg.kernel.df == 0:
                raise ValueError("deep kernel needs feature dims (df > 0)")
            self.spec = nets.deep_spec(cfg.kernel, cfg.deep)
        else:
            self.spec = cfg.kernel
        self._mlp = None
        self._Xdev = env.X  # embedded after the first deep fit
        self.logger = logger or MetricsLogger()
        self.rng = np.random.default_rng(cfg.episode.seed)
        self._pad_paths = 256  # static path-batch size (compile once)
        self._k_max = cfg.episode.samples_per_step
        # planner selection: num_inducing=None auto-picks exact vs FITC
        # low-rank MI from the candidate count (config.
        # resolve_num_inducing — the measured ~20k crossover)
        self._num_inducing = resolve_num_inducing(
            cfg.acquisition.num_inducing, env.n
        )
        # strategy="auto" resolves to the measured-best arm for this
        # candidate count (config.resolve_strategy — MI at reference-scale
        # grids, entropy through the exact-planner range, yield-aware
        # mi:per_sample at low-rank scales); every consumer below reads
        # the RESOLVED strategy/utility
        self._strategy, self._path_utility = resolve_strategy(
            cfg.acquisition.strategy, env.n, cfg.acquisition.path_utility
        )
        # multi-trait phenotyping (FieldConfig.num_traits / table
        # value_cols): the episode PLANS on the designated trait 0 —
        # informative coverage of the field is trait-agnostic for
        # spatially-sampled traits, and the reference runs one trait per
        # experiment — while every plot visit measures ALL traits
        # (env.collect_traits); a final batched fit_multi produces
        # per-trait posteriors + RMSE (EpisodeResult.trait_rmse)
        self._multi_trait = env.num_traits > 1
        if self._multi_trait and cfg.fit.multi_fit not in MULTI_FITS:
            raise ValueError(
                f"unknown multi_fit {cfg.fit.multi_fit!r}; use {MULTI_FITS}"
            )
        self._mi_ensemble = max(1, int(cfg.acquisition.mi_ensemble))
        if self._mi_ensemble > 1:
            if self._strategy == "mi" and not self._num_inducing:
                raise ValueError(
                    "mi_ensemble > 1 needs the low-rank planner "
                    "(num_inducing > 0 or auto above the crossover) — "
                    "the exact W seed has no design to vary"
                )
        # static training-buffer capacity: every jitted fn sees ONE shape
        # for the whole episode (identity-padded; SURVEY.md §7.5 #4).
        # Derivation: the planner prefers paths costing ≥ min_cost_frac
        # of the per-step budget slice budget/num_waypoints, so a budget
        # funds at most ceil(num_waypoints / min_cost_frac) full steps
        # (2·num_waypoints at the 0.5 default); +6 steps of slack covers
        # fallback stubs when no qualifying path exists (pose cornered).
        # Each step collects at most samples_per_step measurements.  Not
        # a hard bound — an episode of sub-slice steps can outgrow it
        # (see _grow_capacity); EpisodeConfig.max_samples pre-sizes such
        # campaigns explicitly.
        if cfg.episode.max_samples is not None:
            cap = cfg.episode.max_samples
        else:
            frac = max(cfg.episode.min_cost_frac, 1e-6)
            cap = cfg.episode.num_pilot + (
                int(np.ceil(cfg.episode.num_waypoints / frac)) + 6
            ) * self._k_max
        self._max_samples = (cap + 7) // 8 * 8
        self._P_cache = None  # (params, W, WT) — exact implicit-precision seed
        self._lr_cache = None  # (params, LowRankPrecision) — low-rank seed
        self._post_cache = None  # (params, n_samples, Posterior)
        self._step_post_var = None
        if self._strategy not in STRATEGIES:
            raise ValueError(
                f"unknown strategy {cfg.acquisition.strategy!r}; use "
                f"{STRATEGIES + ('auto',)}"
            )
        if self._path_utility not in acq.PATH_UTILITIES:
            raise ValueError(
                f"unknown path_utility {cfg.acquisition.path_utility!r}; "
                f"use {acq.PATH_UTILITIES}"
            )
        if cfg.episode.waypoint_goals is not None:
            bad = [g for g in cfg.episode.waypoint_goals
                   if not 0 <= int(g) < env.n]
            if bad:
                raise ValueError(
                    f"waypoint_goals outside the grid (n={env.n}): {bad}"
                )
        if cfg.episode.lagged_refit and cfg.deep is not None:
            raise ValueError(
                "lagged_refit and the deep feature kernel are not combined "
                "(the refit re-embeds the candidate matrix — lagging would "
                "desync the embedding from the params consuming it)"
            )
        if cfg.fit.sparse_threshold:
            if cfg.fit.sparse_threshold < cfg.fit.sparse_inducing:
                raise ValueError(
                    f"sparse_threshold ({cfg.fit.sparse_threshold}) must be "
                    f"≥ sparse_inducing ({cfg.fit.sparse_inducing}) — the "
                    f"k-center design needs that many distinct sampled "
                    f"points when the sparse refit kicks in"
                )
            if cfg.deep is not None:
                raise ValueError(
                    "episode-scale SGPR and the deep feature kernel are "
                    "not combined (the joint embedding fit is exact-only)"
                )

    def _grow_capacity(self, needed: int) -> None:
        """Grow the static training-buffer capacity — and say so LOUDLY:
        every jitted step/fit/predict program is shape-specialized on the
        capacity, so outgrowing it mid-episode recompiles them all (30 s–
        5 min each on a remote-compile TPU plugin; reads as a pool hang).
        Pre-size with EpisodeConfig.max_samples to avoid this."""
        if needed <= self._max_samples:
            return
        import warnings

        new_cap = (needed + 63) // 64 * 64
        warnings.warn(
            f"episode outgrew its static sample capacity "
            f"({needed} > {self._max_samples}); growing to {new_cap}. "
            f"Every step program recompiles (expect a long stall on "
            f"remote-compile TPU backends) — pre-size the campaign with "
            f"EpisodeConfig.max_samples.",
            RuntimeWarning,
            stacklevel=3,
        )
        self._max_samples = new_cap

    def _pad_sampled_host(self, st: EpisodeState):
        """Host-side padded sampled-set buffers (idx, noise_scale, y, m)
        — THE padding convention (idx 0-fill, scale 1-fill, y 0-fill,
        capacity grown) every consumer derives from, so the fused step,
        the conditioning fallback, and the fit buffers can never
        disagree on which slots are real."""
        m = len(st.sampled_idx)
        self._grow_capacity(m)
        cap = self._max_samples
        idx = np.zeros(cap, np.int64)
        idx[:m] = st.sampled_idx
        ns = np.ones(cap, np.float32)
        ns[:m] = st.noise_scale
        y = np.zeros(cap, np.float32)
        y[:m] = st.y
        return idx, ns, y, m

    def _padded_train(self, st: EpisodeState, raw: bool = False):
        """(x, y, noise_scale, num_valid) padded to the static capacity.

        `raw=True` returns the un-embedded inputs (the joint deep fit
        trains the embedding itself); otherwise x comes from the
        effective (embedded) candidate matrix every other consumer uses.
        """
        idx, ns, y, m = self._pad_sampled_host(st)
        x_src = self.env.X if raw else self._Xdev
        x = x_src[jnp.asarray(idx)]
        return (
            x, jnp.asarray(y), jnp.asarray(ns),
            jnp.asarray(m, jnp.int32), jnp.asarray(idx, jnp.int32),
        )

    # ------------------------------------------------------------ pilot

    def _collect(self, idx, modality: str):
        """env measurement at `idx`: (Sample, trait_rows) — trait_rows is
        the (k, T) all-traits matrix on multi-trait envs (column 0 is the
        Sample's y, the designated planning trait; under-observed
        secondary-trait cells are NaN — FieldConfig.trait_obs_frac —
        trait 0 is always measured, so planning is unaffected), else
        None."""
        if self._multi_trait:
            i, Y, scale, _ = self.env.collect_traits(idx, modality)
            return Sample(indices=i, y=Y[:, 0], noise_scale=scale), Y
        return self.env.collect(idx, modality), None

    def pilot_survey(self) -> EpisodeState:
        """Uniformly spread pilot samples (precise modality), as the
        reference's initial survey pass."""
        n_pilot = self.cfg.episode.num_pilot
        idx = np.unique(
            np.linspace(0, self.env.n - 1, n_pilot).round().astype(np.int64)
        )
        s, Y = self._collect(idx, "precise")
        return EpisodeState(
            sampled_idx=s.indices,
            y=s.y,
            noise_scale=s.noise_scale,
            pose=int(s.indices[-1]),
            budget_left=self.cfg.episode.budget,
            step=0,
            y_traits=Y,
        )

    # ------------------------------------------------------------ model

    def fit_model(self, st: EpisodeState, base_key, lagged: bool = False):
        """Refit on the current (padded) training buffers.  The per-step
        key derivation (fold_in(base_key, st.step)) happens INSIDE the
        jitted fit program (gp.fit_step) so a refit is one async dispatch
        — a resumed run derives EXACTLY the keys the uninterrupted run
        would (a split chain would diverge after resume).

        `lagged` (EpisodeConfig.lagged_refit): the result is stored as
        `st.pending_params` — consumed by the plan AFTER next, so the fit
        program (dispatched after this step's plan already synced) never
        drains into the refit step's fused sync."""
        x, y, ns, m, _ = self._padded_train(st, raw=True)
        # warm refits (FitConfig.refit_iters/refit_restarts): every fit
        # AFTER the pilot fit starts restart 0 from the incumbent params
        # and runs the shrunk refit_cfg schedule — the refit program is
        # latency-bound (iters SEQUENTIAL small ops) and its device time
        # drains into the next fused step's sync.  Deep-kernel episodes
        # keep full refits (the MLP weights dominate and are already
        # carried across refits via st.mlp).
        warm = (
            st.params is not None
            and (self.cfg.fit.refit_iters or self.cfg.fit.refit_restarts)
            and self.cfg.deep is None
        )
        if self.cfg.deep is not None:
            from algp_tpu.models import networks as nets

            res = nets.fit_deep(
                self.cfg.kernel, self.cfg.deep, self.cfg.fit, x, y, ns,
                key=jax.random.fold_in(base_key, st.step), num_valid=m,
            )
            self._set_mlp(res.mlp)
            st.mlp = res.mlp
        elif (
            self.cfg.fit.sparse_threshold
            and len(st.sampled_idx) > self.cfg.fit.sparse_threshold
        ):
            # long campaign: the sampled set outgrew the exact fit —
            # refit by the collapsed SGPR bound, O(n·M²) per optimizer
            # step instead of O(n³).  n_sampled only grows, so this
            # branch, once entered, is entered every refit (exactly one
            # extra program compile per episode).
            from algp_tpu.models import sparse_gp

            if warm:
                res = sparse_gp.fit_step_sparse_warm(
                    self.spec, self.cfg.fit, x, y, ns, base_key, st.step,
                    num_valid=m, incumbent=st.params,
                    num_inducing=self.cfg.fit.sparse_inducing,
                )
            else:
                res = sparse_gp.fit_step_sparse(
                    self.spec, self.cfg.fit, x, y, ns, base_key, st.step,
                    num_valid=m, num_inducing=self.cfg.fit.sparse_inducing,
                )
        elif warm:
            res = gp_mod.fit_step_warm(
                self.spec, self.cfg.fit, x, y, ns, base_key, st.step,
                incumbent=st.params, num_valid=m,
            )
        else:
            res = gp_mod.fit_step(
                self.spec, self.cfg.fit, x, y, ns, base_key, st.step,
                num_valid=m,
            )
        if lagged:
            st.pending_params = res.params
        else:
            st.params = res.params
        return res

    def _set_mlp(self, mlp):
        """Adopt trained embedding weights: re-embed the candidate grid
        (one (n, df)→(n, dz) pass) for every downstream device consumer."""
        from algp_tpu.models import networks as nets

        self._mlp = mlp
        self._Xdev = nets.embed_inputs(
            self.cfg.deep, mlp, self.env.X, self.cfg.kernel.ds
        )

    def _base_noise(self, st: EpisodeState) -> float:
        """Fitted base observation-noise VARIANCE with the f32 floor —
        the single source of truth for every host-side noise assembly
        (conditioning, posterior growth, future-measurement scoring).
        Cached per fitted params: each read is a device→host sync."""
        c = getattr(self, "_base_noise_cache", None)
        if c is not None and c[0] is st.params:
            return c[1]
        base = float(
            np.maximum(
                np.exp(2.0 * np.asarray(st.params.log_noise)),
                self.cfg.fit.min_noise**2,
            )
        )
        self._base_noise_cache = (st.params, base)
        return base

    def _padded_sampled(self, st: EpisodeState):
        """(idx_pad, m, pilot_nv) — the sampled set padded to the static
        capacity plus its per-OBSERVATION conditioning noise (fitted base
        variance scaled by each measurement's RECORDED modality, per
        occurrence).  The single source of the heteroscedastic
        conditioning convention for both the fused replan and the
        conditioning fallback."""
        idx, _, _, n_samp = self._pad_sampled_host(st)
        pnv = np.full(self._max_samples, 1.0, np.float32)
        pnv[:n_samp] = self._base_noise(st) * st.noise_scale
        return (jnp.asarray(idx, jnp.int32), jnp.asarray(n_samp, jnp.int32),
                jnp.asarray(pnv))

    def _noise_vec(self, st: EpisodeState) -> jnp.ndarray:
        """Effective per-candidate noise variance for FUTURE measurements
        under the episode's modality policy, from the fitted base noise.
        "cheap"/"mixed" score candidates with the cheap sensor's variance
        (mixed collects all-but-one sample cheap) so path utilities and
        the MI complement precision use the noise model that will actually
        generate the data.

        Built host-side: eager jnp ops whose shapes/values change per step
        would each trigger a fresh XLA mini-compile (seconds under this
        environment's remote-compile TPU plugin).  Cached per fitted
        params — the vector only changes on refit, and each transfer is
        a relay dispatch."""
        c = getattr(self, "_noise_vec_cache", None)
        if c is not None and c[0] is st.params:
            return c[1]
        base = self._base_noise(st)
        if self.cfg.episode.modality in ("cheap", "mixed"):
            base *= self.env.cfg.cheap_noise_mult**2
        nv = jnp.asarray(np.full(self.env.n, base, np.float32))
        self._noise_vec_cache = (st.params, nv)
        return nv

    def predict_field(self, st: EpisodeState):
        """Posterior mean/variance over the grid, ONE device program +
        ONE transfer per step.

        While the hyperparameters are unchanged (between refits, i.e.
        `refit_every > 1`), the cached Cholesky factor is extended by the
        step's new samples via `chol_append_row` — O(k·n²) instead of the
        O(n³) refactorization (SURVEY.md §2 C8) — fused with the grid
        prediction (gp.extend_and_predict).  A refit invalidates the
        cache (params is a fresh object) and refactorizes once
        (gp.posterior_and_predict).
        """
        x, y, ns, m, _ = self._padded_train(st)
        n_samp = len(st.sampled_idx)
        c = self._post_cache
        k_new = None if c is None else n_samp - c[1]
        use_pallas = self.env.n >= 4096
        if (
            c is not None and c[0] is st.params
            and 0 < k_new <= self._k_max + 1
            and int(c[2].L.shape[0]) == int(x.shape[0])  # capacity unchanged
        ):
            base = self._base_noise(st)
            new_nv = np.full(self._k_max + 1, 1.0, np.float32)
            new_nv[:k_new] = base * st.noise_scale[c[1]:]
            post, mean, var = gp_mod.extend_and_predict(
                self.spec, st.params, c[2], x, y,
                jnp.asarray(new_nv), jnp.asarray(c[1], jnp.int32),
                jnp.asarray(k_new, jnp.int32), self._Xdev,
                jitter=self.cfg.fit.jitter, use_pallas=use_pallas,
            )
        elif c is not None and c[0] is st.params and k_new == 0:
            post = c[2]
            mean, var = gp_mod.predict(
                self.spec, st.params, post, self._Xdev,
                use_pallas=use_pallas,
            )
        else:
            post, mean, var = gp_mod.posterior_and_predict(
                self.spec, st.params, x, y, ns, self._Xdev,
                min_noise=self.cfg.fit.min_noise, jitter=self.cfg.fit.jitter,
                use_pallas=use_pallas, has_noise_scale=True,
                num_valid=m, has_num_valid=True,
            )
        self._post_cache = (st.params, n_samp, post)
        # one relay round trip for both fields
        mean, var = jax.device_get((mean, var))
        return np.asarray(mean), np.asarray(var)

    # ------------------------------------------------------- planning step

    def _conditioning_state(self, st: EpisodeState, nv):
        """Basis/post-var over all candidates given everything sampled —
        one jitted conditioning pass (rounds=0 greedy loop over a padded
        static pilot buffer; compiles once per episode)."""
        idx_pad, m, pnv = self._padded_sampled(st)
        res = acq.greedy_select(
            self.spec, st.params, self._Xdev, nv,
            idx_pad,
            rounds=0, num_pilot=self._max_samples, strategy="entropy",
            pilot_count=m, pilot_nv=pnv,
        )
        return res.basis, res.post_var

    @property
    def _nv_mult(self) -> float:
        """Future-measurement noise-VARIANCE scale under the modality
        policy: "cheap"/"mixed" score candidates with the cheap sensor's
        variance (mixed collects all-but-one sample cheap) so path
        utilities and the MI complement precision use the noise model
        that will actually generate the data."""
        if self.cfg.episode.modality in ("cheap", "mixed"):
            return float(self.env.cfg.cheap_noise_mult**2)
        return 1.0

    def _padded_obs(self, st: EpisodeState):
        """(idx_pad, count, noise_scale_pad, y_pad) — the sampled set,
        its per-observation modality scales, and its observations, padded
        to the static capacity.  Pure host assembly: unlike
        `_padded_sampled` this never reads the fitted params (the fused
        step derives the noise model on device), so dispatching a step
        costs zero host→device syncs."""
        idx, ns, y, n_samp = self._pad_sampled_host(st)
        return (jnp.asarray(idx, jnp.int32), jnp.asarray(n_samp, jnp.int32),
                jnp.asarray(ns), jnp.asarray(y))

    @property
    def _use_device_metrics(self) -> bool:
        """Reduce the per-step posterior metrics ON DEVICE for large
        grids: the relay tunnel moves mean+var (8 MB at N = 1M) through
        every step's synchronizing read otherwise — measured ~190 ms of
        pure transfer per step at 1M.  Config override via
        `EpisodeConfig.device_metrics`; auto-on past 16 384 points
        (below that the transfer hides in the ~27 ms sync floor, and
        the 10k-artifact path keeps its bit-identical host metrics)."""
        dm = self.cfg.episode.device_metrics
        if dm is not None:
            return bool(dm)
        return self.env.n >= 16384

    def _truth(self):
        """(f_true, obs_mask, test_mask) device-resident, f32 — built
        once per episode for the device-side metric reductions.

        Transfer economics (the relay tunnel moves ~50 MB/s): synthetic
        envs keep the truth field DEVICE-resident from synthesis
        (env.f_dev — bit-identical to re-uploading env.f), the all-ones
        observed mask is generated on device, and the test mask is
        scattered from its index list (n/5 i32) instead of shipping an
        n-length f32 — together ~45 of the ~50 MB the old path uploaded
        at N = 4.19M (~1.5 s of measured episode startup)."""
        c = getattr(self, "_truth_cache", None)
        if c is None:
            env = self.env
            f_true = (
                env.f_dev if env.f_dev is not None
                else jnp.asarray(env.f, jnp.float32)
            )
            if env.observed_mask.all():
                obs = jnp.ones(env.n, jnp.float32)
            else:
                obs = jnp.asarray(env.observed_mask, jnp.float32)
            test_idx = np.flatnonzero(env.test_mask).astype(np.int32)
            if len(test_idx) < env.n // 2:
                test = jnp.zeros(env.n, jnp.float32).at[
                    jnp.asarray(test_idx)
                ].set(1.0)
            else:
                test = jnp.asarray(env.test_mask, jnp.float32)
            c = (f_true, obs, test)
            self._truth_cache = c
        return c

    def _mesh_x(self):
        """The candidate matrix padded to an equal-shard-block multiple
        with inert sentinels (parallel.sharded_episode.mesh_pad) — built
        once per episode (re-padded only if a deep-kernel refit re-embeds
        the candidates)."""
        c = getattr(self, "_mesh_x_cache", None)
        if c is None or c[0] is not self._Xdev:
            from algp_tpu.parallel import sharded_episode as sep

            xp, _ = sep.mesh_pad(self._Xdev, self.mesh.shape["grid"])
            self._mesh_x_cache = (self._Xdev, xp)
        return self._mesh_x_cache[1]

    def _mesh_truth(self):
        """`_truth` zero-padded to the mesh-padded candidate length —
        sentinel rows sit outside every mask, so the sharded metric
        reductions see exactly the real field.  Built FROM `_truth`'s
        device-resident arrays and padded on device: re-uploading the
        host copies shipped 3·N f32 through the relay tunnel per episode
        (the ~45 MB/~1.5 s startup cost the single-chip path was
        engineered out of — CLAUDE.md transfer rules)."""
        c = getattr(self, "_mesh_truth_cache", None)
        if c is None:
            pad = self._mesh_x().shape[0] - self.env.n

            def padz(a):
                z = jnp.zeros(pad, jnp.float32)
                return jnp.concatenate([jnp.asarray(a, jnp.float32), z])

            c = tuple(padz(a) for a in self._truth())
            self._mesh_truth_cache = c
        return c

    def _host_bundle(self, nodes, cost, sites, mean, var) -> _PlanBundle:
        return _PlanBundle(
            nodes, cost, sites, mean, var,
            rmse=self.env.rmse(mean),
            rmse_test=self.env.rmse(mean, test_only=True),
            mean_var=float(var.mean()),
        )

    def _plan_and_metrics(self, st: EpisodeState) -> _PlanBundle:
        """Plan the next path AND produce the posterior mean/variance
        metrics for the CURRENT state.

        mi/entropy: ONE fused device program + ONE synchronizing read
        (acquisition.plan_episode_step) — the metrics are byproducts of
        the conditioning pass the plan needs anyway.  uniform/naive plan
        host-side and read the metrics from `predict_field` (which keeps
        the incremental chol_append_row posterior between refits)."""
        strat = self._strategy
        self._step_post_var = None  # caches for _sense('mixed')
        self._step_site_var = None
        # per-phase wall profile of this plan (host enumeration vs seed
        # dispatch vs the fused device step+sync) — logged with the step
        # record so scale regressions name their phase (VERDICT r2 #3)
        prof = self._plan_profile = {}
        t_start = time.perf_counter()
        slice_budget = min(
            st.budget_left,
            self.cfg.episode.budget / max(1, self.cfg.episode.num_waypoints),
        )
        if strat == "naive":
            order = planning.boustrophedon_order(self.env)
            unsampled = order[~np.isin(order, st.sampled_idx)]
            # the sweep pays col_spacing per cell — never take more cells
            # than the remaining budget affords (an unbounded take
            # overdrew the budget on the final step)
            afford = int(st.budget_left / max(self.env.cfg.col_spacing, 1e-9))
            take = list(unsampled[: min(self._k_max, afford)])
            mean, var = self.predict_field(st)
            return self._host_bundle(
                take, float(len(take) * self.env.cfg.col_spacing), take,
                mean, var,
            )
        if strat == "uniform":
            unsampled = np.setdiff1d(np.arange(self.env.n), st.sampled_idx)
            take = list(np.sort(self.rng.choice(
                unsampled, min(self._k_max, len(unsampled)), replace=False
            )))
            mean, var = self.predict_field(st)
            return self._host_bundle(take, float(slice_budget), take, mean, var)

        goal = self._current_goal(st)
        batch = planning.enumerate_batch(
            self.env, st.pose, slice_budget, goal=goal,
            max_paths=self._pad_paths, k_max=self._k_max,
            min_cost_frac=self.cfg.episode.min_cost_frac,
        )
        if goal is not None and not len(batch):
            # the waypoint is unreachable within this budget slice —
            # plan a free step toward it instead of stalling (the next
            # replan re-targets the same goal from the new pose)
            self.logger.log(step=st.step, phase="goal_fallback",
                            goal=int(goal))
            batch = planning.enumerate_batch(
                self.env, st.pose, slice_budget,
                max_paths=self._pad_paths, k_max=self._k_max,
                min_cost_frac=self.cfg.episode.min_cost_frac,
            )
        if not len(batch):
            # terminal plan (budget slice exhausted / pose cornered): the
            # full-field posterior fetch here IS the episode's final
            # fetch — log it as such, or at 1M it reads as ~0.5 s of
            # phantom per-step cost
            t0 = time.perf_counter()
            mean, var = self.predict_field(st)
            self.logger.log(
                step=st.step, phase="final",
                final_fetch_s=round(time.perf_counter() - t0, 4),
            )
            return self._host_bundle([], 0.0, [], mean, var)
        # pad the batch to the static compile shape
        P = self._pad_paths
        sets = np.zeros((P, self._k_max), np.int32)
        sizes = np.zeros((P,), np.int32)
        costs = np.ones((P,), np.float32)
        sets[: len(batch)] = batch.sets
        sizes[: len(batch)] = batch.sizes
        costs[: len(batch)] = batch.costs
        prof["enum_s"] = time.perf_counter() - t_start

        t0 = time.perf_counter()
        idx_pad, m, ns_pad, y_pad = self._padded_obs(st)
        lowrank = strat == "mi" and bool(self._num_inducing)
        lrseed = W = WT = None
        if lowrank:
            # large-N MI: inducing-point complement precision
            # (acquisition_lowrank) — same one-program/one-sync step shape
            lrseed = self._lowrank_seed(st)
        elif strat == "mi":
            W, WT = self._precision_seed(st)
        prof["seed_s"] = time.perf_counter() - t0  # enqueue only (async)

        t0 = time.perf_counter()
        sets_d = jnp.asarray(sets)
        sizes_d = jnp.asarray(sizes)
        costs_d = jnp.asarray(costs)
        common = dict(min_noise=self.cfg.fit.min_noise,
                      nv_mult=self._nv_mult,
                      path_utility=self._path_utility)
        if self._use_device_metrics:
            if self.mesh is not None:
                from algp_tpu.parallel import sharded_episode as sep

                f_true, obs_m, test_m = self._mesh_truth()
                out = sep.sharded_plan_episode_step_metrics(
                    self.mesh, self.spec, st.params, self._mesh_x(),
                    idx_pad, m, ns_pad, y_pad, sets_d, sizes_d, costs_d,
                    f_true, obs_m, test_m, lr=lrseed, W=W,
                    strategy=strat, n_valid=self.env.n, **common,
                    ensemble=self._mi_ensemble,
                )
            elif lowrank:
                from algp_tpu import acquisition_lowrank as acq_lr

                f_true, obs_m, test_m = self._truth()
                out = acq_lr.plan_episode_step_lowrank_factors_metrics(
                    self.spec, st.params, self._Xdev,
                    idx_pad, m, ns_pad, y_pad, sets_d, sizes_d, costs_d,
                    lrseed, f_true, obs_m, test_m, **common,
                    ensemble=self._mi_ensemble,
                )
            else:
                f_true, obs_m, test_m = self._truth()
                out = acq.plan_episode_step_metrics(
                    self.spec, st.params, self._Xdev,
                    idx_pad, m, ns_pad, y_pad, sets_d, sizes_d, costs_d,
                    f_true, obs_m, test_m, W, WT, strategy=strat, **common,
                )
            # the step's single synchronizing read — a few dozen bytes
            best, rmse, rmse_test, mean_var, var_sites = jax.device_get(out)
            prof["step_s"] = time.perf_counter() - t0
            best = int(best)
            sites = list(batch.sets[best][: batch.sizes[best]])
            self._step_site_var = np.asarray(var_sites)  # for _sense('mixed')
            return _PlanBundle(
                batch.node_seqs[best], float(batch.costs[best]), sites,
                None, None, rmse=float(rmse), rmse_test=float(rmse_test),
                mean_var=float(mean_var),
                var_sites=np.asarray(var_sites),
            )

        if self.mesh is not None:
            from algp_tpu.parallel import sharded_episode as sep

            best_d, mean_d, var_d, _ = sep.sharded_plan_episode_step(
                self.mesh, self.spec, st.params, self._mesh_x(),
                idx_pad, m, ns_pad, y_pad, sets_d, sizes_d, costs_d,
                lr=lrseed, W=W, strategy=strat, n_valid=self.env.n,
                **common, ensemble=self._mi_ensemble,
            )
        elif lowrank:
            from algp_tpu import acquisition_lowrank as acq_lr

            best_d, mean_d, var_d, _ = (
                acq_lr.plan_episode_step_lowrank_factors(
                    self.spec, st.params, self._Xdev,
                    idx_pad, m, ns_pad, y_pad, sets_d, sizes_d, costs_d,
                    lrseed, **common, ensemble=self._mi_ensemble,
                )
            )
        else:
            best_d, mean_d, var_d, _ = acq.plan_episode_step(
                self.spec, st.params, self._Xdev,
                idx_pad, m, ns_pad, y_pad, sets_d, sizes_d, costs_d,
                W, WT, strategy=strat, **common,
            )
        # the step's single synchronizing read
        best, mean, var = jax.device_get((best_d, mean_d, var_d))
        prof["step_s"] = time.perf_counter() - t0
        best = int(best)
        n = self.env.n
        mean, var = np.asarray(mean)[:n], np.asarray(var)[:n]
        self._step_post_var = var  # for _sense('mixed')
        sites = list(batch.sets[best][: batch.sizes[best]])
        return self._host_bundle(
            batch.node_seqs[best], float(batch.costs[best]), sites, mean, var,
        )

    def _current_goal(self, st: EpisodeState) -> Optional[int]:
        """Next unvisited EpisodeConfig.waypoint_goals entry (C11
        goal-conditioned planning), advancing past goals the pose has
        reached; None when no goals are configured / all are visited or
        the strategy plans host-side (uniform/naive ignore goals)."""
        goals = self.cfg.episode.waypoint_goals
        if not goals:
            return None
        while st.goal_i < len(goals) and int(goals[st.goal_i]) == st.pose:
            st.goal_i += 1
        if st.goal_i >= len(goals):
            return None
        return int(goals[st.goal_i])

    def _sense(self, st: EpisodeState, sample_nodes: list):
        """Collect measurements along a path under the modality policy
        (C5, BASELINE.json:11): (samples, trait_rows) — trait_rows is the
        row-aligned all-traits matrix on multi-trait envs, else None
        (under-observed secondary-trait cells are NaN —
        FieldConfig.trait_obs_frac; the NaN pattern IS the observation
        mask, so no separate buffer travels through state/checkpoints).
        "mixed" spends the expensive sensor on the single highest-
        posterior-variance site of the path and the cheap sensor on the
        rest — the paper's two-modality phenotyping setup."""
        policy = self.cfg.episode.modality
        if policy in ("precise", "cheap"):
            s, Y = self._collect(sample_nodes, policy)
            return [s], Y
        if policy != "mixed":
            raise ValueError(f"unknown modality policy {policy!r}")
        site_var = getattr(self, "_step_site_var", None)
        if site_var is not None:  # device-metrics plan: var at the path's
            pv = site_var[: len(sample_nodes)]  # sites, in site order
        elif self._step_post_var is not None:  # computed by the plan already
            pv = np.asarray(self._step_post_var)[np.asarray(sample_nodes)]
        else:
            _, pvar = self._conditioning_state(st, self._noise_vec(st))
            pv = np.asarray(pvar)[np.asarray(sample_nodes)]
        best = int(np.argmax(pv))
        cheap_nodes = [n for i, n in enumerate(sample_nodes) if i != best]
        s0, Y0 = self._collect([sample_nodes[best]], "precise")
        out, Ys = [s0], [Y0]
        if cheap_nodes:
            s1, Y1 = self._collect(cheap_nodes, "cheap")
            out.append(s1)
            Ys.append(Y1)
        Y = np.concatenate(Ys) if self._multi_trait else None
        return out, Y

    def _precision_seed(self, st: EpisodeState, params=None):
        """(W, WT) implicit complement-precision seed, cached per fitted
        params: P = WᵀW − F·ZTᵀ is never materialised (the dense N×N P
        costs 400 MB + a ~95 ms 2N³ seeding matmul at the 10k grid).  One
        Cholesky + blocked tri_inv per refit, dispatched ASYNC (the noise
        model is derived from the params on device — no host read); the
        Schur corrections for the CURRENT sampled set are rebuilt fresh
        inside each step's fused device program (acquisition.
        plan_episode_step → implicit_corrections) — exact w.r.t. W, so
        hundreds of deletes over a long episode cannot accumulate drift
        (see the long-horizon drift test in tests/test_acquisition.py).

        `params` overrides the key/input (default `st.params`) — the
        lagged-refit dispatch seeds for `st.pending_params` before any
        plan consumes them."""
        params = st.params if params is None else params
        cached = self._P_cache
        if cached is None or cached[0] is not params:
            if self.mesh is not None:
                # mesh episode: W built by the distributed strip
                # factorization and KEPT rows-sharded across steps
                # (O(N²/S) per chip; no WT — the sharded step gathers
                # columns from its local strip)
                from algp_tpu.parallel import sharded_episode as sep

                W = sep.sharded_precision_seed(
                    self.mesh, self.spec, params, self._mesh_x(),
                    min_noise=self.cfg.fit.min_noise, nv_mult=self._nv_mult,
                )
                WT = None
            else:
                W, WT = acq.implicit_precision_seed(
                    self.spec, params, self._Xdev,
                    min_noise=self.cfg.fit.min_noise, nv_mult=self._nv_mult,
                )
            self._P_cache = (params, W, WT)
        return self._P_cache[1], self._P_cache[2]

    def _lowrank_z(self):
        """Inducing design for the low-rank episode MI — depends only on
        the (embedded) candidate matrix, so it is computed once per
        episode (recomputed only if a deep-kernel refit re-embeds the
        candidates) instead of per refit.

        Past _KCENTER_SUBSAMPLE candidates the maximin chain runs over a
        uniform 2-axis sub-grid (`_kcenter_subgrid_indices`): the chain
        is m SEQUENTIAL argmax→gather rounds over an (N,) vector —
        1.53 s of measured episode startup at N = 4.19M — and a maximin
        design over a ~4×-coarser uniform grid covers the field the same
        way.  The gate sits above every ≤1M preset, whose designs stay
        bit-identical."""
        c = getattr(self, "_z_cache", None)
        if c is None or c[0] is not self._Xdev:
            from algp_tpu import acquisition_lowrank as acq_lr

            xs = self._Xdev
            if self.env.n > _KCENTER_SUBSAMPLE:
                sub = _kcenter_subgrid_indices(
                    self.env.num_rows, self.env.num_cols, _KCENTER_TARGET
                )
                xs = xs[jnp.asarray(sub)]
            m = min(self._num_inducing, xs.shape[0])
            if self._mi_ensemble > 1:
                # K distinct, equally-dispersed maximin design variants
                # (deterministic start points spread over the candidate
                # set) — the z-ensemble the step averages over
                K = self._mi_ensemble
                zs = [
                    xs[acq_lr.kcenter_indices(
                        xs, m, start=(j * int(xs.shape[0])) // K,
                    )]
                    for j in range(K)
                ]
                self._z_cache = (self._Xdev, jnp.stack(zs))
            else:
                zidx = acq_lr.kcenter_indices(xs, m)
                self._z_cache = (self._Xdev, xs[zidx])
        return self._z_cache[1]

    def _lowrank_seed(self, st: EpisodeState, params=None):
        """LowRankPrecision seed for large-N episode MI (the resolved
        `self._num_inducing` > 0), cached per fitted params —
        the O(N·M²) analogue of `_precision_seed`, dispatched async with
        the noise model derived on device and the episode-cached
        k-center design.  `params` overrides the key/input as in
        `_precision_seed` (the lagged-refit dispatch path)."""
        params = st.params if params is None else params
        cached = self._lr_cache
        if cached is None or cached[0] is not params:
            from algp_tpu import acquisition_lowrank as acq_lr

            if self.mesh is not None:
                # mesh episode: VT/dinv built and KEPT sharded across
                # steps (O(N·M/S) per chip)
                from algp_tpu.parallel import sharded_episode as sep

                lr = sep.sharded_lowrank_seed(
                    self.mesh, self.spec, params, self._mesh_x(),
                    self._lowrank_z(),
                    min_noise=self.cfg.fit.min_noise, nv_mult=self._nv_mult,
                    n_valid=self.env.n,
                )
            elif self._mi_ensemble > 1:
                # z-ensemble: K independent small-factor seeds (one per
                # design variant), tree-stacked to a leading K axis the
                # ensemble step vmaps over.  K async dispatches.
                z_all = self._lowrank_z()  # (K, M, d)
                facs = [
                    acq_lr.lowrank_factors_seed(
                        self.spec, params, self._Xdev, z_all[j],
                        min_noise=self.cfg.fit.min_noise,
                        nv_mult=self._nv_mult,
                        use_pallas=self.env.n >= 4096,
                    )
                    for j in range(self._mi_ensemble)
                ]
                lr = jax.tree_util.tree_map(
                    lambda *ls: jnp.stack(ls), *facs
                )
            else:
                # single chip: SMALL-factor seed — the fused step only
                # reads ~3k precision rows, so the (N, M) V factor is
                # never materialised (halves the 1M re-seed's traffic)
                lr = acq_lr.lowrank_factors_seed(
                    self.spec, params, self._Xdev, self._lowrank_z(),
                    min_noise=self.cfg.fit.min_noise, nv_mult=self._nv_mult,
                    use_pallas=self.env.n >= 4096,
                )
            self._lr_cache = (params, lr)
        return self._lr_cache[1]

    def _dispatch_refit_seed(self, st: EpisodeState, params=None):
        """Dispatch the per-refit precision seed (async) for the given
        params — the exact W/Wᵀ or the low-rank FITC factors, whichever
        the resolved planner uses; a no-op for non-MI strategies (their
        plans have no complement precision to seed)."""
        if self._strategy != "mi":
            return
        if self._num_inducing:
            self._lowrank_seed(st, params)
        else:
            self._precision_seed(st, params)

    # ------------------------------------------------------------ episode

    def run(self, max_steps: int = 1000,
            resume_from: Optional[EpisodeState] = None) -> EpisodeResult:
        """Run (or resume) an episode.  `resume_from` restarts mid-episode
        from a checkpointed EpisodeState (utils.checkpoint) — selection is
        a pure function of that state, so the continuation is exact."""
        ep = self.cfg.episode
        if resume_from is not None:
            st = resume_from
            # multi-trait envs need the checkpoint's (n, T) trait buffer
            # (the pilot rows' traits are unrecoverable after the fact) —
            # fail at the boundary instead of a shape error mid-step
            ckpt_traits = (
                st.y_traits.shape[1] if st.y_traits is not None else 1
            )
            if self._multi_trait or ckpt_traits > 1:
                if ckpt_traits != self.env.num_traits:
                    raise ValueError(
                        f"checkpoint/config trait mismatch: checkpoint has "
                        f"{ckpt_traits} trait column(s), env has "
                        f"{self.env.num_traits} (resume with the same "
                        f"num_traits/value_cols the checkpoint was "
                        f"written with)"
                    )
            if st.rng_state is not None:
                if "agent" in st.rng_state:
                    self.rng.bit_generator.state = st.rng_state["agent"]
                if "env" in st.rng_state:
                    self.env._rng.bit_generator.state = st.rng_state["env"]
        else:
            st = self.pilot_survey()
        # per-step fit keys are derived by fold_in(base, step) so a resumed
        # run uses EXACTLY the keys the uninterrupted run would (a split
        # chain would diverge after resume for restarts > 1)
        base_key = jax.random.PRNGKey(ep.seed)
        t0 = time.perf_counter()
        needs_fit = st.params is None or (
            self.cfg.deep is not None and st.mlp is None
        )
        if needs_fit:
            self.fit_model(st, base_key)
        elif self.cfg.deep is not None:
            # resume: adopt the checkpointed embedding so the saved
            # hyperparameters stay consistent with the candidate matrix
            self._set_mlp(st.mlp)
        t_fit0 = time.perf_counter() - t0
        # the bundle carries the NEXT step's plan together with the
        # CURRENT state's posterior metrics — one fused program / one
        # synchronizing read per step (see _plan_and_metrics)
        t0 = time.perf_counter()
        bundle = self._plan_and_metrics(st)
        # plan wall time is attributed to the step the plan is FOR, so
        # `plan_s` in a step's record times the plan that chose its path
        # (carried across the loop below; semantics changed 2026-08-17 —
        # pre-round-3 artifacts logged the NEXT step's plan instead).
        # The per-phase profile (enum/seed/step) travels with it.
        carry_plan = time.perf_counter() - t0
        carry_prof = getattr(self, "_plan_profile", {})
        self.logger.log(
            step=st.step, phase="pilot" if resume_from is None else "resume",
            n_sampled=len(st.sampled_idx),
            rmse=bundle.rmse,
            rmse_test=bundle.rmse_test,
            mean_var=bundle.mean_var,
            budget_left=st.budget_left,
            fit_s=round(t_fit0, 4),
        )

        capped = False
        while st.budget_left > 0 and st.step < max_steps:
            if bundle.empty:
                break
            if (
                ep.hard_cap
                and len(st.sampled_idx) + len(bundle.sites) > self._max_samples
            ):
                # capacity as a STOP condition (EpisodeConfig.hard_cap):
                # end cleanly instead of growing — growth recompiles
                # every step program AND inflates the cap×N panels,
                # which at the HBM-ceiling presets reads as a pool hang
                self.logger.log(
                    step=st.step, phase="hard_cap",
                    n_sampled=len(st.sampled_idx),
                    budget_left=round(st.budget_left, 3),
                )
                capped = True
                break
            st.step += 1
            nodes, cost, sample_nodes = bundle.nodes, bundle.cost, bundle.sites
            t0 = time.perf_counter()
            samples, trait_rows = self._sense(st, sample_nodes)
            st.sampled_idx = np.concatenate(
                [st.sampled_idx] + [s.indices for s in samples]
            )
            st.y = np.concatenate([st.y] + [s.y for s in samples])
            st.noise_scale = np.concatenate(
                [st.noise_scale] + [s.noise_scale for s in samples]
            )
            if trait_rows is not None:
                st.y_traits = np.concatenate([st.y_traits, trait_rows])
            st.pose = int(nodes[-1])
            st.budget_left -= cost
            t_sense = time.perf_counter() - t0

            refit_due = st.step % self.cfg.episode.refit_every == 0
            t0 = time.perf_counter()
            if ep.lagged_refit:
                # LAGGED refits (EpisodeConfig.lagged_refit): adopt the
                # refit dispatched at the PREVIOUS refit step — its fit +
                # seed programs have had a full step's device+host work to
                # complete, so this step's fused sync drains (at most)
                # their remainder.  The seed caches were populated at
                # dispatch time keyed by this params object — they hit;
                # the other per-params caches auto-miss on identity.
                if st.pending_params is not None:
                    st.params = st.pending_params
                    st.pending_params = None
            elif refit_due:
                self.fit_model(st, base_key)
                self._P_cache = None  # params changed → re-seed precision
                self._lr_cache = None
                # dispatch the per-refit precision seed NOW (async, it
                # depends only on the just-dispatched fit): the host's
                # path enumeration below then overlaps the fit+seed
                # device time instead of serializing it into the next
                # step's sync (the 1M FITC re-seed is O(N·M²) — the
                # largest single device op of a refit step)
                self._dispatch_refit_seed(st)
            t_fit = time.perf_counter() - t0
            # keep rng states in the episode state so a checkpoint written
            # after this step resumes exactly (SURVEY.md §5) — saved
            # BEFORE the next plan is drawn, because _plan_and_metrics
            # consumes agent rng (uniform strategy) and a resumed run
            # re-plans from the checkpointed state
            st.rng_state = {
                "agent": self.rng.bit_generator.state,
                "env": self.env._rng.bit_generator.state,
            }
            t0 = time.perf_counter()
            bundle = self._plan_and_metrics(st)
            t_plan, carry_plan = carry_plan, time.perf_counter() - t0
            prof, carry_prof = carry_prof, getattr(self, "_plan_profile", {})
            if ep.lagged_refit and refit_due:
                # dispatch the refit AFTER the plan synced: the plan at
                # the refit step runs on the incumbent params and never
                # waits on the refit program; the fit + its seed execute
                # while the host senses/enumerates the next step, and the
                # result is adopted just before the plan after next
                t0 = time.perf_counter()
                self.fit_model(st, base_key, lagged=True)
                self._dispatch_refit_seed(st, st.pending_params)
                t_fit += time.perf_counter() - t0
            self.logger.log(
                step=st.step, phase="plan",
                n_sampled=len(st.sampled_idx),
                n_new=len(sample_nodes), path_cost=round(cost, 3),
                rmse=bundle.rmse,
                rmse_test=bundle.rmse_test,
                mean_var=bundle.mean_var,
                budget_left=round(st.budget_left, 3),
                plan_s=round(t_plan, 4), fit_s=round(t_fit, 4),
                sense_s=round(t_sense, 4),
                **{k: round(v, 4) for k, v in prof.items()},
            )

        if (
            ep.lagged_refit and st.pending_params is not None
            and (st.budget_left <= 0 or bundle.empty or capped)
        ):
            # the episode ENDED with a dispatched-but-unconsumed refit:
            # adopt it for the final posterior (strictly fresher hypers;
            # its seed is already cached).  Interrupted runs (max_steps)
            # keep it pending instead, so a resumed run replays the
            # uninterrupted adopt point exactly.
            st.params = st.pending_params
            st.pending_params = None
            bundle.mean = bundle.var = None  # force a fresh final fetch
        mean, var = bundle.mean, bundle.var
        if mean is None:
            # device-metrics mode never shipped the field per step —
            # fetch it ONCE for the final result/plots.  Logged as its
            # own record: at 1M this one-time posterior + transfer is
            # ~0.5-0.7 s and must not be misread as per-step cost
            # (round-2's "unaccounted ~250 ms/step" was mostly this).
            t0 = time.perf_counter()
            mean, var = self.predict_field(st)
            self.logger.log(
                step=st.step, phase="final",
                final_fetch_s=round(time.perf_counter() - t0, 4),
            )
        calib = self.env.calibration(mean, var)
        calib.update(
            {
                k + "_test": val
                for k, val in self.env.calibration(
                    mean, var, test_only=True
                ).items()
            }
        )
        self.logger.log(
            step=st.step, phase="calibration",
            **{k: round(val, 6) for k, val in calib.items()},
        )
        trait_rmse = trait_rmse_test = None
        if self._multi_trait:
            trait_rmse, trait_rmse_test = self._trait_posteriors(st)
            self.logger.log(
                step=st.step, phase="traits",
                trait_rmse=[round(v, 6) for v in trait_rmse],
                trait_rmse_test=[round(v, 6) for v in trait_rmse_test],
            )
        return EpisodeResult(
            state=st, history=self.logger.history,
            mean=mean, var=var, rmse=self.env.rmse(mean),
            rmse_test=self.env.rmse(mean, test_only=True),
            calibration=calib,
            trait_rmse=trait_rmse, trait_rmse_test=trait_rmse_test,
        )

    def _trait_posteriors(self, st: EpisodeState):
        """End-of-episode multi-trait evaluation: ONE batched fit_multi
        over all traits sharing the campaign's plots (traits × restarts ×
        iters in a single jitted program — models.gp.fit_multi), then a
        per-trait posterior mean field and its RMSE vs each trait's own
        observation mask (env.rmse_traits).  Runs once per episode on the
        sampled set, so no per-step program changes; uses the effective
        (possibly deep-embedded) spec/candidates the episode planned
        with.

        FitConfig.multi_fit="icm" swaps the independent per-trait family
        for the coregionalized joint GP (models.coregional): one nT×nT
        system with a learnable trait covariance, fitted ONLY on genuinely
        observed (plot, trait) cells (env.observed_traits — table imputed
        cells are masked out instead of conditioned on), so
        densely-measured traits transfer into sparsely-measured ones."""
        from algp_tpu.models.multifit import multitrait_mean_fields

        # NaN cells in the trait buffer = not measured at that visit
        # (FieldConfig.trait_obs_frac under-observation); the NaN pattern
        # IS the per-visit observation mask, so it survives
        # checkpoint/resume for free.  multifit dispatches the family:
        # batched fit_multi (bit-identical fully-observed default),
        # per-trait ragged fits under partial observation, or the ICM.
        M = multitrait_mean_fields(
            self.spec, self.cfg.fit, self._Xdev,
            np.asarray(st.sampled_idx), st.y_traits, st.noise_scale,
            self.env.observed_traits,
            jax.random.PRNGKey(self.cfg.episode.seed),
            mesh=self.mesh,
        )
        return (self.env.rmse_traits(M),
                self.env.rmse_traits(M, test_only=True))
