"""Typed configuration for the framework (L5).

The reference threads a single argparse namespace through every constructor
(SURVEY.md §2 C13).  Here configuration is split into small frozen
dataclasses — one per subsystem — plus named presets covering the five
acceptance configs of BASELINE.json:6-12.  The CLI (`algp_tpu.cli`) is a
thin argparse layer that only fills these dataclasses.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

from algp_tpu.ops.kernels import KernelSpec

_SAMPLE_TABLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "sample_field.csv",
)


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Hyperparameter fitting (C4): optimizer on the negative MLL."""

    optimizer: str = "adam"  # "adam" | "lbfgs"
    learning_rate: float = 0.05
    iters: int = 150
    restarts: int = 4  # multi-restart, vmapped across devices if sharded
    perturb: float = 0.5  # log-space init spread across restarts
    init_ls_spatial: float = 1.0
    init_ls_feature: float = 1.0
    init_outputscale: float = 1.0
    init_noise: float = 0.1
    learn_noise: bool = True
    min_noise: float = 1e-3  # floor on noise std for f32 conditioning
    jitter: float = 1e-6
    # Episode-scale SGPR (models/sparse_gp): once the sampled set exceeds
    # sparse_threshold, refits swap the exact O(n³)-per-step MLL fit for
    # the collapsed −ELBO bound over sparse_inducing k-center inducing
    # points (O(n·M²) per step).  0 disables.  The sampled set only
    # grows, so the swap happens at most once per episode (one extra
    # compile).  Requires sparse_threshold ≥ sparse_inducing.
    sparse_threshold: int = 0
    sparse_inducing: int = 256
    # Warm-start refits: after the pilot fit, episode refits start
    # restart 0 from the INCUMBENT params (the optimum moves little when
    # a step adds ~10 points to hundreds) and run refit_iters optimizer
    # steps over refit_restarts inits (the rest stay fresh perturbed
    # draws from the step key).  Best-ever tracking includes the
    # incumbent's own NLL, so a warm refit can never end worse than the
    # params it started from.  0 = disabled (refits are full fits).
    # Why: the refit program is LATENCY-bound (iters sequential small
    # ops, ~150 × ~1 ms), and its device time drains into the next fused
    # step's sync — at 1M it was most of the refit-step overhead.
    refit_iters: int = 0
    refit_restarts: int = 0
    # Multi-trait model family for the end-of-episode / greedy-CLI
    # per-trait evaluation (env.num_traits > 1):
    #   "independent" — batched per-trait exact GPs (models.gp.fit_multi;
    #                   the reference's one-trait-per-run family, default)
    #   "icm"         — coregionalized joint GP (models.coregional):
    #                   cov[f_t(x), f_s(x')] = B[t,s]·k(x,x') with a
    #                   learnable T×T trait covariance B = A Aᵀ + diag κ
    #                   (rank of A = icm_rank) and per-trait noise; fits
    #                   ONLY genuinely observed (plot, trait) cells
    #                   (table imputed cells are masked out), so
    #                   densely-measured traits transfer into sparsely-
    #                   measured ones — measured in
    #                   benchmarks/coregional_study.py
    multi_fit: str = "independent"
    icm_rank: int = 1


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static architecture of the deep-kernel feature embedding φ:
    df → hidden* → out (models/networks.py)."""

    hidden: tuple = (16,)
    out: int = 4
    # tanh keeps embeddings bounded, so the feature lengthscales stay in
    # a sane range and the joint optimization is well-conditioned
    activation: str = "tanh"
    # L2 penalty on the MLP weight matrices added to the −MLL (deep
    # kernel learning overfits the marginal likelihood through the
    # embedding if the weights are unconstrained — the classic DKL
    # pathology; measured in benchmarks/deepkernel_study.py).  0 = off.
    weight_decay: float = 0.0

    def dims(self, df: int) -> list:
        return [df, *self.hidden, self.out]


#: planner auto-selection thresholds (resolve_num_inducing): the exact
#: N×N implicit precision stays the default through the 10k headline
#: grid (the fidelity-contract path); the measured crossover sits at
#: ~20k, where the FITC low-rank planner is 3.2× faster per step AND
#: better on held-out RMSE (59.6 vs 191.0 ms/step, 0.5536 vs 0.5717 —
#: benchmarks/episode20k_lr_r03.json), so auto flips to low-rank just
#: above the last exact-dominant scale.
_EXACT_MAX_N = 16384
#: past ~0.5M candidates the auto rule stops growing M: complement
#: coarseness was measured NOT to matter (re-running the lost 4M field
#: at M = 1024 changed nothing vs 512 — benchmarks/README.md, 4M
#: mechanism section) while HBM panel residency and the O(N·M²) re-seed
#: cost do; M = 512 is the c5_1m/c5_4m-validated setting.
_LOWRANK_M_SMALL, _LOWRANK_M_LARGE = 1024, 512
_LOWRANK_M_CAP_N = 1 << 19


#: strategy="auto" crossover (resolve_strategy): at reference-scale grids
#: (≲50×50) MI measured BETTER than entropy (40×40 paired study:
#: mi−entropy −0.0232 ± 0.0097 significant — strategy_curves_r03_40x40_
#: cpu.json); at the 10k exact-planner scale entropy wins
#: (+0.0218 ± 0.0064 significant — strategy_curves_r03_10k.json); at
#: low-rank scales the yield-aware mi:per_sample is at measured parity
#: with entropy (100k n.s., 4M +0.029 ± 0.027 n.s.; z-ensemble closes the
#: residual design sensitivity) and keeps the MI formulation's
#: redundancy-awareness, so auto keeps the reference's headline strategy
#: wherever it is not measurably worse.  Fixture caveat: the ≤2.5k MI
#: pick is measured on synthetic spatial grids; the c10 TABLE fixture
#: (1000 plots, composite spatial×feature kernel, missing cells) lands
#: on the entropy side (mi−entropy +0.0119 ± 0.0053, ~2.2 sem,
#: strategy_curves_r05_c10.json) — the c10 preset pins strategy="mi"
#: explicitly for reference parity, so auto's small-grid arm never
#: governs it; see benchmarks/README.md round 5.
_MI_SMALL_MAX_N = 2500

#: canonical path-utility names (acquisition.path_set_argmax's cost
#: models) — validated HERE so a typo'd config fails identically on
#: every branch of resolve_strategy (the auto/low-rank arm replaces the
#: utility, which would otherwise skip the Agent's resolved-value check)
PATH_UTILITIES = ("per_cost", "per_sample")

#: canonical multi-trait model-family names (FitConfig.multi_fit) —
#: validated at the episode Agent and the greedy CLI driver
MULTI_FITS = ("independent", "icm")


def resolve_strategy(
    strategy: str, n: int, path_utility: str = "per_cost"
) -> tuple:
    """Resolve `AcquisitionConfig.strategy` against the candidate count:
    "auto" picks the measured-best arm per scale (MI at reference-scale
    grids ≤ ~2.5k, entropy through the exact-planner range ≤ 16k,
    yield-aware mi:per_sample at low-rank scales — see the decision table
    in README.md); any explicit strategy (and the configured path
    utility) is honored unchanged.  Returns (strategy, path_utility).
    NOTE: at low-rank scales "auto" selects per_sample as part of the
    measured-best ARM — the utility is the arm's, not the config's; pin
    strategy="mi" explicitly to keep per_cost there.  The single source
    of strategy selection for the episode Agent and the greedy CLI
    driver, mirroring `resolve_num_inducing`."""
    if path_utility not in PATH_UTILITIES:
        raise ValueError(
            f"unknown path_utility {path_utility!r}; use {PATH_UTILITIES}"
        )
    if strategy != "auto":
        return strategy, path_utility
    if n <= _MI_SMALL_MAX_N:
        return "mi", path_utility
    if n <= _EXACT_MAX_N:
        return "entropy", path_utility
    return "mi", "per_sample"


def resolve_num_inducing(num_inducing: Optional[int], n: int) -> int:
    """Resolve `AcquisitionConfig.num_inducing` against the candidate
    count: None = auto-select the MI planner (0 = exact implicit
    precision at/below the measured-dominant 16k scale, the k-center
    FITC complement with M = 1024 above it, M = 512 past ~0.5M where
    HBM residency governs); an explicit int (including 0 = force exact)
    is honored unchanged.  The single source of planner selection for
    the episode Agent and the greedy CLI driver."""
    if num_inducing is not None:
        return num_inducing
    if n <= _EXACT_MAX_N:
        return 0
    if n <= _LOWRANK_M_CAP_N:
        return _LOWRANK_M_SMALL
    return _LOWRANK_M_LARGE


@dataclasses.dataclass(frozen=True)
class AcquisitionConfig:
    """Greedy active-sampling (C6-C8)."""

    # "mi" | "entropy" | "uniform" | "naive" | "auto" ("auto" resolves
    # against the candidate count — resolve_strategy: the measured-best
    # arm per scale; see the decision table in README.md)
    strategy: str = "mi"
    rounds: int = 50  # BASELINE.json:9 — 50 greedy rounds
    # Low-rank complement precision for strategy="mi" at large N
    # (acquisition_lowrank): None = AUTO (resolve_num_inducing derives
    # the planner from the candidate count: exact ≤ 16k, FITC above the
    # measured ~20k crossover); 0 = force the exact N×N implicit
    # precision (the fidelity-contract path); M > 0 = FITC/Nyström with
    # M k-center inducing points — O(N·M) state, validated to 4.19M.
    num_inducing: Optional[int] = None
    # Path-utility cost model for the episode planner
    # (acquisition.path_set_argmax):
    #   "per_cost"   — information gain per unit path cost (default; the
    #                  reference's rule, bit-identical goldens)
    #   "per_sample" — yield-aware: when samples_per_step caps what a
    #                  path can yield, restrict the argmax to paths
    #                  within ~25 % of the enumeration's best
    #                  cost-per-SAMPLE and rank those by information per
    #                  expected sample.  Fixes MI's measured long-path
    #                  budget pathology at ultra-sparse coverage (the
    #                  4.19M ladder top: per-cost MI bought 168 samples
    #                  in 9 long paths where entropy bought ~200 in
    #                  15-16 short ones — benchmarks/README.md).
    path_utility: str = "per_cost"
    # z-ENSEMBLE MI (low-rank planner only): K > 1 builds K
    # independent k-center design variants (distinct deterministic
    # maximin start points), seeds K complement precisions per refit,
    # and AVERAGES the K MI scores before the utility argmax.  Targets
    # the measured inducing-design sensitivity at ultra-sparse coverage
    # (4.19M: equally-dispersed designs moved one field's RMSE
    # 1.02 → 0.53 and raising M did not help — benchmarks/README.md);
    # costs K× the per-refit seed and the per-step correction work.
    # 1 = single-design (bit-identical default).
    mi_ensemble: int = 1
    # NOTE: no refresh knob — the episode's Krause-MI complement
    # precision rebuilds its Schur corrections from the per-refit seed
    # inverse in one batched op per replan (acquisition.
    # implicit_corrections), so delete-chain drift cannot accumulate.


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Row-structured field environment (C10)."""

    num_rows: int = 25  # crop rows
    num_cols: int = 40  # ranges along each row
    num_features: int = 0  # per-point feature dims (genotype-like)
    row_spacing: float = 1.0
    col_spacing: float = 1.0
    # synthetic ground-truth GP sample parameters
    true_ls_spatial: float = 4.0
    true_ls_feature: float = 1.0
    true_outputscale: float = 1.0
    noise_std: float = 0.1  # precise-sensor noise std
    cheap_noise_mult: float = 5.0  # cheap/noisy modality multiplier (C5)
    data_path: Optional[str] = None  # real phenotype table (CSV) if given
    # synthetic ground truth past the dense-Cholesky ceiling: M > 0 draws
    # the field from the FITC approximation N(0, Q + diag(k − q)) over M
    # k-center inducing points — O(n·M) instead of the O(n³)/O(n²) dense
    # factor (field.py _synthesize; enables 100k-point grids)
    synth_inducing: int = 0
    # multi-trait phenotyping: >1 synthetic traits (independent GP draws),
    # or the table value columns to load (first is the planning trait);
    # fitted jointly by models.gp.fit_multi (one batched program)
    num_traits: int = 1
    value_cols: Optional[tuple] = None
    # under-observation of SECONDARY traits (t ≥ 1) during collection:
    # each visited plot measures trait 0 always (the cheap/dense planning
    # trait — drone height) but measures each secondary trait only with
    # probability trait_obs_frac (expensive/destructive assays — biomass).
    # collect_traits returns the per-visit observation mask; unobserved
    # cells are NaN in Y and excluded from every fit (the coregionalized
    # multi_fit="icm" family transfers the dense trait into the sparse
    # ones there — benchmarks/coregional_study.py).  1.0 = measure
    # everything (bit-identical default; the Bernoulli draw is skipped so
    # the env rng stream is unchanged).
    trait_obs_frac: float = 1.0
    # cross-trait correlation of SYNTHETIC multi-trait fields: ρ > 0 mixes
    # the T independent GP draws through the Cholesky factor of the
    # equicorrelation matrix (1 on the diagonal, ρ off it) — the exact
    # generative family of the ICM (models.coregional) with B = R Rᵀ.
    # Trait 0 (the planning trait) is unchanged by the mixing (the factor's
    # first row is e₀).  0.0 = independent draws (bit-identical default);
    # ignored for table data and single-trait fields.
    trait_corr: float = 0.0
    # nonlinear feature→response structure for SYNTHETIC fields: "none"
    # draws truth from the stationary composite GP over the raw features
    # (a stationary feature kernel is then perfectly specified); "tanh"
    # warps the features through a fixed random two-layer tanh map ψ
    # BEFORE the truth kernel while the env still exposes the RAW
    # features — the mis-specified regime where a learned deep feature
    # kernel (models/networks.py) has something to learn
    # (benchmarks/deepkernel_study.py).  Ignored for table data.
    feature_warp: str = "none"
    seed: int = 0

    @property
    def num_points(self) -> int:
        return self.num_rows * self.num_cols


@dataclasses.dataclass(frozen=True)
class EpisodeConfig:
    """Informative-path episode orchestration (C12)."""

    num_pilot: int = 32  # pilot-survey samples
    budget: float = 200.0  # total path budget (config 5)
    num_waypoints: int = 8  # planning horizon: paths per replan
    samples_per_step: int = 10
    # Minimum path cost as a fraction of the per-step budget slice
    # (planning.enumerate_paths min_cost_frac): the enumeration drops
    # shorter paths before the utility ever sees them, so this floor
    # bounds the cheapest sample price a step can buy.  0.5 is the
    # long-standing default (short stubs waste replanning overhead);
    # lowering it widens the price range the yield-aware
    # path_utility="per_sample" can exploit at ultra-sparse coverage —
    # more, shorter steps for the same travel budget (size
    # max_samples/hard_cap for the step count it implies).
    min_cost_frac: float = 0.5
    # GOAL-CONDITIONED planning (SURVEY.md §2 C11 `[R]`: path
    # enumeration "between current pose and goal"): an ordered tuple of
    # grid indices the robot must visit.  Each informative step then
    # enumerates only budgeted paths ENDING at the next unvisited goal
    # (planning.enumerate_paths(goal=...)); once the pose reaches it,
    # planning targets the next one.  A goal unreachable within the
    # current budget slice falls back to free enumeration for that step
    # (logged as goal_fallback).  None = free enumeration everywhere.
    waypoint_goals: Optional[tuple] = None
    refit_every: int = 1  # refit hyperparams every k model updates
    # sensing-modality policy per planning step (C5 / BASELINE.json:11):
    #   "precise" — slow/accurate sensor everywhere
    #   "cheap"   — fast/noisy sensor everywhere
    #   "mixed"   — cheap along the path, one precise measurement at the
    #               path's highest-variance site (the paper's two-modality
    #               phenotyping story)
    modality: str = "precise"
    # Per-step posterior metrics reduced ON DEVICE (episode returns
    # scalars instead of the full mean/var fields each sync; the field is
    # fetched once at episode end).  None = auto: on for grids ≥ 16 384
    # points, where the per-step mean/var transfer through the relay
    # tunnel stops hiding in the sync floor (~190 ms/step at 1M points).
    device_metrics: Optional[bool] = None
    # Static training-buffer capacity (sampled-set slots).  None = derive
    # from the budget: ceil(num_waypoints / min_cost_frac) full steps plus
    # fallback-stub slack, × samples_per_step, + pilots (episode.Agent).
    # Set explicitly for campaigns whose step costs undershoot the
    # planner's min_cost_frac — outgrowing the capacity mid-episode
    # recompiles every step program (30 s–5 min each on a remote-compile
    # TPU plugin; the Agent warns when it happens).
    max_samples: Optional[int] = None
    # LAGGED refits (round-4 VERDICT #1 / SURVEY §8c item 13): the refit
    # dispatched at step t is CONSUMED one plan later — the plan at the
    # refit step itself runs on the incumbent params (dispatched BEFORE
    # the fit, so its sync never waits on the refit program), and the
    # fit+seed device time overlaps the next step's host sense +
    # enumeration instead of draining into the refit step's fused sync.
    # Decision semantics change: plans at refit steps use one-refit-stale
    # hyperparameters (the conditioning still sees every sample —
    # only the kernel hypers lag).  Quality + per-step profiles measured
    # in benchmarks/README.md (lagged-refit study).  Excluded for deep
    # kernels (the refit re-embeds the candidate matrix — lagging would
    # desync the embedding from the params consuming it).
    lagged_refit: bool = False
    # hard_cap=True turns max_samples into a STOP condition: the episode
    # ends (as if the budget ran out) instead of growing the static
    # capacity when the next path's samples would not fit.  For presets
    # at the HBM ceiling (c5_4m), where capacity growth both recompiles
    # every step program AND inflates the two cap×N panels toward the
    # transient-OOM band, a clean stop is strictly better than a stall
    # (ADVICE r3: a seed whose paths cost less than a full slice can
    # outgrow a single-seed-calibrated cap mid-episode).
    hard_cap: bool = False
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    kernel: KernelSpec = KernelSpec()
    fit: FitConfig = FitConfig()
    acquisition: AcquisitionConfig = AcquisitionConfig()
    field: FieldConfig = FieldConfig()
    episode: EpisodeConfig = EpisodeConfig()
    # deep feature kernel: learned MLP embedding of the feature columns,
    # trained jointly with the hyperparameters (models/networks.py);
    # None = plain stationary kernel on the raw features
    deep: Optional[MLPSpec] = None


# ---------------------------------------------------------------------------
# Presets — the five acceptance configs (BASELINE.json:6-12)
# ---------------------------------------------------------------------------

PRESETS: dict[str, ExperimentConfig] = {
    # 1. Exact GP, RBF, synthetic 2-D field (~1k pts): MLL fit + posterior.
    "c1_rbf_fit": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="rbf", ds=2, df=0),
        field=FieldConfig(num_rows=25, num_cols=40),
        fit=FitConfig(restarts=1),
    ),
    # 2. Matérn + composite spatial×feature, multi-restart Adam/L-BFGS.
    "c2_composite_restarts": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern52", feature_kind="rbf", ds=2, df=3),
        field=FieldConfig(num_rows=25, num_cols=40, num_features=3),
        fit=FitConfig(restarts=4, optimizer="adam"),
    ),
    # 3. Greedy entropy-based active sampling, 50 rounds, rank-1 updates.
    "c3_entropy": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="rbf", ds=2, df=0),
        field=FieldConfig(num_rows=25, num_cols=40),
        acquisition=AcquisitionConfig(strategy="entropy", rounds=50),
    ),
    # 4. Krause-MI acquisition with incremental up/downdates.
    "c4_mi": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="rbf", ds=2, df=0),
        field=FieldConfig(num_rows=25, num_cols=40),
        acquisition=AcquisitionConfig(strategy="mi", rounds=50),
    ),
    # 5. Full informative-path episode with heteroscedastic noise.
    "c5_episode": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=25, num_cols=40),
        acquisition=AcquisitionConfig(strategy="mi"),
        episode=EpisodeConfig(num_pilot=32, budget=200.0),
    ),
    # 5 at north-star scale: the 100×100 = 10k-point grid of the headline
    # benchmark (BASELINE.json:5), driven through the full path episode.
    "c5_10k": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=100, num_cols=100, true_ls_spatial=8.0),
        acquisition=AcquisitionConfig(strategy="mi"),
        # warm refits: held-out RMSE within 0.0002 of full refits over
        # paired seeds (benchmarks/README.md round-3 study); the refit
        # program is the dominant refit-step drain
        fit=FitConfig(refit_iters=60, refit_restarts=2),
        episode=EpisodeConfig(num_pilot=64, budget=400.0, num_waypoints=8,
                              samples_per_step=10, refit_every=4),
    ),
    # 5 at 2× north-star scale (140×140 = 19.6k points): the measured
    # planner crossover.  num_inducing is left at None so the AUTO rule
    # (resolve_num_inducing) picks the FITC low-rank planner with
    # M = 1024 — 59.6 vs the exact planner's 191.0 ms/step with BETTER
    # held-out RMSE (0.5536 vs 0.5717, benchmarks/episode20k_lr_r03.
    # json).  Force the exact machinery's headroom proof (W/Wᵀ ≈ 3.1 GB
    # HBM) explicitly with --num-inducing 0.
    "c5_20k": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=140, num_cols=140, true_ls_spatial=11.0),
        acquisition=AcquisitionConfig(strategy="mi"),
        fit=FitConfig(refit_iters=60, refit_restarts=2),
        episode=EpisodeConfig(num_pilot=64, budget=560.0, num_waypoints=8,
                              samples_per_step=10, refit_every=4),
    ),
    # 5 at 10× north-star scale (320×320 = 102.4k points): the low-rank
    # regime — FITC field synthesis (synth_inducing) + inducing-point MI
    # complement precision (num_inducing); the exact machinery's N² seed
    # would need ~40 GB HBM here.
    # Warm refits at the RETUNED 100/3 schedule (round-5): the round-3
    # rejection was schedule-specific — 60/2 loses 0.034 held-out RMSE on
    # the hard seed-1 field (reproduced in the round-5 paired study,
    # benchmarks/warmrefit_100k_r05.json) while 100/3 is n.s. over 5
    # paired seeds (−0.0023 ± 0.0023; 2 seeds decision-identical) and
    # cuts the after-refit plan drain 156.7 → 103.8 ms (steady 87.8 →
    # 76.6 ms/step).
    "c5_100k": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=320, num_cols=320, true_ls_spatial=25.0,
                          synth_inducing=2048),
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=1024),
        fit=FitConfig(refit_iters=100, refit_restarts=3),
        episode=EpisodeConfig(num_pilot=128, budget=1280.0, num_waypoints=8,
                              samples_per_step=10, refit_every=4),
    ),
    # 5 at 100× north-star scale (1024×1024 ≈ 1.05M points): the
    # million-candidate regime on ONE chip — M = 512 keeps the low-rank
    # working set (~10 GB incl. the padded conditioning/correction
    # buffers) inside a 16 GB HBM.
    "c5_1m": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=1024, num_cols=1024,
                          true_ls_spatial=80.0, synth_inducing=1024),
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=512),
        # warm refits: bit-equal held-out RMSE on 3 paired seeds at 60/2
        # (40 iters was measurably worse on ALL seeds — don't lower)
        fit=FitConfig(refit_iters=60, refit_restarts=2),
        episode=EpisodeConfig(num_pilot=128, budget=4096.0,
                              num_waypoints=8, samples_per_step=10,
                              refit_every=4),
    ),
    # 5 at 400× north-star scale (2048×2048 ≈ 4.19M points): the
    # ladder's ceiling probe on one chip.  The dominant residency is the
    # fused step's two cap×N f32 panels (K rows + conditioned basis,
    # ~5.9 GB each at cap≈352) — budget/waypoints are chosen to keep
    # cap at the c5_1m level; M = 512 low-rank state is O(N·M)-free
    # (small-factor seed).
    "c5_4m": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=2048, num_cols=2048,
                          true_ls_spatial=160.0, synth_inducing=512),
        # path_utility="per_sample": at this coverage sparsity the
        # per-cost rule spent every seed's budget in 9-10 long paths
        # (168-176 samples) and lost a field at 0.95; the yield-aware
        # rule buys 12 short steps (186-191 samples) and wins the
        # 5-seed paired study outright (0.545 ± 0.029 vs 0.721 ± 0.072,
        # paired diff +0.176 ± 0.079 significant —
        # strategy_curves_r04_4m_ps.json), matching entropy (the
        # scale's robustness reference, 0.518 ± 0.0067) on 4/5 fields.
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=512,
                                      path_utility="per_sample"),
        fit=FitConfig(refit_iters=60, refit_restarts=2),
        # cap slots cost 2·N·4 B ≈ 33.5 MB EACH at 4.19M (the two
        # cap×N panels).  max_samples 224 covers the 5-seed measured
        # range of the per-sample economics (186-191 samples, 12 steps)
        # with ~4 steps of slack at ~7.5 GB of panels (all 10 study
        # episodes ran clean at this cap); hard_cap stops the episode
        # instead of growing past it — growth here would both recompile
        # every step program and push panel residency toward the
        # transient-OOM band (ADVICE r3).  (The 2026-08-17 "cap 352
        # OOMed by 259 MB" diagnosis was wrong: that overage reproduced
        # at cap 272 and was the monolithic (M, N) field-synthesis
        # buffer, since streamed — see field._SYNTH_CHUNK.)
        episode=EpisodeConfig(num_pilot=96, budget=8192.0,
                              num_waypoints=8, samples_per_step=8,
                              refit_every=4, max_samples=224,
                              hard_cap=True),
    ),
    # 5 as a LONG CAMPAIGN at north-star scale: a budget funding ~160
    # planning steps (~1.7k samples) on the 10k grid — the regime where
    # the exact O(n³)-per-step refit stops being free.  Past 512 sampled
    # points every refit swaps to the collapsed SGPR bound over 256
    # k-center inducing points (FitConfig.sparse_threshold; one extra
    # compile at the crossover, then steady-state).
    "c5_long": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=100, num_cols=100, true_ls_spatial=8.0),
        acquisition=AcquisitionConfig(strategy="mi"),
        fit=FitConfig(restarts=4, sparse_threshold=512, sparse_inducing=256,
                      refit_iters=60, refit_restarts=2),
        episode=EpisodeConfig(num_pilot=64, budget=4800.0, num_waypoints=80,
                              samples_per_step=10, refit_every=4),
    ),
    # LONG CAMPAIGN at the MILLION-point grid: the two scale subsystems
    # combined — low-rank (FITC) MI planning over N = 1.05M candidates
    # AND episode-scale SGPR refits once the sampled set passes 512.
    # Budget funds ~42 planning steps (~548 samples measured at seed 0 —
    # paths here cost a full slice, not c5_long's half); max_samples
    # pre-sizes the static buffers (capacity growth = full recompiles)
    # and keeps the fused step's two cap×N panels at 2·640·N·4 B
    # ≈ 5.4 GB (a 960-cap first attempt hit a transient runtime
    # ResourceExhausted at ~8 GB of panels — keep the headroom).
    "c5_1m_long": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern32", ds=2, df=0),
        field=FieldConfig(num_rows=1024, num_cols=1024,
                          true_ls_spatial=80.0, synth_inducing=1024),
        acquisition=AcquisitionConfig(strategy="mi", num_inducing=512),
        fit=FitConfig(sparse_threshold=512, sparse_inducing=256,
                      refit_iters=60, refit_restarts=2),
        episode=EpisodeConfig(num_pilot=128, budget=20480.0,
                              num_waypoints=40, samples_per_step=10,
                              refit_every=4, max_samples=640),
    ),
    # Real-table experiment (SURVEY.md §2 C10): phenotype CSV with genotype
    # features, composite spatial×feature kernel, mixed sensing modalities.
    "c10_table": ExperimentConfig(
        kernel=KernelSpec(spatial_kind="matern52", feature_kind="rbf",
                          ds=2, df=3),
        field=FieldConfig(num_rows=25, num_cols=40, num_features=3,
                          data_path=_SAMPLE_TABLE),
        acquisition=AcquisitionConfig(strategy="mi"),
        episode=EpisodeConfig(num_pilot=32, budget=120.0, modality="mixed"),
    ),
}
