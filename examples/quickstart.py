"""algp-tpu quickstart: the core workloads, one screenful each.

    python examples/quickstart.py          # runs everything on the default device
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algp_tpu import acquisition as acq
from algp_tpu.config import (
    AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig, FitConfig,
)
from algp_tpu.episode import Agent
from algp_tpu.field import FieldEnv
from algp_tpu.models import ExactGP
from algp_tpu.ops.kernels import KernelSpec

# 1. Exact GP regression on a synthetic field ------------------------------
env = FieldEnv(FieldConfig(num_rows=20, num_cols=30, seed=0))
rng = np.random.default_rng(0)
train = rng.choice(env.n, 100, replace=False)
s = env.collect(train, "precise")
gp = ExactGP(KernelSpec("rbf", ds=2), FitConfig(iters=120, restarts=2))
gp.fit(np.asarray(env.X)[s.indices], s.y)
mean, var = gp.predict(env.X)
print(f"1. RBF GP:        RMSE {env.rmse(np.asarray(mean)):.3f} "
      f"(prior {env.rmse(np.zeros(env.n)):.3f})")

# 2. Composite spatial×feature Matérn kernel, multi-restart ----------------
spec_c = KernelSpec("matern52", "rbf", ds=2, df=3)
env_c = FieldEnv(FieldConfig(num_rows=15, num_cols=20, num_features=3, seed=1),
                 spec_c)
s2 = env_c.collect(rng.choice(env_c.n, 80, replace=False))
gp2 = ExactGP(spec_c, FitConfig(iters=80, restarts=3, optimizer="adam"))
res2 = gp2.fit(np.asarray(env_c.X)[s2.indices], s2.y)
print(f"2. composite GP:  best NLL {float(res2.nll):.1f} "
      f"across {len(np.asarray(res2.all_nlls))} restarts")

# 3 & 4. Greedy entropy / Krause-MI active sampling ------------------------
params = gp.params
nv = jnp.full((env.n,), float(np.exp(2 * params.log_noise)), jnp.float32)
pilot = jnp.asarray(s.indices[:20], jnp.int32)
for strategy in ("entropy", "mi"):
    sel = acq.greedy_select(
        gp.spec, params, env.X, nv, pilot,
        rounds=25, num_pilot=20, strategy=strategy,
    )
    print(f"3/4. {strategy:8s}: picked {len(set(np.asarray(sel.selected).tolist()))} "
          f"distinct sites, mean posterior var "
          f"{float(jnp.mean(sel.post_var)):.3f}")

# 5. Full informative-path episode -----------------------------------------
cfg = ExperimentConfig(
    kernel=KernelSpec("matern32", ds=2),
    fit=FitConfig(iters=50, restarts=1),
    acquisition=AcquisitionConfig(strategy="mi"),
    field=FieldConfig(num_rows=10, num_cols=16, seed=2),
    episode=EpisodeConfig(num_pilot=12, budget=80.0, num_waypoints=6,
                          samples_per_step=5, modality="mixed"),
)
env5 = FieldEnv(cfg.field, cfg.kernel)
result = Agent(env5, cfg).run()
print(f"5. episode:       RMSE {result.history[0]['rmse']:.3f} → "
      f"{result.rmse:.3f} in {result.state.step} steps, "
      f"{len(result.state.sampled_idx)} samples")

# 6. Multi-trait phenotyping (beyond the reference) -------------------------
from algp_tpu.models import gp as gp_mod

env6 = FieldEnv(FieldConfig(num_rows=8, num_cols=10, num_traits=3, seed=6))
idx6, Y6, _, _ = env6.collect_traits(np.arange(0, env6.n, 2), "precise")
res6 = gp_mod.fit_multi(
    KernelSpec("rbf", ds=2), FitConfig(iters=60, restarts=2),
    env6.X[jnp.asarray(idx6)], jnp.asarray(Y6, jnp.float32),
)
print(f"6. multi-trait:   {Y6.shape[1]} traits fit in ONE batched program, "
      f"NLLs {np.round(np.asarray(res6.nll), 1).tolist()}")

# 7. Deep feature kernel (learned embedding, beyond the reference) ----------
from algp_tpu.config import MLPSpec
from algp_tpu.models import networks as nets

rng7 = np.random.default_rng(7)
xy7 = rng7.uniform(0, 10, (150, 2))
u7 = rng7.uniform(-2, 2, (150, 1))
y7 = (2.0 * (u7[:, 0] > 0) - 1 + 0.05 * rng7.standard_normal(150)).astype(np.float32)
x7 = np.concatenate([xy7, u7], 1).astype(np.float32)
res7 = nets.fit_deep(
    KernelSpec("rbf", "rbf", ds=2, df=1), MLPSpec(hidden=(16,), out=3),
    FitConfig(iters=100, restarts=2), jnp.asarray(x7), jnp.asarray(y7),
)
print(f"7. deep kernel:   MLP embedding + hypers jointly fit, "
      f"NLL {float(res7.nll):.1f}")

# 8. Large-N regime: low-rank MI + sparse GP (beyond the reference) ---------
from algp_tpu import acquisition_lowrank as acq_lr
from algp_tpu.models.sparse_gp import SparseGP

zidx = acq_lr.kcenter_indices(env.X, 60)          # inducing design
sel8 = acq_lr.greedy_select_lowrank(
    gp.spec, params, env.X, nv, pilot, env.X[zidx],
    rounds=25, num_pilot=20,
)  # same MI semantics, O(N·M) state — scales to 100k+ candidates
sgp = SparseGP(KernelSpec("rbf", ds=2), num_inducing=60,
               fit_config=FitConfig(iters=80, restarts=2))
sgp.fit(np.asarray(env.X)[s.indices], s.y)
mean8, _ = sgp.predict(env.X)
print(f"8. large-N:       low-rank MI picked "
      f"{len(set(np.asarray(sel8.selected).tolist()))} distinct sites; "
      f"SGPR RMSE {env.rmse(np.asarray(mean8)):.3f}")

# 9. Multi-chip: the full episode sharded over a device mesh ----------------
# (runs on any mesh with a 'grid' axis; on a CPU host start python with
#  XLA_FLAGS=--xla_force_host_platform_device_count=8 to see 8 devices)
import jax

from algp_tpu.parallel import make_mesh

if len(jax.devices()) > 1:
    mesh = make_mesh(len(jax.devices()))
    env9 = FieldEnv(cfg.field, cfg.kernel)
    r9 = Agent(env9, cfg, mesh=mesh).run()   # same decisions as #5,
    print(f"9. mesh episode:  RMSE {r9.rmse:.3f} on "  # O(N/S) rows/chip
          f"{mesh.devices.size} devices (paths ≡ single-device)")
else:
    print("9. mesh episode:  skipped (one device visible)")

# 10. Long campaigns: SGPR refits past a sampled-set threshold --------------
import dataclasses

cfg10 = dataclasses.replace(
    cfg,
    fit=dataclasses.replace(cfg.fit, sparse_threshold=40, sparse_inducing=32),
    episode=dataclasses.replace(cfg.episode, budget=160.0, num_waypoints=12),
)
env10 = FieldEnv(cfg10.field, cfg10.kernel)
r10 = Agent(env10, cfg10).run()
print(f"10. long campaign: {len(r10.state.sampled_idx)} samples — refits "
      f"switched to the collapsed SGPR bound past 40 (6x cheaper at n≈1k)")

# 11. Warm refits: incumbent-seeded refit schedule (round-3) ----------------
# the refit program is latency-bound (iters sequential small ops); after
# the pilot fit, refits start restart 0 from the incumbent and run a
# shrunk schedule — never worse than the incumbent by construction.
# Scale presets (c5_10k/20k/1m/long) ship with the measured-safe 60/2.
cfg11 = dataclasses.replace(
    cfg, fit=dataclasses.replace(cfg.fit, refit_iters=60, refit_restarts=2)
)
env11 = FieldEnv(cfg11.field, cfg11.kernel)
r11 = Agent(env11, cfg11).run()
print(f"11. warm refits:  RMSE {r11.rmse:.3f} (refit device time ~2.5x "
      f"cheaper; quality measured per preset — see benchmarks/README.md)")

# 12. Deep feature kernel on a latent-factor field (round-3) ----------------
# truth depends on 8 features only through 2 nonlinear factors; the
# stationary ARD kernel cannot rotate into the factor subspace, the
# learned embedding can (needs data: wins at n~800, overfits at n~320 —
# keep MLPSpec.weight_decay on).
from algp_tpu.config import FieldConfig, MLPSpec

cfg12 = dataclasses.replace(
    cfg,
    kernel=KernelSpec("matern52", "rbf", ds=2, df=8),
    field=FieldConfig(num_rows=20, num_cols=30, num_features=8,
                      feature_warp="tanh", true_ls_feature=0.8, seed=0),
    deep=MLPSpec(hidden=(16,), out=8, weight_decay=0.1),
)
env12 = FieldEnv(cfg12.field, cfg12.kernel)
r12 = Agent(env12, cfg12).run(max_steps=6)
print(f"12. deep kernel:  RMSE {r12.rmse:.3f} on a warped-feature field "
      f"(embedding trained jointly with the MLL inside the episode)")

# 13. Round-4: planner auto-selection + yield-aware utility + z-ensemble ----
# num_inducing=None (the default) auto-picks exact vs FITC low-rank from
# the candidate count (exact <= 16k, low-rank above the measured ~20k
# crossover); path_utility="per_sample" makes the path argmax yield-aware
# (the 4.19M default); mi_ensemble=K averages MI scores over K k-center
# design variants (the robustness-parity option at ultra-sparse coverage).
cfg13 = dataclasses.replace(
    cfg,
    acquisition=AcquisitionConfig(strategy="mi", num_inducing=48,
                                  path_utility="per_sample",
                                  mi_ensemble=3),
)
env13 = FieldEnv(cfg13.field, cfg13.kernel)
r13 = Agent(env13, cfg13).run()
print(f"13. r4 planner:   RMSE {r13.rmse:.3f} (low-rank MI, yield-aware "
      f"utility, 3-design z-ensemble)")

# 14. Round-4: goal-conditioned (waypoint) campaigns — C11 goal mode --------
# paths are enumerated BETWEEN the pose and each goal; the episode visits
# the waypoints in order, falling back to a free step when a goal outruns
# the current budget slice.
env14 = FieldEnv(cfg.field, cfg.kernel)
goals = (env14.rowcol_to_index(2, 15), env14.rowcol_to_index(5, 0))
cfg14 = dataclasses.replace(
    cfg, episode=dataclasses.replace(cfg.episode, waypoint_goals=goals),
)
r14 = Agent(env14, cfg14).run()
print(f"14. waypoints:    visited {r14.state.goal_i}/{len(goals)} goals, "
      f"RMSE {r14.rmse:.3f} (goal-conditioned enumeration, C11)")

# 15. Exact mid-episode checkpoint / resume ----------------------------------
# EpisodeState (samples, fitted params, RNG) is a tiny npz; selection is
# a pure function of it, so the resumed run reproduces the uninterrupted
# one sample-for-sample.
import tempfile

from algp_tpu.utils import checkpoint as ckpt

env15a = FieldEnv(cfg.field, cfg.kernel)
half = Agent(env15a, cfg).run(max_steps=3)           # interrupt after 3 steps
path15 = os.path.join(tempfile.mkdtemp(), "episode.npz")
ckpt.save(path15, half.state)
env15b = FieldEnv(cfg.field, cfg.kernel)             # fresh process stand-in
r15 = Agent(env15b, cfg).run(resume_from=ckpt.load(path15))
full15 = Agent(FieldEnv(cfg.field, cfg.kernel), cfg).run()
same = np.array_equal(r15.state.sampled_idx, full15.state.sampled_idx)
print(f"15. resume:       interrupted@3 + resume ≡ uninterrupted: {same} "
      f"({len(r15.state.sampled_idx)} samples, RMSE {r15.rmse:.3f})")

# 16. Coregionalized multi-trait GP (ICM, beyond the reference) --------------
# correlated traits, secondary trait observed at only a fraction of
# plots: the learnable trait covariance B transfers the dense trait's
# information into the sparse one (benchmarks/coregional_study.py —
# sparse-trait RMSE 0.63→0.42 at 20% observation, paired-significant).
from algp_tpu.models import coregional as icm

env16 = FieldEnv(FieldConfig(num_rows=8, num_cols=10, num_traits=2,
                             trait_corr=0.9, seed=16))
idx16, Y16, _, _ = env16.collect_traits(np.arange(0, env16.n, 2), "precise")
mask16 = np.ones_like(Y16, bool)
mask16[::3, 1] = False                               # trait 1 under-observed
mean16, _, res16 = icm.fit_predict_icm(
    KernelSpec("rbf", ds=2), FitConfig(iters=60, restarts=2),
    env16.X[jnp.asarray(idx16)], jnp.asarray(Y16, jnp.float32), env16.X,
    jnp.asarray(mask16), rank=1,
)
B16 = np.asarray(icm.trait_cov(res16.params))
corr16 = B16[0, 1] / np.sqrt(B16[0, 0] * B16[1, 1])
print(f"16. ICM:          fitted cross-trait corr {corr16:.2f} "
      f"(true 0.9), per-trait RMSE "
      f"{[round(v, 3) for v in env16.rmse_traits(np.asarray(mean16))]}")
