"""algp-tpu quickstart: the five workloads in ~60 lines.

    python examples/quickstart.py          # runs everything on the default device
"""

import numpy as np
import jax.numpy as jnp

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
