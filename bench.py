"""North-star benchmark (BASELINE.json): full active-sampling episode —
multi-restart MLL hyperparameter fit + 50 greedy Krause-MI selections over
a 10k-point field grid — wall-clock on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <x>}
vs_baseline = (1000 ms north-star budget) / measured  (>1 beats the target).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from algp_tpu import acquisition as acq
    from algp_tpu.config import FieldConfig, FitConfig
    from algp_tpu.field import FieldEnv
    from algp_tpu.ops.kernels import KernelSpec

    # 100×100 = 10k-point field grid (BASELINE.json:5), RBF GP
    spec = KernelSpec("rbf", ds=2)
    env = FieldEnv(
        FieldConfig(num_rows=100, num_cols=100, true_ls_spatial=8.0, seed=0),
        spec,
    )
    n = env.n
    fitcfg = FitConfig(iters=100, restarts=4)
    rounds, num_pilot = 50, 32

    pilot = np.linspace(0, n - 1, num_pilot).round().astype(np.int32)
    s = env.collect(pilot, "precise")
    x_pilot = env.X[jnp.asarray(s.indices)]
    y_pilot = jnp.asarray(s.y, jnp.float32)
    pilot_j = jnp.asarray(s.indices, jnp.int32)

    def episode(key):
        """Fit + 50 MI selections as ONE device program — a production
        deployment dispatches the episode once, so the benchmark should
        not pay the ~27 ms relay floor per stage."""
        fit_res, sel = acq.fit_and_select(
            spec, fitcfg, x_pilot, y_pilot, env.X, pilot_j,
            rounds=rounds, num_pilot=num_pilot, strategy="mi", key=key,
        )
        return fit_res.nll, sel.selected

    def run_forced(key):
        """Execute one episode and force completion via a host transfer of
        the small outputs — `block_until_ready` under-reports on this TPU
        plugin for some call patterns; a device→host copy cannot lie."""
        nll, sel = episode(key)
        return float(np.asarray(nll)), np.asarray(sel)

    # warm-up: compile the fused episode program (first compile ~seconds)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    _, sel = run_forced(keys[0])

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        _, sel = run_forced(keys[i + 1])
        times.append(time.perf_counter() - t0)

    ms = float(np.median(times) * 1e3)
    sel_np = sel
    assert len(np.unique(sel_np)) == rounds, "selection degeneracy"
    print(json.dumps({
        "metric": "episode_fit_plus_50_MI_selections_N10000",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(1000.0 / ms, 3),
    }))


if __name__ == "__main__":
    main()
