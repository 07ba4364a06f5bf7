"""North-star benchmark (BASELINE.json): full active-sampling episode —
multi-restart MLL hyperparameter fit + 50 greedy Krause-MI selections over
a 10k-point field grid — wall-clock on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <x>, ...}
vs_baseline = (1000 ms north-star budget) / measured  (>1 beats the target).

Variance discipline (the shared TPU pool has a 165–220 ms daily band AND
degradation episodes where a trivial op takes minutes — see
benchmarks/README.md): before measuring, a tiny jitted program is timed as
a POOL-HEALTH PROBE; the measurement is retried once if the probe exceeds
its healthy band.  The JSON carries the probe reading, all per-rep times,
the median (the value of record) AND the min (the best-case floor, least
pool-noise-sensitive) so a regression can be told apart from a busy pool.
"""

from __future__ import annotations

import json
import time

import numpy as np

#: a healthy pool services a tiny jitted call in one relay sync (~27 ms
#: floor, ≲100 ms with jitter); above this the pool is degraded/busy.
_PROBE_HEALTHY_MS = 150.0
_REPS = 9


def _probe_ms(jax, jnp) -> float:
    """Dispatch-floor reading: tiny jitted reduce + scalar transfer,
    min over 3 warm reps (compile excluded by the first call)."""
    f = jax.jit(lambda a: jnp.sum(a * a))
    x = jnp.arange(1024, dtype=jnp.float32)
    float(np.asarray(f(x)))  # compile + connect
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        times.append(time.perf_counter() - t0)
    return float(min(times) * 1e3)


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

    def measure(keys):
        times = []
        sel = None
        for k in keys:
            t0 = time.perf_counter()
            _, sel = run_forced(k)
            times.append(time.perf_counter() - t0)
        return times, sel

    keys = jax.random.split(jax.random.PRNGKey(0), 2 * _REPS + 2)
    probe0 = _probe_ms(jax, jnp)
    # warm-up: compile the fused episode program (first compile ~seconds)
    _, sel = run_forced(keys[0])

    times, sel = measure(keys[1 : _REPS + 1])
    probe1 = _probe_ms(jax, jnp)
    retried = False
    if max(probe0, probe1) > _PROBE_HEALTHY_MS:
        # pool degraded during the window — one retry with fresh keys
        retried = True
        time.sleep(10.0)
        probe0 = _probe_ms(jax, jnp)
        times, sel = measure(keys[_REPS + 1 : 2 * _REPS + 1])
        probe1 = _probe_ms(jax, jnp)

    ms = float(np.median(times) * 1e3)
    assert len(np.unique(sel)) == rounds, "selection degeneracy"
    print(json.dumps({
        "metric": "episode_fit_plus_50_MI_selections_N10000",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(1000.0 / ms, 3),
        "min_ms": round(float(min(times)) * 1e3, 2),
        "reps_ms": [round(t * 1e3, 2) for t in times],
        "probe_ms": [round(probe0, 2), round(probe1, 2)],
        "probe_healthy_ms": _PROBE_HEALTHY_MS,
        "retried": retried,
    }))


if __name__ == "__main__":
    main()
