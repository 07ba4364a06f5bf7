"""Perf regression harness (SURVEY.md §4 item 6) — perf-only, TPU-only.

Asserts the north-star budget (BASELINE.json:5): full active-sampling
episode — multi-restart MLL fit + 50 greedy MI selections over a
10k-point grid — under 1 s on one TPU chip.  Skipped on the CPU test
mesh (conftest forces the CPU platform unless ALGP_TPU_PERF=1); run
explicitly on hardware with:

    ALGP_TPU_PERF=1 python -m pytest tests/test_perf.py -q
"""

import time

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="perf budget is defined on TPU hardware",
)


@pytest.mark.perf
def test_episode_under_one_second():
    import jax.numpy as jnp

    from algp_tpu import acquisition as acq
    from algp_tpu.config import FieldConfig, FitConfig
    from algp_tpu.field import FieldEnv
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("rbf", ds=2)
    env = FieldEnv(
        FieldConfig(num_rows=100, num_cols=100, true_ls_spatial=8.0, seed=0),
        spec,
    )
    pilot = np.linspace(0, env.n - 1, 32).round().astype(np.int32)
    s = env.collect(pilot, "precise")
    x_p = env.X[jnp.asarray(s.indices)]
    y_p = jnp.asarray(s.y, jnp.float32)
    pj = jnp.asarray(s.indices, jnp.int32)
    cfg = FitConfig(iters=100, restarts=4)

    def episode(key):
        # one device program, like bench.py (and a deployment) would run
        res, sel = acq.fit_and_select(
            spec, cfg, x_p, y_p, env.X, pj,
            rounds=50, num_pilot=32, strategy="mi", key=key,
        )
        return res.nll, sel.selected

    def run_forced(key):
        nll, sel = episode(key)
        # host transfer = true device sync (block_until_ready can lie here)
        return float(np.asarray(nll)), np.asarray(sel)

    def probe_s():
        # dispatch-floor reading, same recipe as bench.py._probe_ms:
        # tiny jitted reduce + scalar transfer, min over 3 warm reps
        f = jax.jit(lambda a: jnp.sum(a * a))
        x = jnp.arange(1024, dtype=jnp.float32)
        float(np.asarray(f(x)))  # compile + connect
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(x)))
            reps.append(time.perf_counter() - t0)
        return float(min(reps))

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    run_forced(keys[0])  # compile
    p0 = probe_s()
    times = []
    for k in keys[1:]:
        t0 = time.perf_counter()
        run_forced(k)
        times.append(time.perf_counter() - t0)
    p1 = probe_s()
    med = float(np.median(times))
    assert med < 1.0, f"episode took {med * 1e3:.0f} ms (budget 1000 ms)"
    # Probe-normalized regression band (round-4 VERDICT weak #6): the
    # honest workload band is 150-220 ms when the pool's dispatch floor
    # reads ~27 ms, but the shared pool has degradation episodes — a
    # fixed 450 ms band wide enough for those would let a genuine 2×
    # regression (~320 ms) pass.  Instead the allowance scales with the
    # measured pool health: 200 ms of device-work budget + 3× the probe
    # reading of relay/pool overhead (healthy probe 27 ms → 281 ms band;
    # a half-degraded 60 ms probe → 380 ms).  min over reps and min over
    # the two probes so one transient spike cannot fail an honest build —
    # a real regression moves the minimum too.
    probe = min(p0, p1)
    band = 0.20 + 3.0 * probe
    best = float(min(times))
    assert best < band, (
        f"episode best-of-3 took {best * 1e3:.0f} ms — over the probe-"
        f"normalized {band * 1e3:.0f} ms regression band (probes "
        f"{[round(p0 * 1e3), round(p1 * 1e3)]} ms, healthy floor ~27; reps "
        f"{[round(t * 1e3) for t in times]})"
    )


def _round_perf_mod():
    """Load benchmarks/round_perf.py as a module — the single source of
    the ladder budgets (BUDGETS_MS) and the transient-retry runner."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "round_perf.py")
    spec = importlib.util.spec_from_file_location("algp_round_perf", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.perf
@pytest.mark.parametrize(
    "key,preset,steps,timeout",
    [
        ("episode10k", None, 10, 1200),
        ("episode20k", "c5_20k", 12, 2400),
        ("episode100k", "c5_100k", 10, 2400),
        ("episode1m", "c5_1m", 8, 3600),
    ],
)
def test_episode_ladder_budget(key, preset, steps, timeout):
    """VERDICT r3 #8: the committed steady-state ladder budgets are a
    pytest-visible HARDWARE gate, not just the manual ritual — a scale
    regression at 20k/100k/1M surfaces whenever ALGP_TPU_PERF=1 runs,
    with the budgets imported from round_perf (one source of truth).
    The 4M/long presets stay ritual-only for wall-clock."""
    import json
    import sys

    rp = _round_perf_mod()
    cmd = [sys.executable, "benchmarks/episode10k_bench.py",
           "--steps", str(steps)]
    if preset:
        cmd[2:2] = ["--preset", preset]
    rc, lines, retried = rp.run(cmd, timeout=timeout, retries=1)
    assert rc == 0, f"{key} benchmark failed: {lines[-3:]}"
    rec = json.loads(lines[-1])
    got = rec.get("steady_state_per_step_ms", rec.get("per_step_ms"))
    budget = rp.BUDGETS_MS[key]
    assert got is not None and got < budget, (
        f"{key}: {got} ms/step over the {budget} ms budget "
        f"(transient retries: {retried}; record: {rec})"
    )
