"""Utility-layer tests: metrics logger, debug/health checks, plotting."""

import io
import json

import numpy as np
import pytest

import jax.numpy as jnp

from algp_tpu.config import FieldConfig, FitConfig
from algp_tpu.field import FieldEnv
from algp_tpu.models import gp as gp_mod
from algp_tpu.ops.kernels import KernelSpec
from algp_tpu.utils import debug
from algp_tpu.utils.metrics import MetricsLogger


def test_metrics_logger_stream_and_series():
    buf = io.StringIO()
    log = MetricsLogger(buf)
    log.log(step=0, rmse=1.0)
    log.log(step=1, rmse=0.5)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert [l["rmse"] for l in lines] == [1.0, 0.5]
    assert log.series("rmse") == [1.0, 0.5]
    assert log.last()["step"] == 1
    assert all("t_wall" in l for l in lines)


def test_assert_finite_tree_raises():
    good = {"a": jnp.ones(3), "b": [jnp.zeros(2)]}
    debug.assert_finite_tree(good)
    bad = {"a": jnp.asarray([1.0, np.nan])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        debug.assert_finite_tree(bad, "state")


def test_checked_catches_nan():
    
    def f(x):
        return jnp.log(x)  # NaN for negative input

    err, out = debug.checked(f)(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()
    err2, out2 = debug.checked(f)(jnp.asarray(2.0))
    err2.throw()  # no error
    assert np.isfinite(float(out2))


def test_fit_health_report(rng):
    spec = KernelSpec("rbf", ds=2)
    x = jnp.asarray(rng.uniform(0, 10, (50, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(50), jnp.float32)
    res = gp_mod.fit(spec, FitConfig(iters=30, restarts=2), x, y)
    rep = debug.fit_health_report(res)
    assert rep["restarts"] == 2
    assert rep["diverged_restarts"] == 0
    assert rep["nll_improvement"] > 0
    assert 0 < rep["noise_std"] < 10


def test_profiling_helpers(tmp_path):
    from algp_tpu.utils import profiling

    with profiling.annotate("test-region"):
        x = jnp.sum(jnp.ones(16))
    with profiling.trace(None):  # no-op path
        pass
    sw = profiling.Stopwatch().start()
    y = jnp.sum(jnp.ones(8))
    dt = sw.stop(wait_on=y)
    assert dt >= 0
    med, result = profiling.timed(lambda a: a * 2, jnp.ones(4), warmup=1, iters=3)
    assert med >= 0
    np.testing.assert_array_equal(np.asarray(result), 2 * np.ones(4))


def test_cli_config_overrides_compose():
    from algp_tpu import cli

    args = cli.build_parser().parse_args([
        "--preset", "c2_composite_restarts", "--kernel", "matern32",
        "--features", "2", "--optimizer", "lbfgs", "--budget", "55",
        "--modality", "cheap",
    ])
    cfg = cli.config_from_args(args)
    assert cfg.kernel.spatial_kind == "matern32"  # override wins
    assert cfg.kernel.df == 2
    assert cfg.fit.optimizer == "lbfgs"
    assert cfg.episode.budget == 55
    assert cfg.episode.modality == "cheap"
    # untouched preset fields survive
    assert cfg.fit.restarts == 4


def test_cli_round4_flags_compose():
    """--path-utility, --waypoint-goals and --num-inducing 0 (force
    exact under the auto default) flow into the typed configs."""
    from algp_tpu import cli

    args = cli.build_parser().parse_args([
        "--preset", "c5_episode", "--path-utility", "per_sample",
        "--waypoint-goals", "3,40,77", "--num-inducing", "0",
    ])
    cfg = cli.config_from_args(args)
    assert cfg.acquisition.path_utility == "per_sample"
    assert cfg.episode.waypoint_goals == (3, 40, 77)
    assert cfg.acquisition.num_inducing == 0  # explicit force-exact
    # unset flags leave the preset's auto default intact
    args2 = cli.build_parser().parse_args(["--preset", "c5_episode"])
    cfg2 = cli.config_from_args(args2)
    assert cfg2.acquisition.num_inducing is None
    assert cfg2.acquisition.path_utility == "per_cost"
    assert cfg2.episode.waypoint_goals is None


def test_plotting_smoke(tmp_path):
    env = FieldEnv(FieldConfig(num_rows=5, num_cols=8, seed=0))
    from algp_tpu.utils import plotting

    mean = np.zeros(env.n)
    var = np.ones(env.n)
    plotting.field_maps(env, mean, var, sampled_idx=[0, 5, 10],
                        path=str(tmp_path / "maps.png"))
    plotting.learning_curves(
        {"mi": [{"n_sampled": 10, "rmse": 1.0, "mean_var": 0.9},
                {"n_sampled": 20, "rmse": 0.6, "mean_var": 0.5}]},
        path=str(tmp_path / "curves.png"),
    )
    plotting.path_plot(env, [[0, 1, 2, 10], [10, 18, 26]],
                       path=str(tmp_path / "paths.png"))
    assert (tmp_path / "maps.png").exists()
    assert (tmp_path / "curves.png").exists()
    assert (tmp_path / "paths.png").exists()


def test_all_presets_construct_coherently():
    """Every named preset builds, and its knobs are mutually coherent:
    MI-at-scale presets carry a low-rank budget, table presets point at
    an existing file, synthetic grids match num_points."""
    import os

    from algp_tpu.config import PRESETS, resolve_num_inducing

    for name, cfg in PRESETS.items():
        assert cfg.field.num_points == cfg.field.num_rows * cfg.field.num_cols
        assert cfg.acquisition.strategy in ("mi", "entropy", "uniform",
                                            "naive")
        if cfg.field.data_path is not None:
            assert os.path.exists(cfg.field.data_path), name
        m_eff = resolve_num_inducing(
            cfg.acquisition.num_inducing, cfg.field.num_points
        )
        if cfg.field.num_points > 50_000:
            # past the exact ceiling both the synthesis and (for MI) the
            # planner must run low-rank
            assert cfg.field.synth_inducing > 0, name
            if cfg.acquisition.strategy == "mi":
                assert m_eff > 0, name
        if cfg.field.synth_inducing:
            assert cfg.field.synth_inducing < cfg.field.num_points, name


def test_planner_auto_selection_rule():
    """config.resolve_num_inducing: exact at/below the 16k contract
    scale, low-rank above the measured ~20k crossover (M = 1024), M
    capped at 512 past ~0.5M (HBM residency); explicit values — 0
    included — are honored unchanged (VERDICT r3 #1/#4)."""
    from algp_tpu.config import PRESETS, resolve_num_inducing

    assert resolve_num_inducing(None, 1_000) == 0
    assert resolve_num_inducing(None, 10_000) == 0  # headline grid: exact
    assert resolve_num_inducing(None, 16_384) == 0
    assert resolve_num_inducing(None, 19_600) == 1024  # measured crossover
    assert resolve_num_inducing(None, 102_400) == 1024
    assert resolve_num_inducing(None, 1 << 19) == 1024
    assert resolve_num_inducing(None, 1_048_576) == 512
    assert resolve_num_inducing(None, 4_194_304) == 512
    # explicit settings (including force-exact 0) pass through
    assert resolve_num_inducing(0, 1_048_576) == 0
    assert resolve_num_inducing(777, 100) == 777
    # the c5_20k preset rides the auto rule onto the measured-dominant
    # low-rank configuration (episode20k_lr_r03.json)
    c20 = PRESETS["c5_20k"]
    assert c20.acquisition.num_inducing is None
    assert resolve_num_inducing(
        c20.acquisition.num_inducing, c20.field.num_points
    ) == 1024


def test_agent_resolves_auto_planner():
    """The episode Agent materialises the auto-selected planner from its
    env's candidate count; small grids stay on the exact path."""
    from algp_tpu.config import ExperimentConfig
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    cfg = ExperimentConfig()
    assert cfg.acquisition.num_inducing is None  # default = auto
    env = FieldEnv(cfg.field, cfg.kernel)
    agent = Agent(env, cfg)
    assert agent._num_inducing == 0  # 1 000-point grid → exact planner


def test_learning_curves_uneven_metric_keys(tmp_path):
    """Histories where 'rmse' and 'mean_var' don't co-occur per record
    (e.g. a goal_fallback or hard_cap record carrying only one) must
    plot each panel against its OWN x — the shared-x version crashed
    with a matplotlib dimension error."""
    from algp_tpu.utils import plotting

    hist = [
        {"n_sampled": 10, "rmse": 1.0, "mean_var": 0.9},
        {"n_sampled": 15, "rmse": 0.8},            # no mean_var
        {"n_sampled": 20, "mean_var": 0.5},        # no rmse
        {"n_sampled": 25, "rmse": 0.6, "mean_var": 0.4},
    ]
    plotting.learning_curves({"mi": hist}, path=str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").exists()


def test_table_value_column_never_guessed(tmp_path):
    """A table without a 'height' column must either have exactly one
    non-feature candidate (used) or raise — the old fallback silently
    took df.columns[2], which could be a feat_* column (the ground truth
    then doubles as a GP input feature and every metric is nonsense)."""
    import pandas as pd
    import pytest

    # ambiguous: two non-feature candidates -> error
    amb = tmp_path / "amb.csv"
    pd.DataFrame({
        "row": [0, 0, 1], "range": [0, 1, 0],
        "feat_a": [0.1, 0.2, 0.3],
        "yield": [1.0, 2.0, 3.0], "width": [4.0, 5.0, 6.0],
    }).to_csv(amb, index=False)
    with pytest.raises(ValueError, match="value column is ambiguous"):
        FieldEnv(FieldConfig(num_rows=2, num_cols=2, data_path=str(amb)))

    # unambiguous: exactly one non-feature candidate -> used, never feat_*
    ok = tmp_path / "ok.csv"
    pd.DataFrame({
        "row": [0, 0, 1, 1], "range": [0, 1, 0, 1],
        "feat_a": [0.1, 0.2, 0.3, 0.4],
        "yield": [1.0, 2.0, 3.0, 4.0],
    }).to_csv(ok, index=False)
    env = FieldEnv(FieldConfig(num_rows=2, num_cols=2, num_features=1,
                               data_path=str(ok)))
    # standardized 'yield' is strictly increasing across the 4 plots
    assert np.all(np.diff(env.f) > 0)


def test_round_perf_run_timeout_records_failure():
    """A benchmark pushed past its timeout by a pool degradation episode
    must come back as a recorded failure (rc=-1 + TIMEOUT tail line),
    not an uncaught TimeoutExpired that discards the whole ritual's
    already-collected results (round-4 review finding)."""
    import importlib.util
    import os
    import sys

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "round_perf.py")
    spec = importlib.util.spec_from_file_location("algp_round_perf_t", path)
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)
    rc, lines, retried = rp.run(
        [sys.executable, "-c", "import time; time.sleep(30)"], timeout=2,
    )
    assert rc == -1 and retried == 0
    assert any("TIMEOUT" in ln for ln in lines)
