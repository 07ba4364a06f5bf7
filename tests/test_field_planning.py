"""Field environment + path planning tests (C10, C11)."""

import os

import numpy as np
import pytest

from algp_tpu import planning
from algp_tpu.config import FieldConfig
from algp_tpu.field import FieldEnv
from algp_tpu.ops.kernels import KernelSpec


@pytest.fixture
def env():
    return FieldEnv(FieldConfig(num_rows=6, num_cols=10, seed=1))


def test_field_geometry(env):
    assert env.n == 60
    assert env.index_to_rowcol(23) == (2, 3)
    assert env.rowcol_to_index(2, 3) == 23
    assert env.pose_of(23) == (3.0, 2.0)
    assert env.X.shape == (60, 2)


def test_synthetic_field_has_spatial_structure(env):
    # neighbouring points should correlate far more than distant ones
    f = env.f.reshape(6, 10)
    d_near = np.mean((f[:, 1:] - f[:, :-1]) ** 2)
    d_far = np.mean((f[:3] - f[3:]) ** 2)
    assert d_near < d_far


def test_field_determinism():
    e1 = FieldEnv(FieldConfig(num_rows=4, num_cols=5, seed=3))
    e2 = FieldEnv(FieldConfig(num_rows=4, num_cols=5, seed=3))
    np.testing.assert_array_equal(e1.f, e2.f)
    e3 = FieldEnv(FieldConfig(num_rows=4, num_cols=5, seed=4))
    assert not np.allclose(e1.f, e3.f)


def test_collect_noise_modalities(env):
    idx = [0, 5, 30]
    s_precise = env.collect(idx, "precise")
    s_cheap = env.collect(idx, "cheap")
    assert np.all(s_precise.noise_scale == 1.0)
    assert np.all(s_cheap.noise_scale == env.cfg.cheap_noise_mult**2)
    # repeated cheap sensing has visibly more spread than precise
    reps_p = np.std([env.collect(idx, "precise").y for _ in range(50)], axis=0)
    reps_c = np.std([env.collect(idx, "cheap").y for _ in range(50)], axis=0)
    assert np.all(reps_c > reps_p)
    with pytest.raises(ValueError):
        env.collect(idx, "sonar")


def test_features_in_candidate_matrix():
    env = FieldEnv(
        FieldConfig(num_rows=4, num_cols=5, num_features=3, seed=0),
        KernelSpec("rbf", "rbf", ds=2, df=3),
    )
    assert env.X.shape == (20, 5)


def test_table_loader(tmp_path):
    import pandas as pd

    rows, cols = 4, 6
    recs = []
    rng = np.random.default_rng(0)
    for r in range(rows):
        for c in range(cols):
            recs.append({
                "row": r, "range": c,
                "height": 100 + 10 * r + c + rng.normal(),
                "feat_g1": float(r % 2), "feat_g2": float(c % 3),
            })
    path = tmp_path / "pheno.csv"
    pd.DataFrame(recs).to_csv(path, index=False)
    env = FieldEnv(FieldConfig(num_rows=rows, num_cols=cols, data_path=str(path)))
    assert env.X.shape == (24, 4)  # 2 spatial + 2 features
    assert abs(env.f.mean()) < 1e-9  # standardized
    assert env.f.std() == pytest.approx(1.0, rel=1e-6)


def test_sample_fixture_rcbd_invariant():
    """The shipped C10 fixture generator's advertised RCBD property must
    actually hold: each replicate block of `n_genotypes` consecutive plot
    runs plants every genotype EXACTLY once (round-5 review: the old
    row-aligned blocking repeated 4 genotypes per block and omitted 12
    from the truncated final block at the default geometry)."""
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "make_sample_field",
        os.path.join(os.path.dirname(__file__), "..", "data",
                     "make_sample_field.py"))
    msf = ilu.module_from_spec(spec)
    spec.loader.exec_module(msf)
    rows, cols, run_len, G = 25, 40, 5, 20
    df = msf.make_table(rows, cols, seed=0, n_genotypes=G,
                        run_len=run_len, plot_missing=0.0)
    runs_per_row = cols // run_len
    geno_of_run = np.full(rows * runs_per_row, -1, np.int64)
    for _, rec in df.iterrows():
        run = (int(rec["row"]) * runs_per_row
               + min(int(rec["range"]) // run_len, runs_per_row - 1))
        g = int(rec["genotype"])
        assert geno_of_run[run] in (-1, g)  # one genotype per run
        geno_of_run[run] = g
    assert (geno_of_run >= 0).all()
    total_runs = rows * runs_per_row
    assert total_runs % G == 0  # default geometry: complete blocks only
    for b0 in range(0, total_runs, G):
        block = geno_of_run[b0:b0 + G]
        assert sorted(block) == list(range(G)), f"block at run {b0}"


def test_field_graph_structure(env):
    g = planning.build_field_graph(env)
    assert g.number_of_nodes() == 60
    # interior point: 2 along-row neighbours only
    assert set(g.neighbors(env.rowcol_to_index(2, 3))) == {
        env.rowcol_to_index(2, 2), env.rowcol_to_index(2, 4)
    }
    # headland point: along-row + up/down
    nbrs = set(g.neighbors(env.rowcol_to_index(2, 0)))
    assert env.rowcol_to_index(1, 0) in nbrs
    assert env.rowcol_to_index(3, 0) in nbrs
    assert env.rowcol_to_index(2, 1) in nbrs


def test_enumerate_paths_costs_within_budget(env):
    start = env.rowcol_to_index(2, 0)
    paths = planning.enumerate_paths(env, start, budget=8.0)
    assert paths
    for seq, cost in paths:
        assert cost <= 8.0 + 1e-6
        assert seq[0] == start
        # edges must be unit steps along rows or headland switches
        for a, b in zip(seq, seq[1:]):
            ra, ca = env.index_to_rowcol(a)
            rb, cb = env.index_to_rowcol(b)
            along = ra == rb and abs(ca - cb) == 1
            switch = ca == cb and abs(ra - rb) == 1 and ca in (0, env.num_cols - 1)
            assert along or switch, (seq, a, b)


def test_enumerate_paths_reaches_other_rows(env):
    start = env.rowcol_to_index(2, 0)
    paths = planning.enumerate_paths(env, start, budget=10.0, max_turns=2)
    rows_reached = {env.index_to_rowcol(seq[-1])[0] for seq, _ in paths}
    assert len(rows_reached) > 1


def test_enumerate_paths_deterministic(env):
    start = env.rowcol_to_index(1, 3)
    p1 = planning.enumerate_paths(env, start, budget=6.0)
    p2 = planning.enumerate_paths(env, start, budget=6.0)
    assert p1 == p2


def test_paths_to_batch_padding(env):
    start = env.rowcol_to_index(0, 0)
    paths = planning.enumerate_paths(env, start, budget=9.0)
    batch = planning.paths_to_batch(env, paths, k_max=4)
    assert batch.sets.shape[1] == 4
    assert np.all(batch.sizes <= 4)
    assert np.all(batch.sizes >= 1)
    for p in range(len(batch)):
        k = batch.sizes[p]
        assert np.all(batch.sets[p, k:] == 0)
        assert batch.ends[p] == batch.node_seqs[p][-1]
        # sample sites must lie on the path
        assert set(batch.sets[p, :k]).issubset(set(batch.node_seqs[p]))


def test_boustrophedon_covers_grid(env):
    order = planning.boustrophedon_order(env)
    assert len(order) == env.n
    assert len(np.unique(order)) == env.n
    # consecutive order entries are adjacent in the traversal graph
    g = planning.build_field_graph(env)
    for a, b in zip(order, order[1:]):
        assert g.has_edge(int(a), int(b))


def test_multi_trait_synthetic_field():
    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv

    env = FieldEnv(FieldConfig(num_rows=6, num_cols=8, num_traits=3, seed=4))
    assert env.traits.shape == (48, 3)
    assert env.num_traits == 3
    np.testing.assert_array_equal(env.traits[:, 0], env.f)
    idx, Y, scale, obs = env.collect_traits([1, 5, 9], "cheap")
    assert Y.shape == (3, 3) and (scale > 1).all()
    r = env.rmse_traits(np.zeros((48, 3)))
    assert len(r) == 3 and all(np.isfinite(r))


def test_multi_trait_table_and_fit_multi(tmp_path):
    import pandas as pd

    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv

    rows, cols = 5, 6
    rng = np.random.default_rng(0)
    rec = [
        {"row": r, "range": c,
         "height": 100 + 3 * r + c + rng.standard_normal(),
         "width": 40 + r + 2 * c + rng.standard_normal()}
        for r in range(rows) for c in range(cols)
    ]
    path = tmp_path / "multi.csv"
    pd.DataFrame(rec).to_csv(path, index=False)
    env = FieldEnv(FieldConfig(num_rows=rows, num_cols=cols,
                               data_path=str(path),
                               value_cols=("height", "width")))
    assert env.traits.shape == (30, 2)
    # both traits standardized
    assert abs(env.traits[:, 1].mean()) < 1e-8

    # batched multi-trait fit over sampled plots
    import jax.numpy as jnp

    from algp_tpu.models import gp as gp_mod
    from algp_tpu.config import FitConfig
    from algp_tpu.ops.kernels import KernelSpec

    idx, Y, _, _ = env.collect_traits(np.arange(0, 30, 2), "precise")
    spec = KernelSpec("rbf", ds=2)
    res = gp_mod.fit_multi(
        spec, FitConfig(iters=30, restarts=2),
        env.X[jnp.asarray(idx)], jnp.asarray(Y, jnp.float32),
    )
    assert np.asarray(res.nll).shape == (2,)
    assert np.isfinite(np.asarray(res.nll)).all()


def test_cli_greedy_multi_trait(capsys):
    from algp_tpu import cli

    rc = cli.main([
        "--strategy", "entropy", "--rows", "5", "--cols", "8",
        "--acq-rounds", "8", "--num-pilot", "5", "--num-traits", "3",
        "--iters", "15", "--restarts", "1", "--mode", "greedy",
    ])
    assert rc == 0
    import json

    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert len(rec["trait_rmse"]) == 3
    assert len(rec["trait_rmse_test"]) == 3
    assert all(np.isfinite(rec["trait_rmse"]))


def test_cli_greedy_multi_trait_deep_kernel(capsys):
    """--deep-hidden + --num-traits: the per-trait refit must evaluate
    the SAME model family as the headline RMSE (per-trait hypers over
    the shared learned embedding), not silently fall back to the plain
    stationary kernel over raw features (round-4 review finding)."""
    from algp_tpu import cli

    rc = cli.main([
        "--strategy", "entropy", "--rows", "5", "--cols", "8",
        "--features", "3", "--deep-hidden", "8", "--deep-out", "3",
        "--acq-rounds", "6", "--num-pilot", "6", "--num-traits", "2",
        "--iters", "10", "--restarts", "1", "--mode", "greedy",
    ])
    assert rc == 0
    import json

    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert len(rec["trait_rmse"]) == 2
    assert all(np.isfinite(rec["trait_rmse"]))


def test_rmse_traits_per_trait_observation_masks(tmp_path):
    """A plot with height but no width must not count its imputed width
    in trait-1's RMSE (self code-review round 2)."""
    import pandas as pd

    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv

    rows, cols = 4, 5
    rec = []
    for r in range(rows):
        for c in range(cols):
            row = {"row": r, "range": c, "height": 10.0 + r + c}
            if not (r == 0 and c < 3):  # width missing on 3 plots
                row["width"] = 40.0 + 2 * r + c
            rec.append(row)
    path = tmp_path / "t.csv"
    pd.DataFrame(rec).to_csv(path, index=False)
    env = FieldEnv(FieldConfig(num_rows=rows, num_cols=cols,
                               data_path=str(path),
                               value_cols=("height", "width")))
    assert env.observed_traits[:, 0].all()
    assert env.observed_traits[:, 1].sum() == rows * cols - 3
    # exact on every REAL cell, garbage on imputed width cells → RMSE 0
    means = env.traits.copy()
    means[:3, 1] = 99.0
    r = env.rmse_traits(means)
    assert r[0] == pytest.approx(0.0) and r[1] == pytest.approx(0.0)
    rt = env.rmse_traits(means, test_only=True)
    assert rt[1] == pytest.approx(0.0)

def test_feature_warp_changes_truth_not_inputs():
    """FieldConfig.feature_warp: the truth kernel sees ψ(feats), the env
    exposes raw features unchanged — and the warp is deterministic."""
    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv
    from algp_tpu.ops.kernels import KernelSpec

    spec = KernelSpec("matern52", "rbf", ds=2, df=3)
    base = dict(num_rows=6, num_cols=8, num_features=3, seed=5)
    env0 = FieldEnv(FieldConfig(**base), spec)
    env1 = FieldEnv(FieldConfig(feature_warp="tanh", **base), spec)
    env1b = FieldEnv(FieldConfig(feature_warp="tanh", **base), spec)
    # same raw features exposed either way
    np.testing.assert_array_equal(env0.features, env1.features)
    np.testing.assert_array_equal(np.asarray(env0.X), np.asarray(env1.X))
    # truth differs under the warp, deterministically
    assert not np.allclose(env0.f, env1.f)
    np.testing.assert_array_equal(env1.f, env1b.f)
    assert np.isfinite(env1.f).all()
    # unknown warp rejected
    import pytest

    with pytest.raises(ValueError):
        FieldEnv(FieldConfig(feature_warp="bogus", **base), spec)

def test_native_path_enumerator_matches_python(monkeypatch):
    """The C enumerator (algp_tpu/native/pathenum.c) must reproduce the
    Python generator EXACTLY — same paths, same order, bit-equal costs —
    across geometries, spacings, poses and budgets (the planner's
    determinism is part of the selection-fidelity contract)."""
    import pytest

    from algp_tpu import native
    from algp_tpu import planning
    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv

    probe = native.enumerate_paths_native(4, 6, 1.0, 1.0, 0, 8.0, 64, 2, 0.5)
    if probe is None:
        pytest.skip("no C toolchain — native enumerator unavailable")

    cases = [
        # rows, cols, cs, rs, start, budget, max_paths
        (6, 10, 1.0, 1.0, 0, 12.0, 256),
        (6, 10, 1.0, 1.0, 37, 20.0, 256),
        (8, 12, 0.3, 0.7, 95, 6.5, 128),
        (3, 25, 1.0, 2.0, 24, 40.0, 256),   # headland-right start
        (12, 4, 0.5, 0.5, 26, 9.0, 64),     # narrow field, middle start
        (5, 5, 1.0, 1.0, 12, 100.0, 256),   # budget >> field
        (2, 30, 1.0, 1.0, 0, 3.0, 32),      # tiny budget
        (10, 10, 1.7, 0.9, 55, 14.3, 200),  # irrational-ish costs
        # paths LONGER than the grid: a short-row field whose budget
        # covers a full row round-trip re-traverses visited nodes, so
        # path depth exceeds nr·nc (the old C stack bound — heap
        # overflow regression, 2×6 @ budget 16 reaches depth 17 > 14)
        (2, 6, 1.0, 1.0, 4, 16.0, 64),
        (2, 8, 1.0, 1.0, 3, 30.0, 128),     # multiple round-trips
    ]
    for rows, cols, cs, rs, start, budget, mp in cases:
        env = FieldEnv(FieldConfig(
            num_rows=rows, num_cols=cols, col_spacing=cs, row_spacing=rs,
            seed=1,
        ))
        nat = native.enumerate_paths_native(
            rows, cols, cs, rs, start, budget, mp, 2, 0.5
        )
        monkeypatch.setenv("ALGP_TPU_NO_NATIVE", "1")
        py = planning.enumerate_paths(env, start, budget, max_paths=mp)
        monkeypatch.delenv("ALGP_TPU_NO_NATIVE")
        assert len(nat) == len(py), (rows, cols, start, budget)
        for (ns, ncost), (ps, pcost) in zip(nat, py):
            assert ns == ps, (rows, cols, start, budget)
            assert ncost == pcost  # bit-equal doubles (same accumulation)


def test_episode_identical_with_and_without_native_enumerator(monkeypatch):
    from algp_tpu.config import (
        AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
        FitConfig,
    )
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    cfg = ExperimentConfig(
        fit=FitConfig(iters=25, restarts=1),
        acquisition=AcquisitionConfig(strategy="mi"),
        episode=EpisodeConfig(num_pilot=6, budget=20.0, num_waypoints=4,
                              samples_per_step=4, seed=2),
    )
    fieldc = FieldConfig(num_rows=6, num_cols=10, seed=13)
    r_native = Agent(FieldEnv(fieldc), cfg).run(max_steps=6)
    monkeypatch.setenv("ALGP_TPU_NO_NATIVE", "1")
    r_py = Agent(FieldEnv(fieldc), cfg).run(max_steps=6)
    np.testing.assert_array_equal(
        r_native.state.sampled_idx, r_py.state.sampled_idx
    )
    assert r_native.rmse == r_py.rmse

def test_enumerate_batch_native_equals_python_batch(monkeypatch):
    """The episode's one-call batch builder must produce bit-equal
    sets/sizes/costs/ends and identical node sequences on the native and
    Python engines."""
    import pytest

    from algp_tpu import native
    from algp_tpu import planning
    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv

    if native.enumerate_paths_raw(4, 6, 1.0, 1.0, 0, 8.0, 64, 2, 0.5) is None:
        pytest.skip("no C toolchain — native enumerator unavailable")

    for rows, cols, cs, rs, start, budget in (
        (6, 10, 1.0, 1.0, 0, 12.0),
        (8, 12, 0.3, 0.7, 95, 6.5),
        (12, 4, 0.5, 0.5, 26, 9.0),
    ):
        env = FieldEnv(FieldConfig(num_rows=rows, num_cols=cols,
                                   col_spacing=cs, row_spacing=rs, seed=1))
        b_nat = planning.enumerate_batch(env, start, budget, k_max=6)
        monkeypatch.setenv("ALGP_TPU_NO_NATIVE", "1")
        b_py = planning.enumerate_batch(env, start, budget, k_max=6)
        monkeypatch.delenv("ALGP_TPU_NO_NATIVE")
        np.testing.assert_array_equal(b_nat.sets, b_py.sets)
        np.testing.assert_array_equal(b_nat.sizes, b_py.sizes)
        np.testing.assert_array_equal(b_nat.costs, b_py.costs)
        np.testing.assert_array_equal(b_nat.ends, b_py.ends)
        assert len(b_nat.node_seqs) == len(b_py.node_seqs)
        for a, b in zip(b_nat.node_seqs, b_py.node_seqs):
            assert list(a) == list(b)


def test_device_resident_truth_matches_host_upload():
    """env.f_dev (kept on device from synthesis) must equal the f32
    upload of env.f bitwise — f32→f64→f32 round-trips exactly — and the
    Agent's device-built masks must equal the host uploads, for both the
    dense and the FITC synthesis paths."""
    import dataclasses

    import jax.numpy as jnp

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv
    from algp_tpu.ops.kernels import KernelSpec

    for synth_inducing in (0, 220):
        cfg = FieldConfig(num_rows=30, num_cols=30, true_ls_spatial=5.0,
                          synth_inducing=synth_inducing, seed=11)
        env = FieldEnv(cfg, KernelSpec("rbf", ds=2))
        assert env.f_dev is not None
        np.testing.assert_array_equal(
            np.asarray(env.f_dev), np.asarray(env.f, np.float32),
        )
        base = PRESETS["c5_episode"]
        ecfg = dataclasses.replace(
            base, field=cfg,
            episode=dataclasses.replace(base.episode, device_metrics=True),
        )
        agent = Agent(env, ecfg)
        f_true, obs, test = agent._truth()
        np.testing.assert_array_equal(
            np.asarray(f_true), np.asarray(env.f, np.float32))
        np.testing.assert_array_equal(
            np.asarray(obs), np.asarray(env.observed_mask, np.float32))
        np.testing.assert_array_equal(
            np.asarray(test), np.asarray(env.test_mask, np.float32))


def test_lowrank_z_subsample_gate(monkeypatch):
    """Past the subsample gate the episode's inducing design comes from a
    strided sub-grid: still actual candidate rows, still m distinct
    points; below the gate the design is the full-grid maximin."""
    import dataclasses

    from algp_tpu import episode as ep_mod
    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv
    from algp_tpu.ops.kernels import KernelSpec

    cfg = FieldConfig(num_rows=30, num_cols=30, true_ls_spatial=5.0,
                      synth_inducing=120, seed=7)
    env = FieldEnv(cfg, KernelSpec("rbf", ds=2))
    base = PRESETS["c5_episode"]
    ecfg = dataclasses.replace(
        base, field=cfg,
        acquisition=dataclasses.replace(base.acquisition, num_inducing=48),
    )
    z_full = np.asarray(Agent(env, ecfg)._lowrank_z())
    monkeypatch.setattr(ep_mod, "_KCENTER_SUBSAMPLE", 256)
    monkeypatch.setattr(ep_mod, "_KCENTER_TARGET", 256)
    z_sub = np.asarray(Agent(env, ecfg)._lowrank_z())
    assert z_sub.shape == z_full.shape
    X = np.asarray(env.X)
    sub = ep_mod._kcenter_subgrid_indices(env.num_rows, env.num_cols, 256)
    Xs = X[sub]  # the uniform 2-axis sub-grid (ADVICE r3)
    for zrow in z_sub:
        assert (np.abs(Xs - zrow).sum(1) == 0).any()  # a real sub-grid row
    assert len(np.unique(z_sub, axis=0)) == len(z_sub)
    assert len(np.unique(z_full, axis=0)) == len(z_full)


def test_retry_transient_oom(monkeypatch):
    """The shared-pool OOM retry: retries ONLY on RESOURCE_EXHAUSTED,
    re-raises other errors immediately, gives up after `attempts`, and
    returns the first successful result."""
    import pytest

    from algp_tpu import field as field_mod

    monkeypatch.setattr(field_mod, "_OOM_RETRY_SLEEP_S", 0.0)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("TPU backend error RESOURCE_EXHAUSTED blah")
        return "ok"

    with pytest.warns(RuntimeWarning, match="transient device OOM"):
        assert field_mod._retry_transient_oom(flaky) == "ok"
    assert calls["n"] == 3

    def always_oom():
        raise RuntimeError("RESOURCE_EXHAUSTED forever")

    with pytest.raises(RuntimeError, match="forever"), \
            pytest.warns(RuntimeWarning):
        field_mod._retry_transient_oom(always_oom, attempts=2)

    calls["n"] = 0

    def other_error():
        calls["n"] += 1
        raise ValueError("not an OOM")

    with pytest.raises(ValueError):
        field_mod._retry_transient_oom(other_error)
    assert calls["n"] == 1  # no retry on non-OOM errors


def test_episode_per_sample_utility_buys_at_least_as_much_data():
    """path_utility="per_sample" (the yield-aware cost model) must run
    end-to-end on both informative strategies and never buy LESS data
    for the same budget than per-cost planning — the 4.19M pathology it
    exists to fix is per-cost MI spending the budget on long paths
    whose yield samples_per_step caps (VERDICT r3 #2)."""
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    for strategy in ("mi", "entropy"):
        n_sampled = {}
        for mode in ("per_cost", "per_sample"):
            cfg = dataclasses.replace(
                base,
                field=dataclasses.replace(base.field, num_rows=12,
                                          num_cols=16, true_ls_spatial=3.0),
                acquisition=dataclasses.replace(
                    base.acquisition, strategy=strategy, path_utility=mode,
                ),
                episode=dataclasses.replace(base.episode, num_pilot=16,
                                            budget=60.0, samples_per_step=6),
            )
            env = FieldEnv(cfg.field, cfg.kernel)
            result = Agent(env, cfg).run(max_steps=10)
            assert np.isfinite(result.rmse) and np.isfinite(result.rmse_test)
            assert len(result.state.sampled_idx) > 16
            n_sampled[mode] = len(result.state.sampled_idx)
        assert n_sampled["per_sample"] >= n_sampled["per_cost"], (
            strategy, n_sampled,
        )


def test_episode_rejects_unknown_path_utility():
    import dataclasses

    import pytest

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    cfg = dataclasses.replace(
        base, acquisition=dataclasses.replace(base.acquisition,
                                              path_utility="bogus"),
    )
    env = FieldEnv(cfg.field, cfg.kernel)
    with pytest.raises(ValueError, match="path_utility"):
        Agent(env, cfg)


def test_goal_conditioned_enumeration_semantics(env):
    """goal= paths (C11 'between current pose and goal'): every
    candidate ends AT the goal within budget; unreachable goals yield
    nothing; min_cost_frac does not filter goal paths."""
    start = env.rowcol_to_index(2, 0)
    goal = env.rowcol_to_index(4, 9)
    paths = planning.enumerate_paths(env, start, budget=20.0, goal=goal)
    assert paths
    for seq, cost in paths:
        assert seq[0] == start and seq[-1] == goal
        assert cost <= 20.0 + 1e-9
    # deterministic
    again = planning.enumerate_paths(env, start, budget=20.0, goal=goal)
    assert [(list(a), c) for a, c in paths] == [(list(a), c) for a, c in again]
    # unreachable within budget -> empty, not a crash
    assert planning.enumerate_paths(env, start, budget=3.0, goal=goal) == []
    # a cheap adjacent goal is NOT dropped by the free mode's
    # min_cost_frac stub filter
    near = planning.enumerate_paths(
        env, start, budget=20.0, goal=env.rowcol_to_index(2, 1),
        min_cost_frac=0.9,
    )
    assert any(cost <= 2.0 for _, cost in near)


def test_goal_enumeration_native_matches_python(monkeypatch):
    """C/Python parity for the goal-conditioned engine over a geometry
    sweep (same contract as the free-mode parity test)."""
    from algp_tpu import native

    probe = native.enumerate_paths_native(4, 6, 1.0, 1.0, 0, 8.0, 64, 2, 0.5)
    if probe is None:
        pytest.skip("no C toolchain — native enumerator unavailable")

    cases = [
        (6, 10, 1.0, 1.0, 20, 20.0, 39),   # reachable, across rows
        (6, 10, 1.0, 1.0, 20, 20.0, 29),   # same row far end
        (5, 7, 0.7, 1.3, 0, 12.0, 34),     # ragged spacings
        (12, 4, 0.5, 0.5, 26, 9.0, 47),
        (6, 10, 1.0, 1.0, 20, 3.0, 59),    # unreachable -> both empty
    ]
    for rows, cols, cs, rs, start, budget, goal in cases:
        env = FieldEnv(FieldConfig(
            num_rows=rows, num_cols=cols, col_spacing=cs, row_spacing=rs,
            seed=1,
        ))
        nat = planning.enumerate_paths(env, start, budget, goal=goal)
        b_nat = planning.enumerate_batch(env, start, budget, goal=goal,
                                         k_max=6)
        monkeypatch.setenv("ALGP_TPU_NO_NATIVE", "1")
        py = planning.enumerate_paths(env, start, budget, goal=goal)
        b_py = planning.enumerate_batch(env, start, budget, goal=goal,
                                        k_max=6)
        monkeypatch.delenv("ALGP_TPU_NO_NATIVE")
        assert len(nat) == len(py), (rows, cols, start, goal)
        for (ns, ncost), (ps, pcost) in zip(nat, py):
            assert list(ns) == list(ps)
            assert ncost == pcost
        np.testing.assert_array_equal(b_nat.sets, b_py.sets)
        np.testing.assert_array_equal(b_nat.sizes, b_py.sizes)
        np.testing.assert_array_equal(b_nat.costs, b_py.costs)
        np.testing.assert_array_equal(b_nat.ends, b_py.ends)


def test_episode_visits_waypoint_goals_in_order():
    """EpisodeConfig.waypoint_goals drives goal-conditioned planning:
    the episode reaches every goal (its paths END at the active goal, so
    each goal node gets sampled) and the goal cursor advances through
    the list; resume round-trips the cursor."""
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv
    from algp_tpu.utils import checkpoint as ckpt

    base = PRESETS["c5_episode"]
    fieldc = dataclasses.replace(base.field, num_rows=8, num_cols=12,
                                 true_ls_spatial=3.0, seed=5)
    env = FieldEnv(fieldc, base.kernel)
    goals = (
        env.rowcol_to_index(0, 11),
        env.rowcol_to_index(2, 0),
        env.rowcol_to_index(4, 11),
    )
    cfg = dataclasses.replace(
        base, field=fieldc,
        episode=dataclasses.replace(base.episode, num_pilot=12, budget=90.0,
                                    num_waypoints=6, samples_per_step=6,
                                    waypoint_goals=goals),
    )
    result = Agent(env, cfg).run(max_steps=12)
    assert result.state.goal_i == len(goals)  # every waypoint reached
    sampled = set(int(i) for i in result.state.sampled_idx)
    for g in goals:
        assert g in sampled  # path ends are always thinned-in sample sites
    assert np.isfinite(result.rmse_test)

    # the goal cursor survives a checkpoint round-trip
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "g.npz")
        ckpt.save(path, result.state)
        loaded = ckpt.load(path)
    assert loaded.goal_i == len(goals)


def test_waypoint_goals_validated():
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    cfg = dataclasses.replace(
        base, episode=dataclasses.replace(base.episode,
                                          waypoint_goals=(0, 10**6)),
    )
    with pytest.raises(ValueError, match="waypoint_goals"):
        Agent(FieldEnv(cfg.field, cfg.kernel), cfg)


def test_min_cost_frac_config_buys_more_shorter_steps():
    """EpisodeConfig.min_cost_frac reaches the planner: lowering the
    enumeration floor yields more, cheaper steps for the same budget
    (the sample-price lever the yield-aware utility exploits), and the
    default 0.5 keeps the auto-derived capacity formula unchanged."""
    import dataclasses

    from algp_tpu.config import PRESETS
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv

    base = PRESETS["c5_episode"]
    steps = {}
    for frac in (0.5, 0.25):
        cfg = dataclasses.replace(
            base,
            field=dataclasses.replace(base.field, num_rows=12, num_cols=16,
                                      true_ls_spatial=3.0),
            acquisition=dataclasses.replace(base.acquisition,
                                            path_utility="per_sample"),
            episode=dataclasses.replace(base.episode, num_pilot=16,
                                        budget=60.0, samples_per_step=6,
                                        min_cost_frac=frac),
        )
        env = FieldEnv(cfg.field, cfg.kernel)
        agent = Agent(env, cfg)
        if frac == 0.5:
            cap_default = agent._max_samples
        result = agent.run(max_steps=30)
        steps[frac] = (result.state.step,
                       60.0 - result.state.budget_left,
                       len(result.state.sampled_idx))
        assert np.isfinite(result.rmse_test)
    assert steps[0.25][0] > steps[0.5][0], steps  # more steps
    # capacity formula: ceil(w/frac)+6 slack steps == the old 2w+6 at 0.5
    w, k = base.episode.num_waypoints, 6
    assert cap_default == ((16 + (2 * w + 6) * k) + 7) // 8 * 8


def test_native_enumerator_fuzz_parity(monkeypatch):
    """Deterministic randomized sweep over the whole enumerator parameter
    space — free AND goal mode, both API forms — asserting EXACT C ≡
    Python parity (paths, order, bit-equal costs, batch tensors).  The
    fixed-case parity tests above pin known geometries; this one walks
    a few hundred random (spacing, pose, budget, max_turns,
    min_cost_frac, k_max, goal) combinations including the dedup-
    rounding edge (repeating-decimal spacings) and exact budget
    boundaries (budget = an integer multiple of the spacing)."""
    from algp_tpu import native
    from algp_tpu import planning
    from algp_tpu.config import FieldConfig
    from algp_tpu.field import FieldEnv

    if native.enumerate_paths_native(4, 6, 1.0, 1.0, 0, 8.0, 64, 2, 0.5) is None:
        pytest.skip("no C toolchain — native enumerator unavailable")

    rng = np.random.default_rng(20260818)
    # few SHAPES (each new shape costs a synthesis compile), many params
    shapes = [(2, 9), (3, 5), (5, 12), (7, 7), (9, 3), (1, 20), (6, 1)]
    n_cases = 0
    for rows, cols in shapes:
        n = rows * cols
        for _ in range(24):
            cs = float(rng.choice([0.1, 0.3, 0.5, 1.0, 1.7, 2.5]))
            rs = float(rng.choice([0.1, 0.7, 1.0, 2.0]))
            env = FieldEnv(FieldConfig(
                num_rows=rows, num_cols=cols, col_spacing=cs,
                row_spacing=rs, seed=5,
            ))
            start = int(rng.integers(0, n))
            # half the draws land EXACTLY on a k·spacing budget boundary;
            # a quarter exceed the field's row round-trip so paths can
            # RE-TRAVERSE visited nodes and grow LONGER than the grid
            # (the regime whose depth overflowed the old C stack bound)
            u = rng.random()
            if u < 0.5:
                budget = cs * int(rng.integers(1, 2 * cols + 2))
            elif u < 0.75:
                budget = float(rng.uniform(1.0, 3.0)) * (
                    cs * cols + rs * rows
                )
            else:
                budget = float(rng.uniform(0.5, cs * cols + rs * rows))
            max_turns = int(rng.integers(0, 5))
            frac = float(rng.choice([0.0, 0.3, 0.5, 0.9]))
            mp = int(rng.choice([16, 64, 256]))
            k_max = int(rng.choice([3, 6, 10]))
            goal = None
            if rng.random() < 0.4:  # goal mode (incl. goal == start)
                goal = start if rng.random() < 0.1 else int(rng.integers(0, n))
            kw = dict(goal=goal, max_paths=mp, max_turns=max_turns,
                      min_cost_frac=frac)
            nat = planning.enumerate_paths(env, start, budget, **kw)
            b_nat = planning.enumerate_batch(env, start, budget,
                                             k_max=k_max, **kw)
            monkeypatch.setenv("ALGP_TPU_NO_NATIVE", "1")
            py = planning.enumerate_paths(env, start, budget, **kw)
            b_py = planning.enumerate_batch(env, start, budget,
                                            k_max=k_max, **kw)
            monkeypatch.delenv("ALGP_TPU_NO_NATIVE")
            case = (rows, cols, cs, rs, start, budget, max_turns, frac,
                    mp, k_max, goal)
            assert len(nat) == len(py), case
            for (ns, ncost), (ps, pcost) in zip(nat, py):
                assert list(ns) == list(ps), case
                assert ncost == pcost, case  # bit-equal doubles
            np.testing.assert_array_equal(b_nat.sets, b_py.sets, err_msg=str(case))
            np.testing.assert_array_equal(b_nat.sizes, b_py.sizes, err_msg=str(case))
            np.testing.assert_array_equal(b_nat.costs, b_py.costs, err_msg=str(case))
            np.testing.assert_array_equal(b_nat.ends, b_py.ends, err_msg=str(case))
            assert [list(s) for s in b_nat.node_seqs] == \
                   [list(s) for s in b_py.node_seqs], case
            n_cases += 1
    assert n_cases == len(shapes) * 24


def test_calibration_closed_forms(env):
    """FieldEnv.calibration vs hand-computed Gaussian scoring formulas."""
    n = env.n
    # perfectly-centred posterior with constant variance c: NLPD is the
    # entropy-like constant ½log(2πc) and every z-score is 0 ⇒ coverage 1
    c = 0.25
    calib = env.calibration(env.f.copy(), np.full(n, c))
    assert calib["nlpd"] == pytest.approx(0.5 * np.log(2 * np.pi * c))
    assert calib["cov90"] == 1.0 and calib["cov95"] == 1.0
    # mean offset by exactly 1.8σ everywhere: inside the 95% interval
    # (1.96σ) but outside the 90% one (1.645σ)
    off = env.f + 1.8 * np.sqrt(c)
    calib = env.calibration(off, np.full(n, c))
    assert calib["cov90"] == 0.0 and calib["cov95"] == 1.0
    assert calib["nlpd"] == pytest.approx(
        0.5 * np.log(2 * np.pi * c) + 0.5 * 1.8**2
    )
    # random posterior vs direct per-cell normal log-density (f64 oracle).
    # calibration() scores observed cells only — mask the oracle the same
    # way so the comparison stays population-correct even if the fixture
    # ever gains a table-backed partial observed_mask.
    rng = np.random.default_rng(0)
    mean = env.f + rng.normal(size=n)
    var = rng.uniform(0.1, 2.0, size=n)
    calib = env.calibration(mean, var)
    om = env.observed_mask
    dens = 0.5 * (np.log(2 * np.pi * var) + (mean - env.f) ** 2 / var)
    assert calib["nlpd"] == pytest.approx(float(dens[om].mean()), rel=1e-12)
    z = np.abs(mean - env.f) / np.sqrt(var)
    assert calib["cov95"] == pytest.approx(
        float(np.mean(z[om] <= 1.959963984540054)))
    # zero variance must not produce inf (floored)
    calib = env.calibration(env.f.copy(), np.zeros(n))
    assert np.isfinite(calib["nlpd"])


def test_calibration_test_only_masks_to_held_out_split(env):
    rng = np.random.default_rng(1)
    mean = env.f + rng.normal(size=env.n)
    var = rng.uniform(0.5, 1.5, size=env.n)
    got = env.calibration(mean, var, test_only=True)
    m = env.test_mask
    d = mean[m] - env.f[m]
    dens = 0.5 * (np.log(2 * np.pi * var[m]) + d**2 / var[m])
    assert got["nlpd"] == pytest.approx(float(dens.mean()), rel=1e-12)
    # differs from the all-cells figure on a random posterior
    assert got["nlpd"] != pytest.approx(
        env.calibration(mean, var)["nlpd"], rel=1e-6
    )
