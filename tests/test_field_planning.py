"""Field environment + path planning tests (C10, C11)."""

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
