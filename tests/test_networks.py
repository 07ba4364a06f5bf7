"""Deep (learned) feature kernel — joint MLP + hyperparameter MLL fit."""

import numpy as np

import jax
import jax.numpy as jnp

from algp_tpu.config import FitConfig
from algp_tpu.models import gp as gp_mod
from algp_tpu.models import networks as nets
from algp_tpu.ops.kernels import KernelSpec


def make_nonlinear_feature_data(rng, n=160):
    """Phenotype with a SHARP feature effect: y = step(u) + smooth spatial
    + noise.  A stationary kernel on the raw feature must smooth across
    the step; a learned embedding can fold it flat."""
    xy = rng.uniform(0, 10, (n, 2))
    u = rng.uniform(-2, 2, (n, 1))
    y = (
        2.0 * (u[:, 0] > 0)
        - 1.0
        + 0.3 * np.sin(xy[:, 0] / 3.0)
        + 0.05 * rng.standard_normal(n)
    )
    x = np.concatenate([xy, u], axis=1).astype(np.float32)
    return x, y.astype(np.float32)


def test_deep_fit_runs_and_learns(rng):
    x, y = make_nonlinear_feature_data(rng)
    kspec = KernelSpec("rbf", "rbf", ds=2, df=1)
    mspec = nets.MLPSpec(hidden=(16,), out=3)
    cfg = FitConfig(iters=120, restarts=2, learning_rate=0.05)
    res = nets.fit_deep(kspec, mspec, cfg, jnp.asarray(x), jnp.asarray(y),
                        key=jax.random.PRNGKey(0))
    assert np.isfinite(float(res.nll))
    # the optimizer actually moved the MLP weights (joint training)
    mlp0 = nets.init_mlp(mspec, 1, jax.random.split(jax.random.PRNGKey(0))[0])
    dW = np.abs(np.asarray(res.mlp[0][0]) - np.asarray(mlp0[0][0])).max()
    assert dW > 1e-3, "MLP weights did not train"
    # NLL improved over the trace
    trace = np.asarray(res.nll_trace)
    assert float(res.nll) < trace[:, 0].min() - 1.0


def test_deep_kernel_beats_stationary_on_sharp_feature(rng):
    """Held-out RMSE: learned embedding vs stationary kernel on the raw
    feature, same data/budget (the deep-kernel capability claim)."""
    x, y = make_nonlinear_feature_data(rng, n=200)
    tr, te = np.arange(140), np.arange(140, 200)
    kspec = KernelSpec("rbf", "rbf", ds=2, df=1)
    cfg = FitConfig(iters=150, restarts=2, learning_rate=0.05)

    # plain composite kernel on the raw feature
    res_p = gp_mod.fit(kspec, cfg, jnp.asarray(x[tr]), jnp.asarray(y[tr]),
                       key=jax.random.PRNGKey(1))
    post_p = gp_mod.posterior(kspec, res_p.params, jnp.asarray(x[tr]),
                              jnp.asarray(y[tr]))
    mean_p, _ = gp_mod.predict(kspec, res_p.params, post_p, jnp.asarray(x[te]))
    rmse_p = float(np.sqrt(np.mean((np.asarray(mean_p) - y[te]) ** 2)))

    # deep kernel: joint MLP + hypers
    mspec = nets.MLPSpec(hidden=(16,), out=3)
    res_d = nets.fit_deep(kspec, mspec, cfg, jnp.asarray(x[tr]),
                          jnp.asarray(y[tr]), key=jax.random.PRNGKey(1))
    espec = nets.deep_spec(kspec, mspec)
    z_tr = nets.embed_inputs(mspec, res_d.mlp, jnp.asarray(x[tr]), 2)
    z_te = nets.embed_inputs(mspec, res_d.mlp, jnp.asarray(x[te]), 2)
    post_d = gp_mod.posterior(espec, res_d.params, z_tr, jnp.asarray(y[tr]))
    mean_d, _ = gp_mod.predict(espec, res_d.params, post_d, z_te)
    rmse_d = float(np.sqrt(np.mean((np.asarray(mean_d) - y[te]) ** 2)))

    assert np.isfinite(rmse_d) and np.isfinite(rmse_p)
    assert rmse_d < rmse_p, (rmse_d, rmse_p)


def test_embedded_inputs_flow_through_selection(rng):
    """The deep kernel is a preprocessing contract: embedded inputs feed
    the standard greedy MI loop unchanged."""
    from algp_tpu import acquisition as acq

    x, y = make_nonlinear_feature_data(rng, n=150)
    kspec = KernelSpec("rbf", "rbf", ds=2, df=1)
    mspec = nets.MLPSpec(hidden=(8,), out=2)
    cfg = FitConfig(iters=40, restarts=1)
    res = nets.fit_deep(kspec, mspec, cfg, jnp.asarray(x), jnp.asarray(y),
                        key=jax.random.PRNGKey(2))
    espec = nets.deep_spec(kspec, mspec)
    z = nets.embed_inputs(mspec, res.mlp, jnp.asarray(x), 2)
    sel = acq.greedy_select(
        espec, res.params, z, jnp.full((150,), 0.01, jnp.float32),
        jnp.zeros((0,), jnp.int32), rounds=10, num_pilot=0, strategy="mi",
    )
    s = np.asarray(sel.selected)
    assert len(np.unique(s)) == 10
    assert np.isfinite(np.asarray(sel.post_var)).all()


def test_deep_kernel_episode_end_to_end(tmp_path):
    """The deep kernel as a full episode path: joint refits re-embed the
    candidate grid, checkpoint/resume carries the MLP weights."""
    from algp_tpu.config import (
        AcquisitionConfig, EpisodeConfig, ExperimentConfig, FieldConfig,
        MLPSpec,
    )
    from algp_tpu.episode import Agent
    from algp_tpu.field import FieldEnv
    from algp_tpu.utils import checkpoint as ckpt

    spec = KernelSpec("rbf", "rbf", ds=2, df=2)
    cfg = ExperimentConfig(
        kernel=spec,
        fit=FitConfig(iters=30, restarts=1),
        acquisition=AcquisitionConfig(strategy="mi"),
        field=FieldConfig(num_rows=6, num_cols=8, num_features=2, seed=5),
        episode=EpisodeConfig(num_pilot=8, budget=16.0, num_waypoints=4,
                              samples_per_step=4, seed=0),
        deep=MLPSpec(hidden=(8,), out=2),
    )
    env = FieldEnv(cfg.field, spec)
    agent = Agent(env, cfg)
    result = agent.run(max_steps=5)
    assert len(result.history) > 1
    assert np.isfinite(result.rmse)
    assert agent._mlp is not None
    # the candidate matrix the device sees is the EMBEDDED one
    assert agent._Xdev.shape == (env.n, 2 + 2)
    # checkpoint round-trips the MLP and resume adopts it
    path = str(tmp_path / "deep.npz")
    ckpt.save(path, result.state)
    st = ckpt.load(path)
    assert st.mlp is not None and len(st.mlp) == 2
    np.testing.assert_allclose(
        np.asarray(st.mlp[0][0]), np.asarray(result.state.mlp[0][0])
    )
    env2 = FieldEnv(cfg.field, spec)
    agent2 = Agent(env2, cfg)
    r2 = agent2.run(max_steps=6, resume_from=st)
    assert np.isfinite(r2.rmse)


def test_cli_greedy_deep_kernel(capsys):
    from algp_tpu import cli

    rc = cli.main([
        "--strategy", "mi", "--rows", "5", "--cols", "8", "--features", "2",
        "--acq-rounds", "6", "--num-pilot", "5",
        "--deep-hidden", "8", "--deep-out", "2",
        "--iters", "15", "--restarts", "1", "--mode", "greedy",
    ])
    assert rc == 0
    import json

    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert np.isfinite(rec["final_rmse"])

def test_weight_decay_shrinks_embedding_weights(rng):
    """MLPSpec.weight_decay: the L2 prior on embedding weights must pull
    the fitted weight norm down (the DKL overfitting mitigation measured
    in benchmarks/deepkernel_study.py)."""
    from algp_tpu.config import MLPSpec

    x, y = make_nonlinear_feature_data(rng, n=120)
    spec = KernelSpec("matern52", "rbf", ds=2, df=1)
    cfg = FitConfig(iters=60, restarts=1)
    key = jax.random.PRNGKey(0)

    def wnorm(mlp):
        return float(sum(float(jnp.sum(W * W)) for W, _ in mlp))

    free = nets.fit_deep(
        spec, MLPSpec(hidden=(8,), out=2, weight_decay=0.0), cfg,
        jnp.asarray(x), jnp.asarray(y), key=key,
    )
    tight = nets.fit_deep(
        spec, MLPSpec(hidden=(8,), out=2, weight_decay=5.0), cfg,
        jnp.asarray(x), jnp.asarray(y), key=key,
    )
    assert np.isfinite(float(free.nll)) and np.isfinite(float(tight.nll))
    assert wnorm(tight.mlp) < wnorm(free.mlp)
    # the penalized objective includes the prior term, so the free fit's
    # raw nll must be <= the tight fit's penalized one minus its penalty
    assert wnorm(tight.mlp) < 0.9 * wnorm(free.mlp)


def test_deep_fit_honors_optimizer_and_validates_activation(rng):
    """fit_deep runs through gp._opt_loop: optimizer='lbfgs' must train
    (it was silently ignored by the old hand-rolled Adam loop) and an
    unknown optimizer/activation must raise instead of silently mapping
    to a default."""
    import pytest

    x, y = make_nonlinear_feature_data(rng)
    kspec = KernelSpec("rbf", "rbf", ds=2, df=1)
    mspec = nets.MLPSpec(hidden=(8,), out=2)
    res = nets.fit_deep(kspec, mspec, FitConfig(iters=30, restarts=1,
                                                optimizer="lbfgs"),
                        jnp.asarray(x), jnp.asarray(y),
                        key=jax.random.PRNGKey(1))
    assert np.isfinite(float(res.nll))
    with pytest.raises(ValueError, match="unknown optimizer"):
        nets.fit_deep(kspec, mspec, FitConfig(iters=5, optimizer="sgd"),
                      jnp.asarray(x), jnp.asarray(y))
    with pytest.raises(ValueError, match="activation"):
        nets.embed_features(
            nets.MLPSpec(activation="gelu"),
            nets.init_mlp(nets.MLPSpec(activation="gelu"), 1,
                          jax.random.PRNGKey(0)),
            jnp.ones((4, 1), jnp.float32),
        )
