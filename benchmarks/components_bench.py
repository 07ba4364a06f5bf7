"""Granular component benchmarks on the real TPU (perf regression harness,
SURVEY.md §4 item 6).  Prints one JSON line per component.

    python benchmarks/components_bench.py [--n 10000] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


_reduce = None


def _reducer():
    """Device-side reduction to one scalar: forces the full computation
    (no dead-code slicing) while the host transfer is 4 bytes.  Timing via
    block_until_ready alone under-reports on this TPU plugin, and pulling
    whole result tensors to the host would time the tunnel, not the chip."""
    global _reduce
    if _reduce is None:
        import jax
        import jax.numpy as jnp

        _reduce = jax.jit(
            lambda t: sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))
        )
    return _reduce


def force(x):
    return float(np.asarray(_reducer()(x)))


def bench(label, fn, iters=3, results=None):
    force(fn())  # warm-up (compile)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn())
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    rec = {"component": label, "ms": round(ms, 2)}
    print(json.dumps(rec), flush=True)
    if results is not None:
        results.append(rec)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from algp_tpu import acquisition as acq
    from algp_tpu.config import FitConfig
    from algp_tpu.models import gp as gp_mod
    from algp_tpu.ops import gram as gmod
    from algp_tpu.ops import linalg as la
    from algp_tpu.ops.kernels import KernelSpec

    N = args.n
    side = int(np.sqrt(N))
    N = side * side
    spec = KernelSpec("rbf", ds=2)
    cspec = KernelSpec("matern52", "rbf", ds=2, df=3)
    params = spec.init_params(ls_spatial=8.0, noise=0.1)
    cparams = cspec.init_params(ls_spatial=8.0, noise=0.1)
    rng = np.random.default_rng(0)
    gx, gy = np.meshgrid(np.arange(float(side)), np.arange(float(side)))
    X = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], 1), jnp.float32)
    Xf = jnp.asarray(
        np.concatenate([np.asarray(X), rng.standard_normal((N, 3))], 1),
        jnp.float32,
    )
    nv = jnp.full((N,), 0.01, jnp.float32)
    pilot = jnp.asarray(np.linspace(0, N - 1, 32).round(), jnp.int32)

    results = []
    r = results

    gram_j = jax.jit(lambda X: gmod.gram_pallas(spec, params, X, X))
    bench(f"pallas_gram_rbf_N{N}", lambda: gram_j(X), results=r)
    gramc_j = jax.jit(lambda X: gmod.gram_pallas(cspec, cparams, X, X))
    bench(f"pallas_gram_composite_N{N}", lambda: gramc_j(Xf), results=r)

    # dense-linalg rows run at the PRODUCTION shape: the selection paths
    # 512-align the candidate axis (acquisition.pad_candidates)
    Xp, nvp = acq.pad_candidates(X, nv, align=512)
    Na = Xp.shape[0]
    K = gmod.gram_pallas_with_noise(spec, params, Xp, nvp / params.noise_var)
    chol_j = jax.jit(jnp.linalg.cholesky)
    bench(f"cholesky_xla_N{Na}", lambda: chol_j(K), results=r)

    from algp_tpu.ops import pallas_chol as pc

    bench(
        f"cholesky_pallas_N{Na}",
        lambda: jax.jit(pc.cholesky_pallas)(K), results=r,
    )
    bench(
        f"cholesky_pallas_lookahead_N{Na}",
        lambda: jax.jit(pc.cholesky_pallas_la)(K), results=r,
    )
    L = chol_j(K)
    tri_j = jax.jit(la.tri_inv)
    bench(f"tri_inv_N{Na}", lambda: tri_j(L), results=r)
    seed_j = jax.jit(
        lambda X: acq.implicit_complement_precision(spec, params, X, nvp)[0]
    )
    bench(f"mi_implicit_seed_W_N{Na}", lambda: seed_j(Xp), results=r)

    from algp_tpu.ops import updates as upd

    W = tri_j(L)
    j50 = jnp.asarray(Na // 2, jnp.int32)
    bench(
        f"wtw_column_streamed_N{Na}",
        lambda: upd.wtw_column_streamed(W, j50, tile=512), results=r,
    )
    bench(
        f"wtw_column_pipelined_N{Na}",
        lambda: upd.wtw_column_pipelined(W, j50, tile=512), results=r,
    )

    B = jnp.asarray(rng.standard_normal((512, 700)).astype(np.float32))
    rhs_j = jax.jit(lambda L, B: la.blocked_solve_triangular(L, B))
    L512 = chol_j(
        gmod.gram_pallas_with_noise(spec, params, X[:512], nv[:512] / params.noise_var)
    )
    bench("blocked_trisolve_512x700", lambda: rhs_j(L512, B), results=r)

    x_tr = X[pilot]
    y_tr = jnp.asarray(rng.standard_normal(32), jnp.float32)
    fitcfg = FitConfig(iters=100, restarts=4)
    bench(
        "fit_adam100x4_n32",
        lambda: gp_mod.fit(spec, fitcfg, x_tr, y_tr).nll,
        results=r,
    )
    fit_res = gp_mod.fit(spec, fitcfg, x_tr, y_tr)
    post = gp_mod.posterior(spec, fit_res.params, x_tr, y_tr)
    bench(
        f"predict_grid_N{N}",
        lambda: gp_mod.predict(spec, fit_res.params, post, X, use_pallas=True),
        results=r,
    )

    bench(
        f"greedy_entropy_50r_N{N}",
        lambda: acq.greedy_select(
            spec, params, X, nv, pilot, rounds=50, num_pilot=32,
            strategy="entropy",
        ).selected,
        results=r,
    )
    bench(
        f"greedy_mi_50r_N{N}",
        lambda: acq.greedy_select(
            spec, params, X, nv, pilot, rounds=50, num_pilot=32, strategy="mi"
        ).selected,
        results=r,
    )

    # ---- low-rank (inducing-point) components at 10× the exact scale
    from algp_tpu import acquisition_lowrank as acq_lr

    side_lr = 320
    N_lr = side_lr * side_lr
    gx2, gy2 = np.meshgrid(np.arange(float(side_lr)), np.arange(float(side_lr)))
    X_lr = jnp.asarray(np.stack([gx2.ravel(), gy2.ravel()], 1), jnp.float32)
    nv_lr = jnp.full((N_lr,), 0.01, jnp.float32)
    M = 1024
    bench(
        f"kcenter_design_M{M}_N{N_lr}",
        lambda: acq_lr.kcenter_indices(X_lr, M), results=r,
    )
    z_lr = X_lr[acq_lr.kcenter_indices(X_lr, M)]
    params_lr = spec.init_params(ls_spatial=25.0, noise=0.1)
    bench(
        f"lowrank_seed_M{M}_N{N_lr}",
        lambda: acq_lr.lowrank_precision_seed(
            spec, params_lr, X_lr, nv_lr, z_lr, use_pallas=True
        ).pdiag,
        results=r,
    )
    pilot_lr = jnp.asarray(np.linspace(0, N_lr - 1, 64).round(), jnp.int32)
    bench(
        f"greedy_mi_lowrank_50r_M{M}_N{N_lr}",
        lambda: acq_lr.greedy_select_lowrank(
            spec, params_lr, X_lr, nv_lr, pilot_lr, z_lr,
            rounds=50, num_pilot=64, use_pallas=True,
        ).selected,
        results=r,
    )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
