"""100k-candidate Krause-MI selection via the low-rank complement
precision (algp_tpu.acquisition_lowrank) — the scale the exact path
cannot reach (its N×N seed would be 40 GB of HBM at N = 102 400).

Workload mirrors bench.py's north star one decade up: multi-restart MLL
fit on a pilot set + 50 greedy MI selections over a 320×320 grid, fused
into ONE device program (fit_and_select_lowrank, k-center inducing design
computed in-program).

    python benchmarks/lowrank_bench.py [--n-grid 320] [--inducing 1024]
        [--rounds 50] [--json benchmarks/lowrank_r0N.json]

Timing follows the repo rule: jitted program → device-side reduce →
scalar transfer, median over warm reps (benchmarks/README.md).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-grid", type=int, default=320)
    ap.add_argument("--inducing", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=50)
    ap.add_argument("--num-pilot", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from algp_tpu import acquisition_lowrank as lr
    from algp_tpu.config import FitConfig
    from algp_tpu.ops.kernels import KernelSpec

    n = args.n_grid
    N = n * n
    rng = np.random.default_rng(0)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32), indexing="ij")
    x = np.stack([xs.ravel(), ys.ravel()], axis=1)
    x += rng.uniform(-0.05, 0.05, x.shape).astype(np.float32)

    spec = KernelSpec("matern32", ds=2)
    fitcfg = FitConfig(iters=60, restarts=4)
    pilot = rng.choice(N, size=args.num_pilot, replace=False).astype(np.int32)
    # synthetic observations at the pilots (any smooth function works —
    # the fit only needs a plausible MLL landscape)
    y = np.sin(0.05 * x[pilot, 0]) * np.cos(0.07 * x[pilot, 1])
    y = (y + 0.1 * rng.standard_normal(args.num_pilot)).astype(np.float32)

    xj = jnp.asarray(x)
    x_train = xj[jnp.asarray(pilot)]
    yj = jnp.asarray(y)

    def run():
        t0 = time.perf_counter()
        fit_res, sel = lr.fit_and_select_lowrank(
            spec, fitcfg, x_train, yj, xj, jnp.asarray(pilot),
            rounds=args.rounds, num_pilot=args.num_pilot,
            num_inducing=args.inducing, use_pallas=True,
        )
        # force full completion: device-side reduce + scalar transfer
        s = int(np.asarray(jnp.sum(sel.selected)))
        return (time.perf_counter() - t0) * 1e3, s, sel

    wall_cold, _, sel = run()
    sel_idx = np.asarray(sel.selected)
    assert len(np.unique(sel_idx)) == args.rounds, "duplicate selections"
    assert not np.isin(sel_idx, pilot).any(), "re-selected a pilot"

    walls = [run()[0] for _ in range(args.reps)]
    warm = float(np.median(walls))
    rec = {
        "metric": f"lowrank_fit_plus_{args.rounds}_MI_selections_N{N}",
        "value": round(warm, 2),
        "unit": "ms",
        "n_candidates": N,
        "num_inducing": args.inducing,
        "cold_ms": round(wall_cold, 1),
        "reps_ms": [round(w, 2) for w in walls],
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
