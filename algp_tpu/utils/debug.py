"""Numerical-health checking (SURVEY.md §5 "race detection / sanitizers").

There are no data races on a single TPU chip; the failure modes of this
workload are numerical — NaN/Inf from a non-SPD factorization, exploding
hyperparameters, collapsed noise.  This module provides:

  * `checked(fn)` — a `jax.experimental.checkify` wrapper that turns
    silent device NaNs into host-visible errors (use in tests/debug runs;
    it inserts guards into the jitted program, so keep it off hot paths),
  * `assert_finite_tree` — host-side post-hoc validation of any pytree,
  * `fit_health_report` — quick diagnosis of a FitResult (which restarts
    diverged, final vs best NLL, hyperparameter ranges).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.experimental import checkify


def checked(fn, *, errors=checkify.float_checks):
    """Wrap a jittable fn so NaN/Inf raise `checkify.JaxRuntimeError`.

    Usage:
        err, out = debug.checked(my_fn)(*args)
        err.throw()  # raises with location info if a NaN appeared
    """
    return jax.jit(checkify.checkify(fn, errors=errors))


def assert_finite_tree(tree: Any, name: str = "tree") -> None:
    """Host-side: every leaf of the pytree must be finite."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            keys = "/".join(str(p) for p in path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{'/' + keys if keys else ''}: {bad} non-finite "
                f"of {arr.size} entries"
            )


def fit_health_report(fit_result) -> dict:
    """Summarize a models.gp.FitResult for debugging/monitoring."""
    nlls = np.asarray(fit_result.all_nlls)
    trace = np.asarray(fit_result.nll_trace)
    p = fit_result.params
    report = {
        "restarts": int(nlls.shape[0]),
        "diverged_restarts": int((~np.isfinite(nlls)).sum()),
        "best_restart": int(fit_result.best_restart),
        "best_nll": float(fit_result.nll),
        "nll_spread": float(np.nanmax(nlls) - np.nanmin(nlls))
        if np.isfinite(nlls).any()
        else float("nan"),
        "ls_spatial": np.exp(np.asarray(p.log_ls_spatial)).tolist(),
        "ls_feature": np.exp(np.asarray(p.log_ls_feature)).tolist(),
        "outputscale": float(np.exp(p.log_outputscale)),
        "noise_std": float(np.exp(p.log_noise)),
    }
    if trace.size:
        first = trace[int(fit_result.best_restart), 0]
        report["nll_improvement"] = float(first - fit_result.nll)
    return report
