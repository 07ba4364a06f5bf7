"""Native (C) host-runtime components.

The compute path is JAX/XLA/Pallas on the TPU; the host runtime around
it is Python except where measured cost justifies native code.  Current
members:

  pathenum.c — budgeted path enumeration (planning.enumerate_paths's
    engine): the Python generator's per-prefix list churn measured
    15-23 ms per planning step at the 1M grid; the C enumerator is
    < 1 ms with exactly the same enumeration semantics (equality-pinned
    by tests/test_field_planning.py).

Build model: compiled on first use with the system C compiler into
``~/.cache/algp_tpu/native/<name>-<source-hash>.so`` (hash-keyed, so
stale binaries are never loaded after a source edit) and bound via
ctypes.  No compiler, no permissions, or any build failure degrades
silently to the Python implementation — the native layer is an
accelerator, never a dependency.  ``ALGP_TPU_NO_NATIVE=1`` disables it.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_lib_cache: dict = {}


def _build(name: str):
    """Compile + load <name>.c, cached on disk by source hash."""
    if os.environ.get("ALGP_TPU_NO_NATIVE"):
        return None
    if name in _lib_cache:
        return _lib_cache[name]
    try:
        src = os.path.join(_SRC_DIR, f"{name}.c")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        out_dir = os.path.expanduser("~/.cache/algp_tpu/native")
        os.makedirs(out_dir, exist_ok=True)
        so = os.path.join(out_dir, f"{name}-{digest}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)  # atomic vs concurrent builders
        lib = ctypes.CDLL(so)
    except Exception:
        lib = None
    _lib_cache[name] = lib
    return lib


def _pathenum_lib():
    lib = _build("pathenum")
    if lib is not None and not getattr(lib, "_algp_sigs", False):
        lib.algp_enumerate_paths.restype = ctypes.c_int
        lib.algp_enumerate_paths.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib._algp_sigs = True
    return lib


def enumerate_paths_raw(
    num_rows: int, num_cols: int, col_spacing: float, row_spacing: float,
    start: int, budget: float, max_paths: int, max_turns: int,
    min_cost_frac: float, k_max: int = 0, goal: int = -1,
):
    """C path enumeration, array form: (nodes, offs, lens, costs, n) with
    path k's node sequence at nodes[offs[k]:offs[k]+lens[k]], or None
    when native is unavailable (caller falls back to Python).  With
    k_max > 0 additionally returns the device-ready thinned batch:
    (..., sets (max_paths, k_max), sizes, ends)."""
    lib = _pathenum_lib()
    if lib is None:
        return None
    costs = np.zeros(max_paths, np.float64)
    lens = np.zeros(max_paths, np.int32)
    offs = np.zeros(max_paths, np.int64)
    # worst-case nodes per selected path ≈ budget / min(spacing) + turns
    per = int(budget / max(1e-9, min(col_spacing, row_spacing))) + 4
    nodes = np.empty(max_paths * per, np.int32)
    if k_max > 0:
        sets = np.empty((max_paths, k_max), np.int32)
        sizes = np.empty(max_paths, np.int32)
        ends = np.empty(max_paths, np.int32)
        pset = sets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        psiz = sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        pend = ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        pset = psiz = pend = None
    n = lib.algp_enumerate_paths(
        num_rows, num_cols, col_spacing, row_spacing, start, goal, budget,
        max_paths, max_turns, min_cost_frac,
        costs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nodes.shape[0],
        k_max, pset, psiz, pend,
    )
    if n < 0:  # OOM / undersized buffer — let Python handle it
        return None
    if k_max > 0:
        return nodes, offs, lens, costs, n, sets, sizes, ends
    return nodes, offs, lens, costs, n


def enumerate_paths_native(
    num_rows: int, num_cols: int, col_spacing: float, row_spacing: float,
    start: int, budget: float, max_paths: int, max_turns: int,
    min_cost_frac: float, goal: int = -1,
):
    """C path enumeration; returns list[(node_seq, cost)] exactly as
    planning's Python enumerator, or None when native is unavailable
    (caller falls back)."""
    raw = enumerate_paths_raw(
        num_rows, num_cols, col_spacing, row_spacing, start, budget,
        max_paths, max_turns, min_cost_frac, goal=goal,
    )
    if raw is None:
        return None
    nodes, offs, lens, costs, n = raw
    return [
        (nodes[offs[k]: offs[k] + lens[k]].tolist(), float(costs[k]))
        for k in range(n)
    ]
