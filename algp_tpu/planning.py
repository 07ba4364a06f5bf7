"""L3 — informative-path planning over the row-structured field (host side).

Capability parity (SURVEY.md §2 C11; BASELINE.json:11): the reference
builds a networkx graph over the field (nodes at grid points, edges along
crop rows, row switching at the two headlands), enumerates budgeted paths
from the robot's pose, and expands each path into a path-constrained
candidate sample set which the acquisition layer scores.

This stays host-side Python by design (BASELINE.json:5: "the informative-
path/sampling orchestration … stays host-side Python but calls only jitted
device functions") — path enumeration is branchy, irregular, tiny
(hundreds of paths over a 1k-10k grid) and completely dominated by the
device-side set scoring it feeds.  The output is a *padded index tensor*
(num_paths, k_max) + sizes/costs so the whole path batch is scored by one
vmapped device call (acquisition.score_candidate_sets).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import networkx as nx
import numpy as np

from algp_tpu.field import FieldEnv


@dataclasses.dataclass
class PathBatch:
    """Device-ready batch of candidate paths.

    node_seqs : list of full node sequences (host bookkeeping / traversal)
    sets      : (P, k_max) int32 — sample-set indices, padded with 0
    sizes     : (P,) int32 — true set sizes
    costs     : (P,) float32 — path traversal costs
    ends      : (P,) int32 — final pose (grid index) of each path
    """

    node_seqs: list
    sets: np.ndarray
    sizes: np.ndarray
    costs: np.ndarray
    ends: np.ndarray

    def __len__(self):
        return len(self.node_seqs)


def build_field_graph(env: FieldEnv) -> nx.Graph:
    """Row-crop traversal graph: along-row edges everywhere; between-row
    edges only at the two headland columns (col 0 and col num_cols-1)."""
    g = nx.Graph()
    nr, nc = env.num_rows, env.num_cols
    cs, rs = env.cfg.col_spacing, env.cfg.row_spacing
    for r in range(nr):
        for c in range(nc):
            i = r * nc + c
            g.add_node(i)
            if c + 1 < nc:
                g.add_edge(i, i + 1, weight=cs)
    for r in range(nr - 1):
        for c in (0, nc - 1):
            g.add_edge(r * nc + c, (r + 1) * nc + c, weight=rs)
    return g


def _row_segments(env: FieldEnv, start: int, budget: float, max_turns: int):
    """Enumerate boustrophedon-style paths: runs along the current row,
    optional headland switch, runs along the next row, … up to `max_turns`
    row changes, pruned by budget.  Yields (node_seq, cost).

    Deterministic enumeration order (row deltas ascending, direction
    left-before-right) so experiments are reproducible run-to-run.
    """
    nc = env.num_cols
    cs, rs = env.cfg.col_spacing, env.cfg.row_spacing

    def switch_rows(seq: list, cost: float, turns: int, r: int, c: int):
        """Headland row switches from the current end of `seq`."""
        for dr in (-1, 1):
            rr = r + dr
            if 0 <= rr < env.num_rows and cost + rs <= budget:
                nxt = rr * nc + c
                if nxt not in seq:
                    yield seq + [nxt], cost + rs
                    yield from extend(seq + [nxt], cost + rs, turns - 1)

    def extend(seq: list, cost: float, turns: int) -> Iterator:
        node = seq[-1]
        r, c = divmod(node, nc)
        # runs along the row in both directions; every prefix is a path
        for direction in (-1, 1):
            run: list = []
            cc, acc = c, cost
            while 0 <= cc + direction < nc and acc + cs <= budget:
                cc += direction
                acc += cs
                run.append(r * nc + cc)
                yield seq + list(run), acc
                # reached a headland mid-path → may switch rows and go on
                if turns > 0 and cc in (0, nc - 1):
                    yield from switch_rows(seq + list(run), acc, turns, r, cc)
        # already standing at a headland → may switch immediately
        if turns > 0 and c in (0, nc - 1):
            yield from switch_rows(seq, cost, turns, r, c)

    yield from extend([start], 0.0, max_turns)


def enumerate_paths(
    env: FieldEnv,
    start: int,
    budget: float,
    *,
    goal: Optional[int] = None,
    max_paths: int = 256,
    max_turns: int = 2,
    min_cost_frac: float = 0.5,
) -> list[tuple[list[int], float]]:
    """Budgeted path enumeration from the current pose (C11).

    `goal=None` (free mode): prefers paths that use at least
    `min_cost_frac` of the budget slice (short stubs waste replanning
    overhead); falls back to everything enumerated if none qualify.

    `goal=<node>` (goal-conditioned — SURVEY.md §2 C11 `[R]`:
    enumeration "between current pose and goal"): only paths ENDING at
    the goal node within the budget are candidates — the waypoint-
    directed planning the reference's robot simulator drives.  The
    short-stub preference is meaningless here (every candidate reaches
    the goal), so min_cost_frac is ignored; an empty result means the
    goal is unreachable within the budget slice.

    Deterministic either way: stable enumeration order, longest-first
    among equal-cost.

    Engine: the native C enumerator (`algp_tpu.native/pathenum.c`) when
    a C compiler is available — the Python generator's per-prefix list
    churn measured 15-23 ms per planning step at the 1M grid, the C path
    is < 1 ms with identical semantics (equality-pinned by
    tests/test_field_planning.py; `ALGP_TPU_NO_NATIVE=1` forces Python).
    """
    from algp_tpu import native

    res = native.enumerate_paths_native(
        env.num_rows, env.num_cols,
        float(env.cfg.col_spacing), float(env.cfg.row_spacing),
        int(start), float(budget), max_paths, max_turns, min_cost_frac,
        goal=-1 if goal is None else int(goal),
    )
    if res is not None:
        return res
    all_paths = []
    seen = set()
    for seq, cost in _row_segments(env, start, budget, max_turns):
        if goal is not None and seq[-1] != goal:
            continue
        key = (seq[-1], len(seq), round(cost, 6))
        if goal is not None and len(seq) > 1:
            # with the end pinned to the goal, distinct routes routinely
            # share (len, cost) on a uniform grid — extend the key with
            # two interior route nodes so the scorer keeps real choices
            # (free mode keeps the original key bit-for-bit)
            key = key + (seq[1], seq[len(seq) // 2])
        if key in seen:
            continue
        seen.add(key)
        all_paths.append((seq, cost))
        if len(all_paths) >= max_paths * 8:
            break
    if goal is None:
        good = [p for p in all_paths if p[1] >= min_cost_frac * budget]
        if not good:
            good = all_paths
    else:
        good = all_paths
    # prefer long informative paths; deterministic tie-break on node seq
    good.sort(key=lambda p: (-p[1], p[0]))
    return good[:max_paths]


def paths_to_batch(
    env: FieldEnv,
    paths: list[tuple[list[int], float]],
    *,
    k_max: int = 10,
) -> PathBatch:
    """Expand enumerated paths into the padded device-ready sample-set batch.

    Each path's candidate set is its node sequence thinned uniformly to at
    most `k_max` sample sites (the robot can't stop everywhere)."""
    P = len(paths)
    sets = np.zeros((P, k_max), np.int32)
    sizes = np.zeros((P,), np.int32)
    costs = np.zeros((P,), np.float32)
    ends = np.zeros((P,), np.int32)
    seqs = []
    for p, (seq, cost) in enumerate(paths):
        nodes = seq[1:] if len(seq) > 1 else seq  # exclude current pose
        if len(nodes) > k_max:
            pick = np.linspace(0, len(nodes) - 1, k_max).round().astype(int)
            pick = np.unique(pick)
            nodes = [nodes[i] for i in pick]
        sets[p, : len(nodes)] = nodes
        sizes[p] = len(nodes)
        costs[p] = cost
        ends[p] = seq[-1]
        seqs.append(seq)
    return PathBatch(node_seqs=seqs, sets=sets, sizes=sizes, costs=costs, ends=ends)


def enumerate_batch(
    env: FieldEnv,
    start: int,
    budget: float,
    *,
    goal: Optional[int] = None,
    max_paths: int = 256,
    k_max: int = 10,
    max_turns: int = 2,
    min_cost_frac: float = 0.5,
) -> PathBatch:
    """`enumerate_paths` + `paths_to_batch` in one call — the episode's
    per-step entry.  On the native engine this skips the intermediate
    list-of-lists entirely (node sequences stay numpy views over the C
    arena buffer), which is where most of the enumeration wall-clock
    went at large grids; thinning/cost/end math is IDENTICAL to
    `paths_to_batch` (same np.linspace/round/unique calls on the same
    scalars), so the resulting batch is bit-equal either way."""
    from algp_tpu import native

    raw = native.enumerate_paths_raw(
        env.num_rows, env.num_cols,
        float(env.cfg.col_spacing), float(env.cfg.row_spacing),
        int(start), float(budget), max_paths, max_turns, min_cost_frac,
        k_max=k_max, goal=-1 if goal is None else int(goal),
    )
    if raw is None:
        return paths_to_batch(
            env,
            enumerate_paths(env, start, budget, goal=goal,
                            max_paths=max_paths, max_turns=max_turns,
                            min_cost_frac=min_cost_frac),
            k_max=k_max,
        )
    all_nodes, offs, lens, costs_d, P, sets, sizes, ends = raw
    seqs = [all_nodes[offs[p]: offs[p] + lens[p]] for p in range(P)]
    return PathBatch(node_seqs=seqs, sets=sets[:P], sizes=sizes[:P],
                     costs=costs_d[:P].astype(np.float32), ends=ends[:P])


def boustrophedon_order(env: FieldEnv) -> np.ndarray:
    """Naive full-coverage sweep (serpentine row order) — the reference's
    shortest-path/naive baseline traversal order (C12 strategy dispatch)."""
    order = []
    for r in range(env.num_rows):
        cols = range(env.num_cols) if r % 2 == 0 else range(env.num_cols - 1, -1, -1)
        order.extend(r * env.num_cols + c for c in cols)
    return np.asarray(order, np.int64)
