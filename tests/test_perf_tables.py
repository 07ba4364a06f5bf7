"""Numbers-of-record freshness tripwire (round-3 VERDICT weak #2 / next #7).

The PERF:GEN blocks in benchmarks/README.md and ARCHITECTURE.md are
generated from the committed benchmark artifacts by
benchmarks/gen_perf_tables.py; hand-maintained copies are forbidden.
Driver-written artifacts (BENCH_r*.json, MULTICHIP_r*.json) land AFTER
the in-round ritual's auto-regen, so this test — which runs at the next
round's first `pytest` — is what catches them: a stale block fails here
until `python benchmarks/gen_perf_tables.py` is re-run and committed.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_module():
    spec = importlib.util.spec_from_file_location(
        "gen_perf_tables",
        os.path.join(REPO, "benchmarks", "gen_perf_tables.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_perf_blocks_match_committed_artifacts():
    """The block must be fresh w.r.t. the builder-committed artifacts.

    Exception (round-4 VERDICT weak #4): the driver writes BENCH_r{N}.json
    AFTER the builder's end-of-round snapshot, so a fresh clone at round
    open legitimately carries a BENCH artifact the committed block has
    never seen.  If the block regenerated from only the BENCH files it
    already mentions matches, the ONLY staleness is such a newer driver
    artifact — tolerated (the next `gen_perf_tables.py` run absorbs it).
    Any other drift still fails.
    """
    mod = _gen_module()
    block = mod.build_block()
    all_bench = mod.bench_artifact_names()
    for rel in ("benchmarks/README.md", "ARCHITECTURE.md"):
        with open(os.path.join(REPO, rel)) as f:
            text = f.read()
        if block in text:
            continue
        committed = [b for b in all_bench if b in text]
        fallback = mod.build_block(bench_names=committed)
        assert fallback in text, (
            f"{rel}'s numbers-of-record block is stale relative to the "
            f"committed artifacts (and not merely by a newer driver-written "
            f"BENCH_r*.json) — run `python benchmarks/gen_perf_tables.py` "
            f"and commit the result"
        )
