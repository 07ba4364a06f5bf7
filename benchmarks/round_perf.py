"""Per-round performance + hardware-fidelity ritual (SURVEY.md §4 item 6;
VERDICT r1 next-round #3/#8).

Runs, on the real TPU:
  1. the on-hardware fidelity suite (50-round selections ≡ f64 oracle,
     exact + low-rank + SGPR),
  2. the perf-budget suite (episode < 1 s assertion),
  3. bench.py (the headline number),
  4. the 10k-grid config-5 episode benchmark,
  4b. the 20k config-5 episode (the auto-selected low-rank planner —
     the measured crossover preset),
  5. the 100k low-rank selection benchmark,
  6. the 100k config-5 episode benchmark,
  7. the 1M config-5 episode benchmark (8 steps),
  8. the 1M LONG-campaign benchmark (SGPR refits + low-rank planning),
  9. the 4.19M config-5 episode benchmark (the ladder's ceiling),
and writes one committed artifact benchmarks/round_r{N}.json so perf and
fidelity regressions leave a paper trail per round, not just in driver
logs.  Each episode's per-step time is asserted against a REGRESSION
BUDGET ≈ 2.2× the best committed artifact (round-2 VERDICT weak #4: the
1 s north-star budget alone let a 4× regression pass) — wide enough for
the shared pool's honest day band, tight enough that a real 2× slowdown
fails the ritual.

    python benchmarks/round_perf.py --round 3
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: per-step regression budgets ≈ 2.2× the best committed artifact
#: (episode10k/20k/100k/1m steady state: ~102 / ~54 / ~90 / ~200 ms per
#: step, benchmarks/README.md) — a transient pool band passes, a real
#: 2× slowdown fails.  The SINGLE source for both this ritual and the
#: pytest hardware gate (tests/test_perf.py::test_episode_ladder_budget,
#: VERDICT r3 #8); 4M/long stay ritual-only for time.
BUDGETS_MS = {"episode10k": 230.0, "episode20k": 130.0,
              # 100k tightened for the round-5 warm-refit retune (100/3:
              # steady 76.6 ms measured, quality n.s. over 5 paired
              # seeds — benchmarks/warmrefit_100k_r05.json)
              "episode100k": 200.0,
              # 1M/4M tightened for the round-4 explicit-inverse matmul
              # solves (steady 151/213 ms measured; keep the usual
              # ~2.3-2.6x pool-weather margin)
              "episode1m": 400.0, "episode1m_long": 310.0,
              "episode4m": 560.0}


def run(cmd, env_extra=None, timeout=900, retries=0):
    """Run a benchmark subprocess; `retries` re-runs it — but ONLY on
    the transient pool-weather error class (runtime RESOURCE_EXHAUSTED:
    another tenant's residency colliding with a big-peak program — a
    c5_1m synthesis that fit minutes earlier failed, then fit again).
    Any other nonzero exit (assertion, NaN crash) is returned as-is:
    a ritual artifact must record regressions, not paper over them.
    Returns (rc, stdout_lines, retry_count) — retries taken are recorded
    in the artifact so a weather-assisted pass leaves a trace."""
    env = dict(os.environ)
    # APPEND the repo to PYTHONPATH (never clobber: the TPU plugin's
    # site dir must stay on it — see CLAUDE.md)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if env_extra:
        env.update(env_extra)
    retried = 0
    for attempt in range(retries + 1):
        try:
            p = subprocess.run(
                cmd, cwd=REPO, env=env, capture_output=True, text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired as e:
            # a pool degradation episode (trivial ops observed at 150+ s)
            # can push any bench past its timeout — record the failure in
            # the artifact instead of crashing the whole ritual and
            # discarding the results already collected
            tail = (e.stdout or b"")
            if isinstance(tail, bytes):
                tail = tail.decode(errors="replace")
            print(f"# TIMEOUT after {timeout}s: {' '.join(cmd[-4:])}",
                  file=sys.stderr)
            return -1, (tail.strip().splitlines()[-5:]
                        + [f"TIMEOUT after {timeout}s"]), retried
        if p.returncode == 0 or attempt == retries:
            break
        if "RESOURCE_EXHAUSTED" not in (p.stderr or "") + (p.stdout or ""):
            break  # real failure — do not mask it with a rerun
        retried += 1
        print(f"# retrying ({attempt + 1}) after transient "
              f"RESOURCE_EXHAUSTED: {' '.join(cmd[-4:])}", file=sys.stderr)
    return p.returncode, p.stdout.strip().splitlines(), retried


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()
    py = sys.executable
    out = {"round": args.round,
           "date": datetime.date.today().isoformat()}

    def pytest_ok(rc, lines):
        """A SKIPPED suite must not count as a pass — skips happen when
        the TPU plugin silently falls back to CPU, which is exactly the
        failure this artifact exists to catch."""
        summary = lines[-1] if lines else ""
        return rc == 0 and "passed" in summary and "skipped" not in summary

    rc, lines, rt = run(
        [py, "-m", "pytest", "tests/test_hw_fidelity.py", "-q"],
        env_extra={"ALGP_TPU_HW": "1"}, timeout=3000,
    )
    out["hw_fidelity"] = {
        "ok": pytest_ok(rc, lines),
        "summary": lines[-1] if lines else "",
    }

    # the ladder-budget gate (test_episode_ladder_budget) re-runs the
    # same episode benches this ritual executes below and asserts the
    # same BUDGETS_MS — skip it here so the ritual doesn't pay the
    # ladder twice; standalone ALGP_TPU_PERF=1 pytest runs still cover it
    rc, lines, rt = run(
        [py, "-m", "pytest", "tests/test_perf.py", "-q",
         "-k", "not ladder"],
        env_extra={"ALGP_TPU_PERF": "1"}, timeout=1800,
    )
    out["perf_budget"] = {
        "ok": pytest_ok(rc, lines),
        "summary": lines[-1] if lines else "",
    }

    def bench_json(key, cmd, timeout=900, retries=0):
        """Run a JSON-line benchmark; record its parsed record (plus the
        transient-retry count, so a weather-assisted pass is visible)."""
        rc, lines, rt = run(cmd, timeout=timeout, retries=retries)
        try:
            rec = json.loads(lines[-1]) if rc == 0 and lines else {
                "ok": False, "tail": lines[-3:],
            }
        except json.JSONDecodeError:
            # keep the paper trail even if a stray final stdout line
            # (warning, deprecation notice) shadows the JSON record
            rec = {"ok": False, "raw_tail": lines[-3:]}
        if rt:
            rec["transient_retries"] = rt
        out[key] = rec

    bench_json("bench", [py, "bench.py"])
    bench_json("episode10k",
               [py, "benchmarks/episode10k_bench.py", "--steps", "10"],
               retries=1)
    bench_json("episode20k",
               [py, "benchmarks/episode10k_bench.py", "--preset", "c5_20k",
                "--steps", "12"], timeout=2400, retries=1)
    bench_json("lowrank100k", [py, "benchmarks/lowrank_bench.py"],
               timeout=2400, retries=1)
    bench_json("episode100k",
               [py, "benchmarks/episode10k_bench.py", "--preset", "c5_100k",
                "--steps", "10"], timeout=2400, retries=1)
    bench_json("episode1m",
               [py, "benchmarks/episode10k_bench.py", "--preset", "c5_1m",
                "--steps", "8"], timeout=3600, retries=1)
    bench_json("episode1m_long",
               [py, "benchmarks/episode10k_bench.py", "--preset",
                "c5_1m_long", "--steps", "100"], timeout=3600, retries=1)
    bench_json("episode4m",
               [py, "benchmarks/episode10k_bench.py", "--preset", "c5_4m",
                "--steps", "12"], timeout=3600, retries=1)

    # Budgets (BUDGETS_MS above) check steady_state_per_step_ms, which
    # (per episode10k_bench.py's documented semantics) excludes only
    # the one-time FINAL posterior fetch; episode startup (pilot fit,
    # initial seed, first-execution stalls) is still amortized over the
    # ritual's short step counts, so the budgets carry that amortized
    # startup in their 2.2× slack.
    out["step_budgets"] = {}
    for key, budget in BUDGETS_MS.items():
        got = out[key].get(
            "steady_state_per_step_ms", out[key].get("per_step_ms")
        )
        out["step_budgets"][key] = {
            "budget_ms": budget,
            "per_step_ms": got,
            "ok": got is not None and got < budget,
        }

    path = os.path.join(REPO, "benchmarks", f"round_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    # the numbers-of-record blocks read this artifact — regenerate them
    # NOW (after the artifact is on disk) so the ritual can never leave
    # them stale, then re-dump with the regen receipt (tests/
    # test_perf_tables.py is the tripwire for artifacts written OUTSIDE
    # the ritual, e.g. the driver's end-of-round BENCH_r*.json)
    rc, lines, _ = run([py, "benchmarks/gen_perf_tables.py"])
    out["perf_tables_regen"] = {"rc": rc, "msg": lines[-1] if lines else ""}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    ok = (
        out["hw_fidelity"]["ok"]
        and out["perf_budget"]["ok"]
        and "value" in out["bench"]
        and "value" in out["lowrank100k"]
        and all(b["ok"] for b in out["step_budgets"].values())
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
