#!/usr/bin/env python
"""Bench budget gate (VERDICT r5 item 2 / r6 item 1b).

Validates a bench record against the suite budget: the full declared-
query sweep at sf0.1 must stay under --max-total seconds and no single
query may exceed --max-query seconds. The thresholds sit between the
committed steady-state records (~95-105 s) and the 2x-of-baseline bar
(120 s) so a REAL regression trips the gate while normal box-to-box
variance does not.

By default the gate reads the record COMMITTED at HEAD
(`git show HEAD:BENCH_LOCAL.json`), not the working-tree file: the
driver's per-round bench run overwrites the working-tree copy with
numbers taken on a loaded box, and those must not fail the gate that
exists to defend against exactly that confusion. Pass --file to gate
an arbitrary record (e.g. a fresh run before committing it).

Usage:
    python tools/bench_gate.py                # gate HEAD's BENCH_LOCAL.json
    python tools/bench_gate.py --file BENCH_LOCAL.json   # gate a fresh run

Prints one JSON line; exits 1 on any budget violation.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MAX_TOTAL_SEC = 115.0
MAX_QUERY_SEC = 4.0


def load_record(path: str | None) -> tuple[dict, str]:
    if path is not None:
        with open(path) as fh:
            return json.load(fh), path
    out = subprocess.run(
        ["git", "show", "HEAD:BENCH_LOCAL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout), "HEAD:BENCH_LOCAL.json"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default=None, help="gate this record instead of HEAD's")
    ap.add_argument("--max-total", type=float, default=MAX_TOTAL_SEC)
    ap.add_argument("--max-query", type=float, default=MAX_QUERY_SEC)
    args = ap.parse_args()

    # Fail closed AND keep the one-line-JSON output contract: a
    # missing file, non-JSON content, or a record without 'value'
    # must emit {"ok": false, "err": ...} (not a traceback) so
    # downstream parsers of the gate line never break.
    try:
        record, source = load_record(args.file)
        float(record["value"])
    except Exception as exc:
        print(
            json.dumps(
                {
                    "source": args.file or "HEAD:BENCH_LOCAL.json",
                    "ok": False,
                    "err": f"{type(exc).__name__}: {exc}",
                }
            )
        )
        return 1
    if record.get("sf") != 0.1:
        print(json.dumps({"source": source, "ok": False, "err": f"sf={record.get('sf')} != 0.1"}))
        return 1
    total = float(record["value"])
    queries: dict[str, float] = record.get("queries") or {}
    over = {n: s for n, s in queries.items() if float(s) > args.max_query}
    failures = record.get("failures") or {}
    violations: list[str] = []
    if total > args.max_total:
        violations.append(f"total {total:.2f}s > {args.max_total:.0f}s budget")
    for n, s in sorted(over.items()):
        violations.append(f"{n} {float(s):.2f}s > {args.max_query:.1f}s per-query budget")
    if failures:
        violations.append(f"bench failures: {sorted(failures)}")
    print(
        json.dumps(
            {
                "source": source,
                "total_sec": total,
                "n_queries": len(queries),
                "max_total": args.max_total,
                "max_query": args.max_query,
                "violations": violations,
                "ok": not violations,
            }
        )
    )
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
