#!/usr/bin/env python
"""Driver-conditions randomized spot check (VERDICT r3 item 6).

The driver's t2 gate runs a rotating ~50-query sample on a VANILLA
SparkSession against the DuckDB oracle at sf0.01. The pytest suite
runs everything, but through the repo's tuned session factory — this
script replicates the driver's exact conditions instead: vanilla
session (no shuffle-partition tuning, no extra configs), the public
``__spark_entry__`` surface only, and a rotating random sample so
every query family gets periodic end-to-end coverage under driver
conditions rather than only under the test session.

Usage:
    python tools/driver_spotcheck.py                  # 6 queries, daily-rotating seed
    python tools/driver_spotcheck.py --n 116 --seed 7 # full sweep, pinned seed

Prints one JSON line and exits 1 on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="queries to sample")
    ap.add_argument(
        "--seed",
        type=int,
        default=None,
        help="sample seed; default rotates daily so repeated runs walk the registry",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="driver's t2 scale")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to check instead of a random sample",
    )
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int(time.time() // 86400)

    sys.path.insert(0, REPO)
    # Workers need the repo on their path too (driver sys.path does not
    # propagate to Python worker processes).
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

    import __spark_entry__ as ep
    from pyspark.sql import SparkSession

    from skoltexter_by_ai_spark.plans.registry import all_queries
    from skoltexter_by_ai_spark.testing import compare_with_oracle

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-spotcheck")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = ep.queries()
    oracles = ep.oracle_sql()
    specs = all_queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            ap.error(f"unknown query names: {unknown}")
    else:
        names = random.Random(seed).sample(sorted(queries), min(args.n, len(queries)))

    results: dict[str, str] = {}
    failed = False
    for name in names:
        try:
            df = queries[name](spark, args.sf_dir)
            oracle = oracles.get(name)
            if oracle is None:
                n = df.count()
                floor = specs[name].min_rows
                # realpath: a relative path or symlink to the standard
                # fixture must still count as standard, else the
                # planted-feature floor silently relaxes (ADVICE r10).
                real_sf = os.path.realpath(args.sf_dir)
                is_standard = real_sf == "/root/testdata" or real_sf.startswith(
                    "/root/testdata" + os.sep
                )
                if specs[name].min_rows_is_fixture_law and not is_standard:
                    # min_rows counts features the STANDARD fixture
                    # plants; a custom fixture (skew law, ablation) may
                    # legitimately plant fewer — relax to non-vacuous.
                    floor = 1
                ok = n >= floor
                results[name] = "ok(rows-only)" if ok else f"FAIL rows={n}"
            else:
                report = compare_with_oracle(name, df, oracle, args.sf_dir)
                ok = report.ok
                results[name] = "ok" if ok else f"FAIL {report.detail[:120]}"
        except Exception as exc:  # a crash is a failure, not an abort
            ok = False
            results[name] = f"ERR {type(exc).__name__}: {str(exc)[:120]}"
        failed = failed or not ok
    print(
        json.dumps(
            {"seed": seed, "sf_dir": args.sf_dir, "results": results, "ok": not failed}
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
