#!/usr/bin/env python
"""Per-query floor profiler: split a query's bench time into plan
BUILD (Python/py4j DataFrame construction) vs EXECUTE (noop write),
and count the Spark jobs each execution submits — the two components
of the 124-query sub-1s scheduling floor (VERDICT r10 item 1b).

Usage: python tools/floor_profile.py x49_pricing_summary q02_... [--sf-dir D]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    from skoltexter_by_ai_spark.plans.registry import all_queries
    from skoltexter_by_ai_spark.session import default_parallelism, get_spark

    sys.path.insert(0, REPO)
    import bench

    spark = get_spark(
        app_name="floor-profile",
        shuffle_partitions=bench._shuffle_partitions_for(args.sf_dir, default_parallelism()),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    specs = all_queries()
    names = sorted(specs) if getattr(args, "all", False) else args.names
    for name in names:
        spec = specs[name]
        # warm run (codegen + footers)
        spec.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        build_best = exec_best = total_best = float("inf")
        jobs_delta = 0
        for _ in range(args.reps):
            jobs_before = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = spec.builder(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs_after = sc._jsc.sc().dagScheduler().nextJobId()
            if t2 - t0 < total_best:
                total_best = t2 - t0
                build_best = t1 - t0
                exec_best = t2 - t1
                jobs_delta = jobs_after - jobs_before
        print(
            f"{name:35s} total={total_best:6.3f} build={build_best:6.3f} "
            f"exec={exec_best:6.3f} jobs={jobs_delta}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
