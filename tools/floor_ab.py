#!/usr/bin/env python
"""Config A/B over a fixed query subset under the bench protocol
(1 warm + min of 2 timed, noop sink). Each invocation is one process
= one JVM = one config, so runs are comparable. Prints one JSON line.

Usage: python tools/floor_ab.py --conf k=v --conf k2=v2 name1 name2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    import bench
    from skoltexter_by_ai_spark.plans.registry import all_queries
    from skoltexter_by_ai_spark.session import default_parallelism, get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(
        app_name="floor-ab",
        shuffle_partitions=args.shuffle_partitions
        or bench._shuffle_partitions_for(args.sf_dir, default_parallelism()),
        extra_conf=extra,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs = all_queries()
    timings = {}
    for name in args.names:
        spec = specs[name]
        spec.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spec.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        import gc

        gc.collect()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    print(
        json.dumps(
            {"conf": extra, "total": round(sum(timings.values()), 2), "q": timings}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
