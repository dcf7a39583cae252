"""Skew-stress probes on the Zipf fixtures (VERDICT r8 item 2):

1. **AQE skew-join**: run a sort-merge join whose stream side is
   Zipf-hot (lineitem x part on l_partkey, broadcast disabled so the
   join MUST shuffle) and report whether AQE's skew-join rule actually
   split the hot partitions (``skew=true`` in the final adaptive
   plan). This is the runtime mitigation the 100 TB posture leans on —
   it should FIRE on the skewed fixture and NOT on the uniform one.

2. **salted_agg vs plain groupBy**: time x27's two-stage salted
   aggregation against the naive single-stage groupBy on the same
   skewed data. On near-uniform keys the salt is pure overhead (why
   nothing "needed" it on the driver fixtures); under Zipf the hottest
   key's single reducer becomes the straggler and the salt's map-side
   spread should win or tie. NOTE: sum/count carry map-side partial
   aggregation in Spark, which already absorbs most key skew — the
   honest expectation is parity there; salting is the insurance for
   partial-agg-resistant shapes (collect_list/distinct), measured here
   with collect_list-style size accounting via count(distinct).

Usage::

    python tools/skew_probe.py --dir /tmp/scaledata/sf1-skew [--reps 2]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(fn, reps: int) -> float:
    fn()  # warm-up
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.skew import salted_agg
    from skoltexter_by_ai_spark.session import get_spark
    from skoltexter_by_ai_spark.sources import load_table

    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"dir": args.dir}

    lineitem = load_table(spark, args.dir, "lineitem")
    part = load_table(spark, args.dir, "part")

    # --- 1. does AQE's skew-join split fire?
    # Force a shuffle join (no broadcast) so the skewed l_partkey
    # stream actually lands in per-key reducers.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # Local thresholds: the default 256 MB skewed-partition floor never
    # trips on fixture-sized data; scale it down so the RULE (not the
    # data volume) is what we verify, exactly like a unit-scale cluster
    # rehearsal would.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    # Factor: a partition is "skewed" when > factor x median AND above
    # the byte floor. The fixture's hot partition is ~4x median (15%
    # of rows + co-resident keys vs 1/32 median), real 100 TB hot
    # partitions are orders of magnitude past both bars; 2 keeps the
    # rehearsal faithful to the RULE, not to production constants.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # Plan capture: run THE DATASET'S OWN QueryExecution to completion
    # (executeCollect) and read back its finalized adaptive plan — a
    # noop-sink write runs a SEPARATE QueryExecution and the dataset's
    # own plan stays isFinalPlan=false, silently reporting "no skew
    # split" forever (the bug this probe's first version had). The
    # skinny projection keeps the collected result tiny; an inner join
    # cannot be pruned away by it.
    joined = lineitem.join(part, lineitem.l_partkey == part.p_partkey).select(
        part.p_brand
    )
    qe = joined._jdf.queryExecution()
    qe.executedPlan().executeCollect()
    plan = qe.executedPlan().toString()
    assert "isFinalPlan=true" in plan
    out["aqe_skew_split_fired"] = "skew=true" in plan
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")

    # --- 2. salted_agg vs plain groupBy on the Zipf-hot l_suppkey
    aggs = {"n": ("count", None), "revenue": ("sum_cents", "l_extendedprice")}

    def run_salted():
        _consume(
            salted_agg(lineitem, keys=["l_suppkey"], aggs=aggs).withColumn(
                "revenue", F.col("revenue").cast("double") / 100
            )
        )

    def run_plain():
        _consume(
            lineitem.groupBy("l_suppkey").agg(
                F.count("*").alias("n"),
                (
                    F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                        "double"
                    )
                    / 100
                ).alias("revenue"),
            )
        )

    out["salted_sec"] = _time(run_salted, args.reps)
    out["plain_sec"] = _time(run_plain, args.reps)

    # partial-agg-resistant shape: exact distinct counting per hot key
    # (count(distinct) re-shuffles raw rows per key — the shape where a
    # hot key genuinely serializes and two-stage splitting matters).
    def run_distinct_plain():
        _consume(
            lineitem.groupBy("l_suppkey").agg(
                F.countDistinct("l_orderkey").alias("nd")
            )
        )

    def run_distinct_salted():
        # manual two-stage: dedup on (key, salt-free value) first, then
        # count — the salted form of exact distinct.
        _consume(
            lineitem.select("l_suppkey", "l_orderkey")
            .distinct()
            .groupBy("l_suppkey")
            .count()
        )

    out["distinct_plain_sec"] = _time(run_distinct_plain, args.reps)
    out["distinct_twostage_sec"] = _time(run_distinct_salted, args.reps)

    # hottest-key mass for context
    top = (
        lineitem.groupBy("l_suppkey").count().orderBy(F.desc("count")).limit(1).collect()
    )
    total = lineitem.count()
    out["hottest_key_share"] = round(top[0]["count"] / total, 4) if top else None
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
