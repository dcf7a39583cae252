"""HLL sketch rollup accuracy and mergeability vs exact counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators import sketches

SF = "/root/testdata/sf0.001"


def _lineitem(spark):
    from skoltexter_by_ai_spark.sources.tables import load_table

    return load_table(spark, SF, "lineitem")


def test_reaggregated_sketch_matches_exact_within_2pct(spark):
    li = _lineitem(spark)
    # Sketch at (returnflag, linestatus), answer at returnflag only —
    # the coarse estimate must come out of the fine sketches.
    approx = {
        r.l_returnflag: r.approx_distinct
        for r in sketches.approx_distinct_rollup(
            li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_suppkey"
        ).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.02 * exact[k]), (k, approx[k], exact[k])


def test_sketch_union_equals_direct_sketch(spark):
    """Mergeability: union of per-group sketches == one global sketch
    (identical estimate, not merely close)."""
    li = _lineitem(spark)
    via_union = sketches.hll_reaggregate(
        sketches.hll_rollup(li, ["l_returnflag"], "l_suppkey"), []
    ).collect()[0]["approx_distinct"]
    direct = sketches.hll_reaggregate(
        sketches.hll_rollup(li.withColumn("__g", F.lit(1)), ["__g"], "l_suppkey"), []
    ).collect()[0]["approx_distinct"]
    assert via_union == direct


def test_coarse_keys_must_be_subset(spark):
    li = _lineitem(spark)
    with pytest.raises(ValueError, match="subset"):
        sketches.approx_distinct_rollup(li, ["l_returnflag"], ["l_partkey"], "l_suppkey")
