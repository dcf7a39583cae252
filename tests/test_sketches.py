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


def test_coarse_keys_equal_to_fine_keys_is_legal(spark):
    """Mutation-gate killer (r8): the subset check is <=, not < —
    re-aggregating at the SAME grain must work (it is how a persisted
    sketch table answers its own grain without a re-scan)."""
    li = _lineitem(spark)
    same_grain = sketches.approx_distinct_rollup(
        li, ["l_returnflag"], ["l_returnflag"], "l_suppkey"
    ).collect()
    direct = {
        r.l_returnflag: r.approx_distinct
        for r in sketches.hll_reaggregate(
            sketches.hll_rollup(li, ["l_returnflag"], "l_suppkey"), ["l_returnflag"]
        ).collect()
    }
    assert {r.l_returnflag: r.approx_distinct for r in same_grain} == direct


def test_default_lg_k_is_12(spark):
    """Mutation-gate killer (r8): lg_k=12 is the documented state-size
    contract (2^12 registers, ~few KB per group). The default call
    must produce byte-identical sketches to an explicit lg_k=12 — a
    drifted default changes every persisted sketch's size and every
    estimate, silently breaking mergeability with existing state
    (hll_union_agg rejects mixed-precision unions by default)."""
    li = _lineitem(spark)
    dflt = sketches.hll_rollup(li, ["l_returnflag"], "l_suppkey")
    explicit = sketches.hll_rollup(li, ["l_returnflag"], "l_suppkey", lg_k=12)
    d = {r.l_returnflag: bytes(r.hll_sketch) for r in dflt.collect()}
    e = {r.l_returnflag: bytes(r.hll_sketch) for r in explicit.collect()}
    assert d == e
    # approx_distinct_rollup's own default must round-trip through the
    # same precision. Cardinality must be high enough (100k >> 2^12
    # registers) that the sketch leaves sparse mode — at fixture
    # cardinalities lg_k 12 and 13 both count exactly and a drifted
    # default would be invisible.
    big = (
        li.sparkSession.range(100_000)
        .selectExpr("id % 4 AS g", "id AS v")
    )
    via = {
        r.g: r.approx_distinct
        for r in sketches.approx_distinct_rollup(big, ["g"], ["g"], "v").collect()
    }
    via12 = {
        r.g: r.approx_distinct
        for r in sketches.approx_distinct_rollup(
            big, ["g"], ["g"], "v", lg_k=12
        ).collect()
    }
    assert via == via12
