"""Unit tests: salted aggregation exactness and hash-split stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators.skew import salted_agg
from skoltexter_by_ai_spark.operators.text_analysis import hash_split


def test_salted_agg_equals_plain_on_skewed_keys(spark):
    # 90% of rows share one hot key — the salted path must still be exact.
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    salted = salted_agg(
        df,
        keys=["k"],
        aggs={"n": ("count", None), "total": ("sum", "v"), "mx": ("max", "v")},
        salt=8,
    )
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    s = {r.k: (r.n, r.total, r.mx) for r in salted.collect()}
    p = {r.k: (r.n, r.total, r.mx) for r in plain.collect()}
    assert set(s) == set(p)
    for k in p:
        assert s[k][0] == p[k][0]
        assert abs(s[k][1] - p[k][1]) < 1e-6
        assert s[k][2] == p[k][2]


def test_salted_agg_rejects_non_algebraic():
    import pytest

    with pytest.raises(ValueError, match="unsupported aggregate kind"):
        salted_agg(None, keys=["k"], aggs={"bad": ("avg", "v")})


def test_hash_split_is_stable_and_roughly_80_10_10(spark):
    df = spark.range(5_000).select(F.col("id"), hash_split("id").alias("split"))
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 5_000 < 0.85
    assert 0.06 < counts["val"] / 5_000 < 0.14
    # Stable: same assignment on recomputation and under repartitioning.
    again = {
        r.id: r.split
        for r in spark.range(5_000)
        .repartition(13)
        .select("id", hash_split("id").alias("split"))
        .collect()
    }
    first = {r.id: r.split for r in df.collect()}
    assert first == again


def test_distributed_prefix_sum_matches_global_window(spark):
    """Two-phase prefix sum == the single-task global window, on data
    spread across many range partitions with ties and negatives."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from skoltexter_by_ai_spark.operators.skew import distributed_prefix_sum

    rng = random.Random(11)
    rows = [(rng.randrange(500), rng.choice([-3, -1, 1, 2, 5])) for _ in range(4000)]
    df = spark.createDataFrame(rows, "t long, delta long")

    got = distributed_prefix_sum(df, ["t", "delta"], "delta", "run", num_ranges=8)
    w = Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("run", F.sum("delta").over(w))

    # Running totals at each distinct (t, delta) boundary must agree —
    # compare the max running value per key (ties within a key are
    # order-arbitrary in both forms).
    agg = lambda d: {  # noqa: E731
        (r.t, r.delta): r.mx
        for r in d.groupBy("t", "delta").agg(F.max("run").alias("mx")).collect()
    }
    assert agg(got) == agg(want)
    # Totals line up end-to-end: the running value after the final
    # (t, delta) key equals the grand total. (limit(1) over tied keys
    # would pick an arbitrary mid-tie row; the per-key max above is
    # the well-defined boundary value.)
    total = sum(d for _, d in rows)
    last_key = max(rows)
    assert agg(got)[last_key] == total


# --- round-8 mutation-gate killers (QUALITY.md r8) ----------------------------


def test_salted_sum_cents_matches_plain_sum(spark):
    """sum_cents is exact integer-cents money addition: the x100
    scaling and the long casts must reproduce plain SUM to the cent."""
    rows = [(i % 3, round(0.01 * i + 0.07, 2)) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, amt double")
    got = {
        r.k: r.total_cents
        for r in salted_agg(
            df, ["k"], {"total_cents": ("sum_cents", "amt")}, salt=4
        ).collect()
    }
    want = {
        r.k: r.c
        for r in df.groupBy("k")
        .agg(F.sum(F.round(F.col("amt") * 100).cast("long")).alias("c"))
        .collect()
    }
    assert got == want


def test_prefix_sum_default_num_ranges(spark):
    """num_ranges=None must fall back to the session parallelism (the
    documented default), not crash or collapse to a constant."""
    from skoltexter_by_ai_spark.operators.skew import distributed_prefix_sum

    df = spark.createDataFrame([(i, 1) for i in range(100)], "t int, v int")
    out = distributed_prefix_sum(df, ["t"], "v", "run")
    assert out.agg(F.max("run")).first()[0] == 100


def test_prefix_sum_null_values_contribute_zero(spark):
    """NULLs in the value column contribute 0 to the running total —
    both inside a partition (fillna) and in the cross-partition
    offsets (an all-NULL range's partial sum is NULL -> offset 0)."""
    from skoltexter_by_ai_spark.operators.skew import distributed_prefix_sum

    # keys 0..9 all NULL (low range), keys 10..19 are 1 each.
    rows = [(i, None) for i in range(10)] + [(i, 1) for i in range(10, 20)]
    df = spark.createDataFrame(rows, "t int, v int")
    out = distributed_prefix_sum(df, ["t"], "v", "run", num_ranges=2)
    got = {r.t: r.run for r in out.collect()}
    # Rows in the NULL range carry a 0 total; the second range climbs
    # 1..10 starting from offset 0 (not 1).
    assert got[9] == 0
    assert got[10] == 1
    assert got[19] == 10


def test_prefix_sum_carry_across_arrow_batches(spark):
    """The in-partition carry must be the LAST running value of each
    Arrow batch; forcing tiny batches makes a wrong carry (e.g.
    iloc[-2]) visible as a drifting total."""
    from skoltexter_by_ai_spark.operators.skew import distributed_prefix_sum

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        df = spark.createDataFrame([(i, 2) for i in range(300)], "t int, v int")
        out = distributed_prefix_sum(df, ["t"], "v", "run", num_ranges=1)
        got = {r.t: r.run for r in out.collect()}
        assert got[299] == 600
        assert got[0] == 2
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
