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
