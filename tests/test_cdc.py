"""CDC merge operators: keep-last upsert fold, tombstones, SCD2."""

from __future__ import annotations

from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators import cdc


def _changes(spark):
    # (key, seq, payload, op)
    rows = [
        (1, 10, "a", "U"),
        (1, 20, "b", "U"),   # winner for key 1
        (2, 5, "x", "U"),
        (2, 9, "y", "D"),    # tombstone wins -> key 2 dropped
        (3, 7, "m", "D"),
        (3, 8, "n", "U"),    # upsert after delete -> key 3 lives
        (4, 1, "z", "U"),
    ]
    return spark.createDataFrame(rows, "k long, seq long, payload string, op string")


def test_merge_upserts_keeps_last(spark):
    out = cdc.merge_upserts(_changes(spark), ["k"], "seq", op_col="op")
    got = {r.k: (r.seq, r.payload) for r in out.collect()}
    assert got == {1: (20, "b"), 3: (8, "n"), 4: (1, "z")}


def test_merge_upserts_without_ops_keeps_every_key(spark):
    out = cdc.merge_upserts(_changes(spark), ["k"], "seq")
    got = {r.k: r.payload for r in out.collect()}
    assert got == {1: "b", 2: "y", 3: "n", 4: "z"}


def test_merge_upserts_one_row_per_key(spark):
    out = cdc.merge_upserts(_changes(spark), ["k"], "seq")
    assert out.groupBy("k").count().filter(F.col("count") > 1).count() == 0


def test_scd2_intervals_chain_and_single_current(spark):
    hist = cdc.scd2_history(_changes(spark), ["k"], "seq").collect()
    by_key: dict[int, list] = {}
    for r in sorted(hist, key=lambda r: (r.k, r.valid_from)):
        by_key.setdefault(r.k, []).append(r)
    for k, rows in by_key.items():
        # exactly one open (current) interval per key, and it is the last
        assert [r.is_current for r in rows] == [False] * (len(rows) - 1) + [True]
        # intervals chain: valid_to of row i == valid_from of row i+1
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
        assert rows[-1].valid_to is None


def test_scd2_preserves_all_versions(spark):
    ch = _changes(spark)
    assert cdc.scd2_history(ch, ["k"], "seq").count() == ch.count()
