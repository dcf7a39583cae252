"""Unit tests for the temporal join operators (exact edge semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators import temporal


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


def _frame(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_join_picks_latest_at_or_before(spark):
    left = _frame(
        spark,
        [(1, _ts(10), "l1"), (1, _ts(30), "l2"), (2, _ts(5), "l3")],
        ["k", "ts", "lid"],
    )
    right = _frame(
        spark,
        [(1, _ts(0), "r0"), (1, _ts(10), "r1"), (1, _ts(20), "r2"), (2, _ts(6), "r3")],
        ["k", "ts", "rid"],
    )
    out = {r.lid: r for r in temporal.asof_join(left, right, on="k").collect()}
    assert out["l1"].rid_right == "r1"  # simultaneous right row matches (<=)
    assert out["l2"].rid_right == "r2"  # latest earlier, not the first
    assert out["l3"].rid_right is None  # nothing at-or-before -> left-join NULL
    assert out["l3"].ts_right is None


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = _frame(spark, [(1, _ts(30), "l")], ["k", "ts", "lid"])
    right = _frame(spark, [(1, _ts(0), "r")], ["k", "ts", "rid"])
    fresh = temporal.asof_join(left, right, on="k", tolerance_seconds=3600).collect()[0]
    assert fresh.rid_right == "r"
    stale = temporal.asof_join(left, right, on="k", tolerance_seconds=60).collect()[0]
    assert stale.rid_right is None


def test_range_join_boundaries_and_bucket_crossing(spark):
    left = _frame(spark, [(1, _ts(10), "c")], ["k", "ts", "cid"])
    right = _frame(
        spark,
        [
            (1, _ts(10), "same"),        # inclusive lower bound
            (1, _ts(19, 59), "inside"),  # just inside
            (1, _ts(20), "at_end"),      # exclusive upper bound
            (1, _ts(9, 59), "before"),   # before the window
            (2, _ts(15), "other_key"),
        ],
        ["k", "ts", "rid"],
    )
    out = temporal.range_join(left, right, on="k", window_seconds=600.0)
    got = sorted(r.rid_right for r in out.collect())
    assert got == ["inside", "same"]


def test_range_join_matches_naive_theta_join(spark):
    # Random-ish fixture: bucketed implementation == naive inequality join.
    rows_l = [(i % 3, _ts(i % 60, (7 * i) % 60), f"l{i}") for i in range(40)]
    rows_r = [(i % 3, _ts((i * 13) % 60, (11 * i) % 60), f"r{i}") for i in range(40)]
    left = _frame(spark, rows_l, ["k", "ts", "lid"])
    right = _frame(spark, rows_r, ["k", "ts", "rid"])
    fast = {
        (r.lid, r.rid_right)
        for r in temporal.range_join(left, right, on="k", window_seconds=300.0).collect()
    }
    naive = {
        (r.lid, r.rid)
        for r in left.alias("a")
        .join(
            right.alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") < F.col("a.ts") + F.expr("INTERVAL 300 SECONDS")),
        )
        .select(F.col("a.lid").alias("lid"), F.col("b.rid").alias("rid"))
        .collect()
    }
    assert fast == naive


# --- merge upsert -------------------------------------------------------------


def test_merge_upsert_latest_wins(spark):
    from skoltexter_by_ai_spark.operators.temporal import merge_upsert

    base = spark.createDataFrame(
        [(1, "old", 0), (2, "keep", 0)], ["key", "val", "version"]
    )
    updates = spark.createDataFrame(
        [(1, "v1", 5), (1, "v2", 9), (3, "new", 2)], ["key", "val", "version"]
    )
    rows = {
        r.key: r for r in merge_upsert(base, updates, ["key"], "version").collect()
    }
    assert rows[1].val == "v2" and rows[1].version == 9
    assert rows[2].val == "keep"
    assert rows[3].val == "new"


def test_merge_upsert_version_tie_prefers_update(spark):
    from skoltexter_by_ai_spark.operators.temporal import merge_upsert

    base = spark.createDataFrame([(1, "base", 7)], ["key", "val", "version"])
    updates = spark.createDataFrame([(1, "update", 7)], ["key", "val", "version"])
    [row] = merge_upsert(base, updates, ["key"], "version").collect()
    assert row.val == "update"


def test_merge_upsert_schema_mismatch_raises(spark):
    import pytest

    from skoltexter_by_ai_spark.operators.temporal import merge_upsert

    base = spark.createDataFrame([(1, "a")], ["key", "val"])
    updates = spark.createDataFrame([(1, 2)], ["key", "other"])
    with pytest.raises(ValueError):
        merge_upsert(base, updates, ["key"], "val")


# --- gap fill -----------------------------------------------------------------


def test_gap_fill_forward_fills_holes(spark):
    import datetime as dt

    from skoltexter_by_ai_spark.operators.temporal import gap_fill_forward

    t0 = dt.datetime(2024, 1, 1, 0)
    df = spark.createDataFrame(
        [
            ("u1", t0, 10.0),
            ("u1", dt.datetime(2024, 1, 1, 3), 40.0),
            ("u2", t0, 7.0),
        ],
        ["key", "h", "v"],
    )
    out = gap_fill_forward(df, "key", "h", ["v"], step="1 hour").collect()
    u1 = sorted([r for r in out if r.key == "u1"], key=lambda r: r.h)
    assert [r.h.hour for r in u1] == [0, 1, 2, 3]
    assert [r.v for r in u1] == [10.0, 10.0, 10.0, 40.0]
    assert [r["__observed"] for r in u1] == [True, False, False, True]
    # u2 has a single point -> single-row grid, no invented hours.
    assert len([r for r in out if r.key == "u2"]) == 1


def test_asof_join_null_field_in_latest_match_stays_null(spark):
    """The matched right row's fields must all come from that one row:
    a NULL field in the latest match must NOT be backfilled from an
    older right row (per-column fill would build a frankenrow)."""
    left = _frame(spark, [(1, _ts(30), "l")], ["k", "ts", "lid"])
    right = spark.createDataFrame(
        [(1, _ts(0), "old", 7.0), (1, _ts(20), None, None)],
        ["k", "ts", "rid", "val"],
    )
    row = temporal.asof_join(left, right, on="k").collect()[0]
    # Latest match is the ts(20) row whose rid/val are NULL.
    assert row.ts_right == _ts(20)
    assert row.rid_right is None and row.val_right is None


def test_asof_forward_hand_case(spark):
    """Forward direction: earliest right at-or-after each left ts;
    simultaneous right matches; tolerance measured forward."""
    import datetime as dt

    from skoltexter_by_ai_spark.operators.temporal import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(20), "b"), (1, t(40), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(10), 100), (1, t(25), 200)], "k long, ts timestamp, v long"
    )
    got = {
        r.tag: (r.v_right, r.ts_right)
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert got["a"] == (100, t(10))  # simultaneous right matches
    assert got["b"] == (200, t(25))  # next one after
    assert got["c"] == (None, None)  # nothing after -> left-join shape
    # forward tolerance: b's match is 5s ahead; a 3s budget drops it.
    tol = {
        r.tag: r.v_right
        for r in asof_join(
            left, right, on="k", direction="forward", tolerance_seconds=3.0
        ).collect()
    }
    assert tol == {"a": 100, "b": None, "c": None}


def test_asof_direction_validated(spark):
    import pytest

    from skoltexter_by_ai_spark.operators.temporal import asof_join

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="backward"):
        asof_join(df, df, on="k", direction="sideways")
