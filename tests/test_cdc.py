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


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    from skoltexter_by_ai_spark.operators.cdc import snapshot_diff

    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # key 1 unchanged -> absent; NULL -> value counts as changed.
    assert out == {2: "changed", 3: "changed", 4: "added"}


def test_snapshot_diff_removed(spark):
    old = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    new = spark.createDataFrame([(1, 1.0)], "k long, v double")
    from skoltexter_by_ai_spark.operators.cdc import snapshot_diff

    rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert [(r.k, r.change_type, r.old_v, r.new_v) for r in rows] == [
        (2, "removed", 2.0, None)
    ]


def test_merge_upserts_property_random_logs(spark):
    """Property check vs a Python fold oracle over random change logs."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        rows = []
        seqs = list(range(60))
        rng.shuffle(seqs)
        for i, s in enumerate(seqs):
            rows.append(
                (rng.randrange(8), s, f"p{i}", "D" if rng.random() < 0.25 else "U")
            )
        df = spark.createDataFrame(rows, "k long, seq long, payload string, op string")
        got = {
            r.k: (r.seq, r.payload)
            for r in cdc.merge_upserts(df, ["k"], "seq", op_col="op").collect()
        }
        latest: dict[int, tuple] = {}
        for k, s, p, op in rows:
            if k not in latest or s > latest[k][0]:
                latest[k] = (s, p, op)
        expect = {k: (s, p) for k, (s, p, op) in latest.items() if op != "D"}
        assert got == expect, f"trial {trial}"


def test_merge_upserts_on_bucketed_log_is_shuffle_free(spark, tmp_path):
    """The scale claim in cdc.py: a change log bucketed on the merge
    key folds with NO hash exchange — the window reuses the bucketed
    layout (only the in-partition sort remains)."""
    from skoltexter_by_ai_spark.operators import cdc
    from skoltexter_by_ai_spark.sources.sinks import write_bucketed

    ch = _changes(spark)
    write_bucketed(
        ch, "cdc_log_bucketed", str(tmp_path / "cdc_log"), ["k"], num_buckets=4
    )
    try:
        logged = spark.table("cdc_log_bucketed")
        merged = cdc.merge_upserts(logged, ["k"], "seq", op_col="op")
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        got = {r.k: (r.seq, r.payload) for r in merged.collect()}
        assert got == {1: (20, "b"), 3: (8, "n"), 4: (1, "z")}
    finally:
        spark.sql("DROP TABLE IF EXISTS cdc_log_bucketed")
