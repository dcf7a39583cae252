"""Plan-level tests for the layout-aware sinks: bucketing must remove
the join shuffle; partitioning must prune the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from skoltexter_by_ai_spark.sources.sinks import write_bucketed, write_partitioned
from skoltexter_by_ai_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(orders, "t_orders_b", str(tmp_path / "ob"), ["o_custkey"], 8)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "t_customer_b",
        str(tmp_path / "cb"),
        ["o_custkey"],
        8,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(spark.table("t_customer_b"), "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it still computes the right thing
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path):
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(lineitem, "t_li_b", str(tmp_path / "li"), ["l_suppkey"], 8)
    try:
        agg = spark.table("t_li_b").groupBy("l_suppkey").agg(F.count("*").alias("n"))
        plan = _plan(agg)
        assert "Exchange" not in plan, f"bucketed aggregation still shuffles:\n{plan}"
        got = {r.l_suppkey: r.n for r in agg.collect()}
        want = {
            r.l_suppkey: r.n
            for r in lineitem.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")


def test_partitioned_write_prunes_scan(spark, tmp_path):
    events = load_table(spark, SF, "events").select("event_id", "user_id", "event_type", "value")
    path = str(tmp_path / "events_p")
    write_partitioned(events, path, ["event_type"])
    back = spark.read.parquet(path)
    filtered = back.filter(F.col("event_type") == "click")
    plan = _plan(filtered)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert filtered.count() == events.filter(F.col("event_type") == "click").count()
    # Only the matching directory's files are listed by the scan.
    import glob

    dirs = {p.split("event_type=")[1].split("/")[0] for p in glob.glob(f"{path}/event_type=*")}
    assert "click" in dirs and len(dirs) >= 2  # layout exists as expected


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from skoltexter_by_ai_spark.sources.sinks import compact_parquet

    events = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "fragmented")
    events.repartition(64).write.parquet(src)
    import glob as _glob

    assert len(_glob.glob(f"{src}/part-*")) == 64

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(_glob.glob(f"{dst}/part-*")) == 1
    assert spark.read.parquet(dst).count() == events.count()


def test_compact_parquet_range_clusters_on_order_col(spark, tmp_path):
    from skoltexter_by_ai_spark.sources.sinks import compact_parquet

    events = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "frag2")
    events.repartition(16).write.parquet(src)
    dst = str(tmp_path / "clustered")
    # Tiny target -> several range-partitioned files, disjoint in event_id.
    compact_parquet(spark, src, dst, target_file_bytes=8 * 1024, order_col="event_id")
    import glob as _glob

    files = sorted(_glob.glob(f"{dst}/part-*"))
    assert len(files) >= 2
    ranges = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("event_id"), F.max("event_id")).collect()[0]
        if r[0] is not None:
            ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "range partitions overlap - no min/max skipping benefit"
    assert spark.read.parquet(dst).count() == events.count()


def test_dataset_roundtrip_all_formats(spark, tmp_path):
    from skoltexter_by_ai_spark.sources.sinks import (
        DATASET_FORMATS,
        read_dataset,
        write_dataset,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.25)], ["id", "s", "v"]
    )
    expected = sorted([tuple(r) for r in df.collect()])
    for fmt in DATASET_FORMATS:
        path = str(tmp_path / f"ds_{fmt}")
        write_dataset(df, path, fmt=fmt)
        back = read_dataset(
            spark, path, fmt=fmt, schema="id BIGINT, s STRING, v DOUBLE"
        )
        assert sorted([tuple(r) for r in back.select("id", "s", "v").collect()]) == expected


def test_dataset_partitioned_orc_prunes(spark, tmp_path):
    from skoltexter_by_ai_spark.sources.sinks import read_dataset, write_dataset

    df = spark.range(100).withColumn("bucket", (F.col("id") % 4).cast("int"))
    path = str(tmp_path / "orc_part")
    write_dataset(df, path, fmt="orc", partition_cols=["bucket"])
    back = read_dataset(spark, path, fmt="orc").filter(F.col("bucket") == 2)
    assert back.count() == 25
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_dataset_rejects_unknown_format(spark, tmp_path):
    import pytest

    from skoltexter_by_ai_spark.sources.sinks import write_dataset

    with pytest.raises(ValueError):
        write_dataset(spark.range(1), str(tmp_path / "x"), fmt="avro")


def test_zorder_clustering_tightens_file_bounds_on_both_dims(spark, tmp_path):
    """Clustering files by Morton code must shrink per-file min/max
    spans on BOTH dimensions vs single-column clustering — the property
    parquet min/max skipping exploits for 2-D predicates."""
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.functions.zorder import morton_code
    from skoltexter_by_ai_spark.sources.tables import load_table

    # Hash-spread both dimensions onto the full grid: the raw fixture
    # key ranges are SF-dependent (o_custkey only reaches ~150 at
    # sf0.001, which would make the grid degenerate).
    df = (
        load_table(spark, "/root/testdata/sf0.001", "orders")
        .select(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(1024)).alias("ga"),
            F.pmod(F.xxhash64("o_custkey"), F.lit(1024)).alias("gb"),
        )
    )

    def avg_span(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        return per_file.agg(F.avg("span")).collect()[0][0]

    a_dir = str(tmp_path / "by_ga")
    z_dir = str(tmp_path / "by_z")
    df.repartitionByRange(8, "ga").sortWithinPartitions("ga").write.parquet(a_dir)
    (
        df.withColumn("z", morton_code("ga", "gb", bits=10))
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.parquet(z_dir)
    )

    # Single-column clustering leaves the OTHER dimension unclustered
    # (per-file gb span ~ the full 1024 range); Morton clustering
    # bounds both dimensions.
    assert avg_span(a_dir, "gb") > 900
    assert avg_span(z_dir, "gb") < 0.75 * avg_span(a_dir, "gb")
    assert avg_span(z_dir, "ga") < 0.75 * 1024
