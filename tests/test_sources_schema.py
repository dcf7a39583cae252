"""Fixture-schema adaptivity (VERDICT r2 item 4).

/root/testdata is regenerated every round and `events.ts` has already
flipped physical type once (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)).
`load_table` must normalize BOTH to the same (`ts` TIMESTAMP,
`ts_ns` long) — this test writes tiny fixtures in each physical type
so the normalization path not shipped by the current fixtures stays
covered across round boundaries.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, TimestampType

from skoltexter_by_ai_spark.sources.tables import load_table

# Whole-microsecond instants so the NANOS and MICROS encodings denote
# the same points in time.
TS_NS = [1_700_000_000_000_000_000, 1_700_000_123_456_000_000, 1_700_009_999_000_001_000]


def _write_events(tmp_path, unit: str) -> str:
    sf_dir = tmp_path / f"sf_{unit}"
    sf_dir.mkdir()
    ts_vals = TS_NS if unit == "ns" else [v // 1000 for v in TS_NS]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ts_vals, pa.timestamp(unit)),
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.5, None, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, str(sf_dir / "events.parquet"))
    return str(sf_dir)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_normalizes_each_physical_type(spark, tmp_path, unit):
    df = load_table(spark, _write_events(tmp_path, unit), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert isinstance(df.schema["ts_ns"].dataType, LongType)
    rows = df.orderBy("event_id").collect()
    assert [r.ts_ns for r in rows] == TS_NS
    # Wall-clock equivalence: epoch micros derived from the TIMESTAMP
    # column must match the nanos values exactly (UTC session tz).
    from pyspark.sql import functions as F

    micros = [
        r[0]
        for r in df.orderBy("event_id").select(F.unix_micros("ts")).collect()
    ]
    assert micros == [v // 1000 for v in TS_NS]


def test_both_physical_types_normalize_identically(spark, tmp_path):
    a = load_table(spark, _write_events(tmp_path, "ns"), "events")
    b = load_table(spark, _write_events(tmp_path, "us"), "events")
    assert a.schema == b.schema
    assert a.orderBy("event_id").collect() == b.orderBy("event_id").collect()


def test_load_table_cache_hit_and_stat_invalidation(spark, tmp_path):
    """The resolved-relation cache must return the SAME logical plan
    for an unchanged file (metadata read once) and a FRESH one after
    the file is replaced in place — the skewed-fixture tooling
    overwrites custom sf dirs and must never see stale listings."""
    import shutil

    from skoltexter_by_ai_spark.sources.tables import clear_table_cache

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/nation.parquet", d / "nation.parquet")
    a = load_table(spark, str(d), "nation")
    b = load_table(spark, str(d), "nation")
    assert a is b  # cache hit: identical resolved DataFrame object
    n_before = a.count()
    # Replace the file with a different table entirely; mtime changes.
    shutil.copy("/root/testdata/sf0.001/region.parquet", d / "nation.parquet")
    import os

    os.utime(d / "nation.parquet")
    c = load_table(spark, str(d), "nation")
    assert c is not a and c.columns == ["r_regionkey", "r_name"]
    assert n_before >= 1 and c.count() >= 1
    clear_table_cache()
    e = load_table(spark, str(d), "nation")
    assert e is not c  # explicit clear drops entries
