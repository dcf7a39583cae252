"""Fixture star-schema loaders (see /root/repo/TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under ``{sf_dir}/``.

Scale posture: ``spark.read.parquet`` gives Catalyst predicate pushdown,
column pruning and partition-file pruning for free; at 100 TB the same
call reads a partitioned directory tree and nothing here changes. Do
NOT add ``.cache()`` here — callers decide caching per workload.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. ``name`` must be in TABLE_NAMES.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; we read it as a long
    (``spark.sql.legacy.parquet.nanosAsLong``, runtime-settable) and
    derive a microsecond TIMESTAMP alongside the raw ``ts_ns``.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
