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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a session-tz TIMESTAMP plus
    raw-nanos ``ts_ns``, whatever the writer produced.

    Fixture generations have shipped ``ts`` as parquet TIMESTAMP(NANOS)
    (surfaced as a LongType of nanos under
    ``spark.sql.legacy.parquet.nanosAsLong``) and as TIMESTAMP(MICROS)
    (surfaced as TIMESTAMP_NTZ). Both normalize to the same two columns
    so every downstream query is schema-stable: with the session pinned
    to UTC, casting NTZ→TIMESTAMP interprets the stored wall clock as
    UTC — identical to the nanos-epoch interpretation.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):  # TIMESTAMP(NANOS)
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    ts = F.col("ts").cast("timestamp")
    return df.withColumn("ts", ts).withColumn(
        "ts_ns", (F.unix_micros(ts) * F.lit(1000)).cast("long")
    )


# Resolved-relation cache: spark.read.parquet(path) performs file
# listing + footer schema inference in the JVM on EVERY call (~50-150
# ms even for a single small file) — a query loading six dimension
# tables pays ~0.5 s of pure metadata work before planning starts.
# A catalog/metastore would cache exactly this, so we do too: the
# RESOLVED DataFrame (logical plan only — no data, no .cache()) is
# reused for the same (session, realpath, mtime, size) key. The stat
# in the key invalidates on file replacement (the skewed-fixture
# tooling overwrites custom sf dirs in place); a partitioned
# DIRECTORY tree whose nested files change without touching the root
# mtime needs an explicit clear_table_cache() — the standard external
#-catalog caveat (Spark's own catalog tables need REFRESH TABLE).
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def clear_table_cache() -> None:
    """Drop every cached table relation (call after rewriting fixture
    files inside a partition tree whose root stat did not change)."""
    _TABLE_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. ``name`` must be in TABLE_NAMES.

    ``events.ts`` arrives in writer-dependent physical types; see
    :func:`normalize_events_ts`. ``nanosAsLong`` is set pre-read so a
    NANOS file loads as a long instead of failing the vectorized reader
    (a no-op for MICROS files).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    real = os.path.realpath(path)
    st = os.stat(real)
    key = (
        spark.sparkContext.applicationId,  # a new session invalidates
        real,
        st.st_mtime_ns,
        st.st_size,
    )
    df = _TABLE_CACHE.get(key)
    if df is None:
        # Bound the cache: long test sessions touch many throwaway
        # fixture dirs, and each stale entry keeps a JVM logical plan
        # alive. Entries are cheap to rebuild, so wholesale reset.
        if len(_TABLE_CACHE) >= 512:
            _TABLE_CACHE.clear()
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = normalize_events_ts(spark.read.parquet(path))
        else:
            df = spark.read.parquet(path)
        _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
