"""SparkSession factory.

Reference parity note: the reference is single-process Python
(``src/program1_generate_markdowns.py:438-474`` runs everything in one
thread); our equivalent of "process startup" is session construction.
All scale-relevant knobs live here so tests, the bench harness and the
driver's verify all get the same tuned session.

100 TB posture
--------------
- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — on a real cluster this is what adapts the static
  plan to actual partition sizes.
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a 1000-executor cluster this would be set to ~2-3x total cores.
- UTC session timezone pinned so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled: every Pandas-UDF boundary is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Local core budget; the driver exports SPARK_GRAFT_CPUS."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(
    app_name: str = "skoltexter-by-ai-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``getOrCreate`` reuses an existing session, so the first caller in a
    process decides the config — tests share one session deliberately.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Partition-coalescing strategy: parallelism-first (Spark's
        # default). A round-5 back-to-back A/B at sf0.1 measured the
        # size-first setting (false) at 103.2 s vs 90.9 s for the whole
        # 131-query suite — the big scan-heavy queries (simhash,
        # robust_zscore, boilerplate, majority-vote) lose more from
        # under-parallelized reducers than the tiny internal frames
        # save in scheduling overhead. On a production cluster with
        # small executors, size-first may still win — override with
        # SPARK_GRAFT_PARALLELISM_FIRST=false and re-measure.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
