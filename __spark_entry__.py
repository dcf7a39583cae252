"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the declared-query registry
(SURVEY.md §2.3 Q1..Q24 + §2.4 extension operators) for the driver's
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-Q1-style pricing summary over lineitem.

    groupBy + multi-aggregate + order — partial aggregation map-side,
    decimal-stabilized sums (no float-summation nondeterminism).
    """
    lineitem = spark.read.parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    # Exact decimal accumulation internally; DOUBLE at the output
    # boundary (decimal-typed result columns serialize differently
    # across engines — see tests/test_declared_queries.py).
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from skoltexter_by_ai_spark.plans.registry import all_queries

    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible declared query."""
    from skoltexter_by_ai_spark.plans.registry import all_queries

    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
