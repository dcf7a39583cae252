"""Local replica of the driver's DuckDB-oracle correctness check.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB at sf0.01, then compares row count,
schema (column names) and an order-insensitive value hash. This module
reproduces that comparison so every declared query is verified in
``tests/`` before the driver ever sees it.
"""

from __future__ import annotations

import decimal
import math
from dataclasses import dataclass
from typing import Any

import duckdb
from pyspark.sql import DataFrame

from skoltexter_by_ai_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the fixture tables as views."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(value: Any) -> Any:
    """Engine-neutral value form for exact comparison."""
    if value is None:
        return None
    if isinstance(value, decimal.Decimal):
        return ("dec", str(value))
    if isinstance(value, float):
        if math.isnan(value):
            return ("f", "nan")
        return ("f", repr(value))
    if isinstance(value, bool):
        return ("b", value)
    if isinstance(value, int):
        return ("i", value)
    if isinstance(value, bytes):
        return ("bytes", value)
    if isinstance(value, list):
        return ("list", tuple(_normalize(v) for v in value))
    if isinstance(value, dict):
        return ("map", tuple(sorted((k, _normalize(v)) for k, v in value.items())))
    return (type(value).__name__, str(value))


def _canonical_rows(records: list[dict[str, Any]], columns: list[str]) -> list[tuple]:
    ordered_cols = sorted(columns)
    rows = [tuple(_normalize(rec[c]) for c in ordered_cols) for rec in records]
    rows.sort(key=repr)
    return rows


@dataclass
class OracleReport:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    values_match: bool
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.columns_match and self.values_match and self.spark_rows == self.oracle_rows


def compare_with_oracle(name: str, spark_df: DataFrame, oracle_sql: str, sf_dir: str) -> OracleReport:
    spark_tbl = spark_df.toArrow()
    con = duckdb_connection(sf_dir)
    try:
        duck_tbl = con.execute(oracle_sql).arrow()
    finally:
        con.close()

    spark_cols = sorted(spark_tbl.column_names)
    duck_cols = sorted(duck_tbl.column_names)
    columns_match = spark_cols == duck_cols
    detail = ""
    values_match = False
    if not columns_match:
        detail = f"columns spark={spark_cols} duckdb={duck_cols}"
    else:
        s_rows = _canonical_rows(spark_tbl.to_pylist(), spark_tbl.column_names)
        d_rows = _canonical_rows(duck_tbl.to_pylist(), duck_tbl.column_names)
        values_match = s_rows == d_rows
        if not values_match:
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    detail = f"first diff at sorted row {i}: spark={a!r} duckdb={b!r}"
                    break
            else:
                detail = f"row-count mismatch {len(s_rows)} vs {len(d_rows)}"
    return OracleReport(
        name=name,
        spark_rows=spark_tbl.num_rows,
        oracle_rows=duck_tbl.num_rows,
        columns_match=columns_match,
        values_match=values_match,
        detail=detail,
    )
