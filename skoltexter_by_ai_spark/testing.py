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


def _canonical_rows(
    records: list[dict[str, Any]], columns: list[str], *, keep_order: bool = False
) -> list[tuple]:
    ordered_cols = sorted(columns)
    rows = [tuple(_normalize(rec[c]) for c in ordered_cols) for rec in records]
    if not keep_order:
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


def compare_with_oracle(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
    *,
    ordered: bool = False,
) -> OracleReport:
    """Driver-style comparison. ``ordered=True`` compares rows in
    EMITTED order (columns still sorted by name, as the driver does) —
    the stricter gate that catches a non-total ORDER BY whose tie
    permutations only hash green because the driver canonicalizes row
    order (VERDICT r3 item 1)."""
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
        s_rows = _canonical_rows(
            spark_tbl.to_pylist(), spark_tbl.column_names, keep_order=ordered
        )
        d_rows = _canonical_rows(
            duck_tbl.to_pylist(), duck_tbl.column_names, keep_order=ordered
        )
        values_match = s_rows == d_rows
        if not values_match:
            kind = "emitted" if ordered else "sorted"
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    detail = f"first diff at {kind} row {i}: spark={a!r} duckdb={b!r}"
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


def final_order_by_columns(sql: str) -> list[str] | None:
    """Column names of a query's final top-level ``ORDER BY`` (the one
    at paren-depth 0), with ASC/DESC/NULLS modifiers and table
    qualifiers stripped; ``None`` when the outermost SELECT has no
    ORDER BY (e.g. a single-row global aggregate). Used by the order-
    totality gate (SURVEY §2.3 rule b)."""
    import re

    # Blank out quoted literals and `--` comments (length-preserving,
    # so indices into the original text stay valid) before the depth
    # scan — a paren or ORDER BY inside a string/comment must not skew
    # where the final top-level ORDER BY is located (ADVICE r4).
    scrubbed = re.sub(
        r"'(?:[^']|'')*'|--[^\n]*",
        lambda m: " " * len(m.group(0)),
        sql,
    )
    depth = 0
    idx = None
    for m in re.finditer(r"\(|\)|ORDER\s+BY", scrubbed, flags=re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            idx = m.end()
    if idx is None:
        return None
    tail = re.sub(r"\bLIMIT\s+\d+\s*;?\s*$", "", sql[idx:], flags=re.I).strip().rstrip(";")
    parts: list[str] = []
    d, cur = 0, ""
    for ch in tail:
        if ch == "(":
            d += 1
        if ch == ")":
            d -= 1
        if ch == "," and d == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    parts.append(cur)
    cols = []
    for p in parts:
        p = " ".join(p.split())
        p = re.sub(r"\s+(ASC|DESC)\b", "", p, flags=re.I)
        p = re.sub(r"\s+NULLS\s+(FIRST|LAST)\b", "", p, flags=re.I)
        p = p.strip()
        if re.fullmatch(r"[A-Za-z_][\w.]*", p):
            p = p.split(".")[-1]
        cols.append(p)
    return cols
