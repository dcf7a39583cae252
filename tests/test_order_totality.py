"""Order-totality gate (SURVEY §2.3 rule b; VERDICT r3 item 1).

The driver's hash canonicalizes row order, so a non-total ORDER BY
only stays green by luck — one driver-side hashing change would flip
multiple queries red. Two independent gates close that hole for every
declared oracle query:

1. **Emitted-order equality**: the Spark result must match DuckDB
   row-for-row in EMITTED order, not just as a multiset. Engines break
   ties differently (verified: pre-fix x70 disagreed with DuckDB on
   2,547/7,853 tie rows), so agreement here is strong evidence the
   order is total.
2. **Sort-key → row functional dependency**: parse the oracle's final
   top-level ORDER BY; the subset of its columns present in the output
   must functionally determine the whole output row (distinct keys ==
   distinct rows on the oracle result). Tied rows are then identical,
   so ANY tie-breaking yields the same emitted sequence — this also
   holds the fixture-independent way a unique key would, while
   admitting fixtures whose natural keys are non-unique (the driver's
   lineitem has ~20% duplicate (l_orderkey, l_linenumber) pairs).
"""

from __future__ import annotations

import pytest

from skoltexter_by_ai_spark.plans.registry import all_queries
from skoltexter_by_ai_spark.testing import (
    compare_with_oracle,
    duckdb_connection,
    final_order_by_columns,
)

_QUERIES = all_queries()
_ORACLE_QUERIES = sorted(n for n, s in _QUERIES.items() if s.oracle is not None)


def test_final_order_by_parser_ignores_literals_and_comments():
    """The ORDER BY locator must not be fooled by parens/keywords in
    string literals or -- comments, and must accept ORDER\\n  BY
    (ADVICE r4)."""
    sql = (
        "SELECT a, ') order by b' AS lit  -- trailing ( paren comment\n"
        "FROM t\nORDER\n  BY a DESC, b"
    )
    assert final_order_by_columns(sql) == ["a", "b"]
    # ORDER BY inside a subquery (depth > 0) is not the final one.
    assert final_order_by_columns(
        "SELECT * FROM (SELECT a FROM t ORDER BY a) s"
    ) is None


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_emitted_order_matches_oracle(spark, sf_dir, name):
    spec = _QUERIES[name]
    df = spec.builder(spark, sf_dir)
    report = compare_with_oracle(name, df, spec.oracle, sf_dir, ordered=True)
    assert report.ok, (
        f"{name}: {report.detail} (rows {report.spark_rows}/{report.oracle_rows})"
    )


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_sort_key_determines_output(name, sf_dir):
    """DuckDB-only (no Spark needed): the declared ORDER BY's
    output-column subset must determine the full output row."""
    spec = _QUERIES[name]
    con = duckdb_connection(sf_dir)
    try:
        df = con.execute(spec.oracle).df()
    finally:
        con.close()
    key = final_order_by_columns(spec.oracle)
    if key is None:
        # No outermost ORDER BY is only acceptable for a single-row
        # result (global aggregate), which is trivially ordered.
        assert len(df) <= 1, f"{name}: multi-row result without a final ORDER BY"
        return
    out_key = [c for c in key if c in df.columns]
    assert out_key, (
        f"{name}: none of the ORDER BY columns {key} appear in the output "
        f"{list(df.columns)} — totality cannot be established"
    )
    # Stringify so unhashable cells (arrays, maps) group cleanly.
    s = df.astype(str)
    n_keys = s[out_key].drop_duplicates().shape[0]
    n_rows = s.drop_duplicates().shape[0]
    assert n_keys == n_rows, (
        f"{name}: ORDER BY columns {out_key} do not determine the output row "
        f"({n_keys} distinct keys vs {n_rows} distinct rows) — append a "
        "tiebreak column to the ORDER BY in BOTH the builder and the oracle"
    )
