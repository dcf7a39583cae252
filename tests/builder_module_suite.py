"""Shared implementation for the per-plans-module builder suites
(tests/test_builders_*.py) — the mutation-gate killers for
plans/*_queries.py (VERDICT r10 item 4: the builders had never had a
mutation pass; the full test_declared_queries.py sweep is too slow to
run per mutant, so each plans module gets a file running ONLY its own
queries' oracle compares)."""

from __future__ import annotations

from skoltexter_by_ai_spark.plans.registry import all_queries
from skoltexter_by_ai_spark.testing import compare_with_oracle


def module_queries(module_suffix: str) -> list[str]:
    return sorted(
        name
        for name, spec in all_queries().items()
        if spec.builder.__module__.endswith(module_suffix)
    )


def check_query(spark, sf_dir: str, name: str) -> None:
    spec = all_queries()[name]
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= spec.min_rows, f"{name} below min_rows={spec.min_rows}"
        return
    report = compare_with_oracle(name, df, spec.oracle, sf_dir)
    assert report.ok, (
        f"{name}: {report.detail} (rows {report.spark_rows}/{report.oracle_rows})"
    )
    assert report.spark_rows >= spec.min_rows, f"{name} below min_rows={spec.min_rows}"
