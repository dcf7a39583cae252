"""Oracle compares for every query built in plans/extension_queries.py —
the per-module mutation-gate killer (see builder_module_suite)."""

from __future__ import annotations

import pytest

from builder_module_suite import check_query, module_queries

NAMES = module_queries("extension_queries")


def test_module_has_queries():
    assert NAMES, "module registry empty — registration broke"


@pytest.mark.parametrize("name", NAMES)
def test_builder_matches_oracle(spark, sf_dir, name):
    check_query(spark, sf_dir, name)
