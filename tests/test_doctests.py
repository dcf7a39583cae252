"""Doctest tier — reference parity with its xdoctest CI layer
(/root/reference/pytest.ini:11): docstring examples in the pure
(session-free) modules are executable and verified."""

from __future__ import annotations

import doctest

import pytest

from skoltexter_by_ai_spark.functions import markdown_lite
from skoltexter_by_ai_spark.operators import curation, enrich, multimodal


@pytest.mark.parametrize(
    "module", [markdown_lite, curation, enrich, multimodal], ids=lambda m: m.__name__
)
def test_module_doctests(module):
    result = doctest.testmod(module, verbose=False)
    assert result.failed == 0, f"{module.__name__}: {result.failed} doctest failures"


def test_doctests_actually_exist():
    """Guard against the tier silently becoming vacuous."""
    total = sum(
        doctest.testmod(m, verbose=False).attempted
        for m in (markdown_lite, curation, enrich)
    )
    assert total >= 5
