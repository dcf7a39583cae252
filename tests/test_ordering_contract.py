"""Structural guard for the ``bounded_sort`` boundedness contract
(VERDICT r11 item 8).

``plans/ordering.bounded_sort`` replaces a deterministic output
``orderBy`` with ``coalesce(1).sortWithinPartitions`` — legal ONLY on
frames whose row count is bounded by a DIMENSION (enum/calendar/top-k
key), never per-document/per-order outputs.
``bounded_sort_after_wide`` is its sibling for bounded outputs whose
PRODUCING stage is fact-scaled (window/join) and must keep its
parallelism behind an explicit exchange.

The order-totality suite catches order changes; nothing structural
caught a future builder applying either helper to a corpus-bounded
key. This census does: every call site in ``plans/`` must appear in
the allowlist below with the boundedness argument that was reviewed.
Adding a call site without extending the allowlist — or removing one
without pruning it — fails the test and forces that review.
"""

from __future__ import annotations

import ast
import os

import skoltexter_by_ai_spark.plans as plans_pkg

_PLANS_DIR = os.path.dirname(os.path.abspath(plans_pkg.__file__))

# (file, enclosing function, helper) -> why the sorted frame is
# dimension-bounded. Reviewed r11 (VERDICT r11 row 3 audited the
# suspicious sites) + r12 (q14/x58 moved to the after-wide variant).
ALLOWED: dict[tuple[str, str, str], str] = {
    ("analytics_queries.py", "x36", "bounded_sort"): "scalar stats aggregate (1 row)",
    ("analytics_queries.py", "x37", "bounded_sort"): "enum-keyed arg-extremes aggregate",
    ("analytics_queries.py", "x49", "bounded_sort"): "returnflag x linestatus aggregate",
    ("analytics_queries.py", "x51", "bounded_sort"): "nation-keyed revenue aggregate",
    ("analytics_queries.py", "x78", "bounded_sort"): "fixed-width histogram bins",
    ("core_queries.py", "q11", "bounded_sort"): "nation-keyed join output (25 rows)",
    ("core_queries.py", "q14", "bounded_sort_after_wide"): (
        "one keep-first survivor per nation; window stage stays parallel"
    ),
    ("core_queries.py", "q15", "bounded_sort"): "orderstatus-keyed aggregate",
    ("core_queries.py", "q18", "bounded_sort"): "regionkey-keyed aggregate",
    ("core_queries.py", "q23", "bounded_sort"): "nation-bounded collation sort",
    ("curation_queries.py", "x81", "bounded_sort"): "one row per validation rule",
    ("curation_queries.py", "x102", "bounded_sort"): "source x source overlap matrix",
    ("curation_queries.py", "x103", "bounded_sort"): "per-source divergence (sources)",
    ("curation_queries.py", "x106", "bounded_sort"): "per-source funnel stages",
    ("curation_queries.py", "x107", "bounded_sort"): "per-shard balance (fixed shards)",
    ("curation_queries.py", "x108", "bounded_sort"): "learned BPE merges (fixed count)",
    ("extension_queries.py", "x17", "bounded_sort"): "declared (doc_id<50) x (rank<=3)",
    ("extension_queries.py", "x12", "bounded_sort"): "hour x event_type rollup",
    ("extension_queries.py", "x73", "bounded_sort"): "top-k ANN results per probe set",
    ("extension_queries.py", "x82", "bounded_sort"): "top-k trending terms",
    ("extension_queries.py", "x94", "bounded_sort"): "one centroid per label",
    ("extension_queries.py", "x113", "bounded_sort"): "daily rollup (calendar-bounded)",
    ("olap_queries.py", "x21", "bounded_sort"): "rollup over enum keys",
    ("olap_queries.py", "x24", "bounded_sort"): "per-returnflag percentiles",
    ("olap_queries.py", "x28", "bounded_sort"): "per-returnflag distinct counts",
    ("olap_queries.py", "x30", "bounded_sort"): "nation x region cross join",
    ("olap_queries.py", "x31", "bounded_sort"): "cube over enum keys",
    ("olap_queries.py", "x32", "bounded_sort"): "year x month calendar aggregate",
    ("olap_queries.py", "x33", "bounded_sort"): "per-returnflag ordered array_agg",
    ("olap_queries.py", "x64", "bounded_sort"): "region/nation HLL rollup",
    ("olap_queries.py", "x69", "bounded_sort"): "cohort-day x day-k retention grid",
    ("tpch_queries.py", "x53", "bounded_sort"): "order-priority aggregate (5 rows)",
    ("tpch_queries.py", "x55", "bounded_sort"): "histogram over orders-per-customer",
    ("tpch_queries.py", "x56", "bounded_sort"): "year-month promo share",
    ("tpch_queries.py", "x58", "bounded_sort_after_wide"): (
        "max-revenue tie set; supplier-revenue join stage stays parallel"
    ),
    ("tpch_queries.py", "x59", "bounded_sort"): "brand-keyed aggregate",
    ("tpch_queries.py", "x84", "bounded_sort"): "nation-pair x year aggregate",
    ("tpch_queries.py", "x85", "bounded_sort"): "per-year market share",
    ("tpch_queries.py", "x104", "bounded_sort"): "year-month forecast aggregate",
}

_HELPERS = {"bounded_sort", "bounded_sort_after_wide"}


def _census() -> set[tuple[str, str, str]]:
    sites: set[tuple[str, str, str]] = set()
    for fname in sorted(os.listdir(_PLANS_DIR)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(_PLANS_DIR, fname)) as fh:
            tree = ast.parse(fh.read())
        funcs = [
            (n.name, n.lineno, n.end_lineno or n.lineno)
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]

        class Visitor(ast.NodeVisitor):
            def visit_Call(self, node: ast.Call) -> None:
                name = None
                if isinstance(node.func, ast.Name):
                    name = node.func.id
                elif isinstance(node.func, ast.Attribute):
                    name = node.func.attr
                if name in _HELPERS:
                    enclosing = next(
                        (f for f, lo, hi in funcs if lo <= node.lineno <= hi),
                        "<module>",
                    )
                    sites.add((fname, enclosing, name))
                self.generic_visit(node)

        Visitor().visit(tree)
    return sites


def test_every_bounded_sort_call_site_is_reviewed():
    sites = _census()
    new = sites - set(ALLOWED)
    gone = set(ALLOWED) - sites
    assert not new, (
        "bounded_sort/bounded_sort_after_wide call sites not in the reviewed "
        f"allowlist: {sorted(new)}. These helpers are ONLY legal on "
        "dimension-bounded frames (plans/ordering.py contract). Review the "
        "boundedness of the new site (is the sort key an enum/calendar/"
        "top-k key? is the producing stage bounded, or does it need the "
        "after-wide variant?) and extend ALLOWED with the argument."
    )
    assert not gone, (
        f"allowlisted bounded_sort call sites disappeared: {sorted(gone)}. "
        "Prune ALLOWED so the census stays exact."
    )


def test_allowlist_reasons_are_nonempty():
    assert all(reason.strip() for reason in ALLOWED.values())
