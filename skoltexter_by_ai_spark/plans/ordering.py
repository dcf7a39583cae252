"""Deterministic output ordering for DIMENSION-BOUNDED frames.

Many declared queries end with a global ``orderBy`` purely to make the
output order deterministic. Spark plans that as a range exchange —
which first runs a SAMPLING job over the child, then shuffles into
range partitions, then sorts — two extra scheduled jobs per query,
paid even when the frame being ordered is a 5-row GROUP BY over an
enum key (r11 floor census: the range-sort tail cost 2 of a typical
sub-second query's 4 jobs; A/B on the x49 shape: 0.85 s -> 0.52 s,
4 -> 2 jobs).

:func:`bounded_sort` emits the SAME rows in the SAME order as
``df.orderBy(*cols)`` but as ``coalesce(1).sortWithinPartitions``:
one task reads the (bounded) frame and sorts it in place — no
sampling job, no range exchange, and under AQE the sort typically
fuses into the final-aggregate read stage.

SCALE CONTRACT — callers must only use this on frames whose row count
is bounded by a DIMENSION, not by the corpus: aggregates over enum or
calendar keys (return flag, priority, nation/region, brand, year,
year-month, bucket/tier ids, labels), scalar aggregates, or frames
already reduced to a top-k. ``coalesce(1)`` additionally collapses
the final aggregation into the same single task, so the bound must
cover the map-side partials too (map tasks x groups rows) — true for
every enum-keyed aggregate at any input size, NEVER true for
per-document/per-order outputs, which must keep the distributed
range sort.

``coalesce(1)`` is a NARROW dependency: it collapses the whole stage
back to the previous exchange. When that stage is itself fact-scaled
— a window over the full table (q14's keep-first row_number), a join
streaming a fact-scaled probe side (x58's supplier tie-set join) —
collapsing it serializes real work, not just the bounded final merge.
Those callers use :func:`bounded_sort_after_wide` instead, which puts
an explicit single-partition EXCHANGE between the wide stage and the
sort: the producing stage keeps its natural parallelism and only the
bounded output rows cross to the one sorting task. It still skips the
range sort's sampling job, so it costs one job fewer than ``orderBy``
and one more than :func:`bounded_sort` (ADVICE r11).

Every call site of either function is pinned in
``tests/test_ordering_contract.py`` — an allowlisted census with the
boundedness argument per site — so a new corpus-bounded call cannot
sneak in unreviewed (VERDICT r11 item 8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def bounded_sort(df: DataFrame, *cols: Column | str) -> DataFrame:
    """``df.orderBy(*cols)`` for dimension-bounded frames, without the
    range exchange + sampling job (see module docstring for the
    boundedness contract the caller asserts)."""
    return df.coalesce(1).sortWithinPartitions(*cols)


def bounded_sort_after_wide(df: DataFrame, *cols: Column | str) -> DataFrame:
    """``df.orderBy(*cols)`` for a dimension-bounded frame PRODUCED BY
    a fact-scaled stage (window / join) that must keep its
    parallelism: a single-partition round-robin exchange forms the
    stage boundary ``coalesce(1)`` would have erased, then one task
    sorts the bounded rows. Same rows, same order as ``orderBy`` —
    the final sort establishes the total order regardless of how the
    exchange interleaved rows — minus the range sort's sampling job."""
    return df.repartition(1).sortWithinPartitions(*cols)
