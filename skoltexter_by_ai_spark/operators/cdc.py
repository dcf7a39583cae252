"""Change-data-capture merge operators: upsert/delete streams → current
snapshot or full SCD2 history.

The reference's only incremental discipline is file-existence skipping
(X9, program2_ai_processor.py:543-550, 692-724 — plan-time anti-join +
task-time re-check). At 100 TB the same idea generalizes to log-
structured ingestion: a change stream of keyed upserts/deletes folded
into the current table state. These operators are that fold, expressed
as window functions so Catalyst plans one shuffle on the merge key.

Scale posture:
- one shuffle, keyed by the merge key — the same partitioning the
  downstream table wants, so a bucketed sink makes the merge shuffle
  reusable;
- keep-last is a per-key ``row_number`` (map-side nothing to combine,
  but AQE skew-split handles hot keys);
- no driver-side state; the change log itself can be arbitrarily large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upserts(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Fold a change log into the latest row per key (keep-LAST).

    ``seq_col`` is the total order within a key (commit LSN, event
    time, file sequence). The winner is the row with the greatest
    ``seq_col``; if ``op_col`` is given and the winning row's op equals
    ``delete_op``, the key is dropped from the snapshot — tombstone
    semantics, exactly how log-compacted stores (Kafka compaction,
    Delta/Hudi merge-on-read) resolve state.

    Deterministic by construction: ties on ``seq_col`` are broken by
    the remaining ordering being unique per key in well-formed logs;
    pass a composite seq (e.g. ``F.struct(ts, file_idx)`` flattened)
    when the raw sequence can tie.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        last = last.filter(F.col(op_col) != delete_op)
    return last


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: every change becomes a
    versioned row with a validity interval.

    ``valid_from`` = the row's own sequence value; ``valid_to`` = the
    next change's sequence for the same key (NULL while current);
    ``is_current`` marks the open interval. One shuffle on the key —
    ``lead()`` over the same window that ordered the changes.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    nxt = F.lead(F.col(seq_col)).over(w)
    return (
        changes.withColumn(valid_from_col, F.col(seq_col))
        .withColumn(valid_to_col, nxt)
        .withColumn(current_col, nxt.isNull())
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    change_col: str = "change_type",
) -> DataFrame:
    """Diff two table versions by key: rows ``added`` (key only in
    ``new``), ``removed`` (only in ``old``), ``changed`` (key in both,
    any compare column differs). Unchanged keys are dropped.

    The audit/debug companion to :func:`merge_upserts` — exactly what a
    data-versioning layer shows between commits. One full outer join on
    the key (single shuffle both sides); comparisons are null-safe
    (``<=>``) so NULL→value and value→NULL count as changes.

    Output: key columns + ``change_col``; old/new compare columns
    prefixed ``old_`` / ``new_``.
    """
    o = old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))
    joined = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~same, "changed")
    )
    return (
        joined.withColumn(change_col, change)
        .filter(F.col(change_col).isNotNull())
        .drop("__in_old", "__in_new")
    )
