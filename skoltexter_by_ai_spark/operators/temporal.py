"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join.

The reference has no temporal processing at all; these are SURVEY §2.4
scale-path operators for event/feature pipelines (point-in-time
feature lookup, attribution windows).

Both are expressed as compositions of existing DataFrame ops — no
UDFs, no per-row Python:

- :func:`asof_join` uses the union + last-ignorenulls window trick:
  one shuffle on the key, no row explosion, regardless of how many
  right rows precede each left row.
- :func:`range_join` buckets event time so the equi-join prunes to
  adjacent buckets instead of a full theta-join — the difference
  between O(n*m) nested-loop and an equi-shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right.ts <= left.ts`` (``direction="backward"``, the default
    point-in-time join) or the EARLIEST right row with
    ``right.ts >= left.ts`` (``direction="forward"`` — pandas
    ``merge_asof``'s forward mode; "next quote after the order").

    Implementation: tag both sides, union, and carry the matching
    right payload across the union with ``last(...)`` over an
    unbounded-preceding window (backward) or ``first(...)`` over an
    unbounded-following window (forward), both ``ignorenulls``. The
    tag tiebreak makes an exactly-simultaneous right row match in
    BOTH directions (right sorts before left at equal ts backward,
    after it forward). One shuffle on ``on``; state per window is one
    payload row either way.

    ``tolerance_seconds`` drops matches farther than the tolerance in
    the match direction (match columns become NULL, the row is kept —
    left-join shape).

    The right payload rides the window as ONE struct column so every
    output field comes from the same matched right row. Filling each
    payload column independently would backfill a NULL field of the
    newest right row from an older right row, emitting a frankenrow
    mixing fields of different matches.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward': {direction!r}")
    backward = direction == "backward"
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0 if backward else 1).alias("__tag"),
        F.struct(
            F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__rpay"),
    )
    pay_type = r_tagged.schema["__rpay"].dataType
    extra_left = [c for c in left.columns if c not in (on, ts_col)]
    l_tagged = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1 if backward else 0).alias("__tag"),
        F.lit(None).cast(pay_type).alias("__rpay"),
        *extra_left,
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = Window.partitionBy(on).orderBy(ts_col, "__tag")
    w = (
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if backward
        else w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # last/first(ignorenulls) skips only NULL *structs* (i.e. left
    # rows); a right row with NULL fields is still a real, complete
    # match.
    fill = F.last if backward else F.first
    filled = unioned.withColumn("__f", fill("__rpay", ignorenulls=True).over(w))
    out = filled.filter(F.col("__tag") == (1 if backward else 0))
    signed_gap = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__f.__rts"))
        if backward
        else F.unix_micros(F.col("__f.__rts")) - F.unix_micros(F.col(ts_col))
    )
    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else (
            F.col("__f.__rts").isNotNull()
            & (signed_gap <= int(tolerance_seconds * 1_000_000))
        )
    )
    keep = [on, ts_col, *extra_left]
    return out.select(
        *keep,
        *[F.when(in_tol, F.col(f"__f.{c}")).alias(f"{c}{suffix}") for c in right_cols],
        F.when(in_tol, F.col("__f.__rts")).alias(f"{ts_col}{suffix}"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    window_seconds: float = 600.0,
    suffix: str = "_right",
) -> DataFrame:
    """Pairs (l, r) on the same key with
    ``l.ts <= r.ts < l.ts + window_seconds`` (attribution window).

    Implementation: bucket event time into ``window_seconds``-wide
    bins; every qualifying pair lands in the left row's bucket b or
    b+1, so an equi-join on (key, bucket) x 2 + an exact range filter
    replaces the theta-join. Shuffle keys are (key, bucket) — skew in
    hot time buckets is AQE-splittable.
    """
    win_us = int(window_seconds * 1_000_000)
    l_b = left.withColumn("__us", F.unix_micros(F.col(ts_col))).withColumn(
        "__bucket", (F.col("__us") / win_us).cast("long")
    )
    r_b = (
        right.withColumn("__us_r", F.unix_micros(F.col(ts_col)))
        .withColumn("__bucket_r", (F.col("__us_r") / win_us).cast("long"))
        .select(
            F.col(on).alias("__on_r"),
            "__us_r",
            "__bucket_r",
            *[F.col(c).alias(f"{c}{suffix}") for c in right.columns if c != on],
        )
    )
    # Each left bucket b joins right buckets {b, b+1}.
    l_exploded = l_b.withColumn(
        "__probe", F.explode(F.array(F.col("__bucket"), F.col("__bucket") + 1))
    )
    joined = l_exploded.join(
        r_b,
        (F.col(on) == F.col("__on_r")) & (F.col("__probe") == F.col("__bucket_r")),
    )
    return (
        joined.filter(
            (F.col("__us_r") >= F.col("__us")) & (F.col("__us_r") < F.col("__us") + win_us)
        )
        .drop("__us", "__bucket", "__probe", "__on_r", "__us_r", "__bucket_r")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins keyed merge (CDC upsert) of two same-schema frames.

    For each key, keep the row with the highest ``version_col``; a
    base row survives only when no update outranks it, and an exact
    version tie resolves to the update side (deterministic). One
    shuffle on the key — the declarative MERGE INTO that a mutable
    warehouse table would do, rerun-safe because the whole output is
    recomputed from inputs (same posture as the reference's
    idempotent re-run, SURVEY §2.2 X9).
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError("base and updates must share a schema")
    tagged = base.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__src", "__rn")
    )


def gap_fill_forward(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_cols: list[str],
    step: str = "1 hour",
) -> DataFrame:
    """Regularize a sparse per-key time series and forward-fill values.

    Builds each key's complete grid from its min to max observed
    ``time_col`` at ``step`` spacing (``sequence`` + ``explode`` — the
    grid is generated distributed, never on the driver), left-joins
    the observations back, and carries ``value_cols`` forward with
    ``last(ignorenulls=True)`` over an ordered per-key window.
    Emitted rows carry ``__observed = false`` where the grid point had
    no source row.

    Scale: one aggregation for the bounds, one equi-shuffle for the
    join, one per-key window — all on the (small) per-bucket series,
    not raw events. Grid density is bounded per key by its own span,
    so a short-lived key never pays for the corpus' full time range.
    """
    kc, tc = F.col(key_col), F.col(time_col)
    bounds = df.groupBy(kc.alias(key_col)).agg(
        F.min(tc).alias("__mn"), F.max(tc).alias("__mx")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.expr(f"interval {step}"))
        ).alias(time_col),
    )
    marked = df.withColumn("__obs", F.lit(True))
    joined = grid.join(marked, [key_col, time_col], "left").withColumn(
        "__observed", F.coalesce(F.col("__obs"), F.lit(False))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        key_col,
        time_col,
        "__observed",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled
