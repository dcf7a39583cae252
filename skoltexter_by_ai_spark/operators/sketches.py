"""Mergeable-sketch aggregation: the 100 TB answer to COUNT(DISTINCT).

An exact distinct count re-shuffles raw values for every new grouping.
A Datasketches HLL sketch is an ~KB-sized mergeable summary: build
sketches ONCE at a fine grain (e.g. per day-partition during ingest),
persist them, then answer any coarser rollup by unioning sketches —
no second pass over the 100 TB of raw data, bounded error (~1–2 % at
lg_k=12).

Built entirely on Spark's JVM-side Datasketches functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
no UDFs. The reference has no sketching (SURVEY §2.4 extension);
accuracy is unit-tested against exact counts in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Fine-grained HLL sketches: one ``binary`` sketch per key tuple.

    This is the state you PERSIST (a few KB per group): any coarser
    distinct-count question over these keys is then answerable from
    the sketches alone via :func:`hll_reaggregate`.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def hll_reaggregate(
    sketches: DataFrame, keys: list[str], sketch_col: str = "hll_sketch"
) -> DataFrame:
    """Union fine sketches up to coarser ``keys`` and estimate.

    Input rows carry sketches (from :func:`hll_rollup`); the shuffle
    moves KB-sized sketches, never raw values — the re-rollup cost is
    proportional to the number of fine groups, not the corpus.
    Output: keys + ``approx_distinct`` (BIGINT estimate).
    """
    grouped = (
        sketches.groupBy(*keys).agg(F.hll_union_agg(sketch_col).alias("__u"))
        if keys
        else sketches.agg(F.hll_union_agg(sketch_col).alias("__u"))
    )
    return grouped.select(
        *keys, F.hll_sketch_estimate("__u").cast("bigint").alias("approx_distinct")
    )


def approx_distinct_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """End-to-end: sketch at ``fine_keys``, re-aggregate to
    ``coarse_keys`` — demonstrating that the coarse answer comes from
    the fine sketches (the mergeability property), not from re-scanning
    raw values."""
    if not set(coarse_keys) <= set(fine_keys):
        raise ValueError("coarse_keys must be a subset of fine_keys")
    return hll_reaggregate(hll_rollup(df, fine_keys, value_col, lg_k), coarse_keys)
