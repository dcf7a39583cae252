"""Z-order (Morton) codes: multi-dimensional clustering keys for
data skipping.

Range-clustering a table on ONE column (`sources.sinks.compact_parquet
(order_col=...)`) tightens per-file min/max bounds on that column only.
Interleaving the bits of two columns into one Morton code and
clustering on it tightens the bounds on BOTH — parquet's row-group
min/max stats then skip files/row-groups for predicates on either
dimension. This is the layout trick behind Delta/Iceberg Z-ORDER,
expressed as a pure column function so any writer can use it:

    df.repartitionByRange(n, morton_code("a", "b"))
      .sortWithinPartitions(morton_code("a", "b"))
      .write.parquet(...)

All bit math is integer Column arithmetic (shift/and/or) — identical
in every engine, so Morton keys are oracle-checkable and stable across
re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_code(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer columns:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Callers map raw values onto the integer grid first (e.g. quantile
    rank or fixed-width binning) — the code assumes values already fit
    ``[0, 2^bits)``; higher bits are masked off so out-of-range inputs
    degrade to wraparound rather than collisions across the whole key
    space.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = ca.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    cb = cb.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    code = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        code = code.bitwiseOR(abit).bitwiseOR(bbit)
    return code


def morton_sql(a: str, b: str, bits: int = 16) -> str:
    """The DuckDB-SQL twin of :func:`morton_code` (same bit layout),
    for oracle parity checks."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"((({a} & {mask}) >> {i} & 1) << {2 * i})")
        terms.append(f"((({b} & {mask}) >> {i} & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
