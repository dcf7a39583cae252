"""Sequence packing: assign documents to fixed-size context windows.

The concatenate-and-chunk step of an LLM training-data pipeline: lay
documents end to end in a deterministic order and cut the stream every
``context_len`` tokens. Each document gets the chunk id and the token
offset at which it starts, so a downstream writer can materialize the
packed windows with a simple ``groupBy(chunk_id)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skoltexter_by_ai_spark.operators.text_analysis import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    context_len: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Chunk assignment -> ``(id, [shard], n_tokens, chunk_id, chunk_offset)``.

    ``chunk_id`` = tokens preceding this document (in ``id_col`` order,
    within its shard) integer-divided by ``context_len``;
    ``chunk_offset`` is the remainder. Documents longer than
    ``context_len`` simply span multiple chunks, exactly like the
    training-time concatenation they model.

    Scale: the running total is an ordered window per shard — one
    shuffle on ``shard_col``, then a per-partition sort. ALWAYS pass a
    ``shard_col`` at scale (a 100 TB corpus through a single global
    ordered window serializes on one task); per-shard packing is also
    what a multi-file training layout wants, one chunk stream per
    output shard. With ``shard_col=None`` the whole input is one
    shard — fine for tests and small corpora only.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    shard = F.col(shard_col) if shard_col else F.lit(0)
    w = (
        Window.partitionBy(shard)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tokens = token_count(text_col)
    cum_before = F.coalesce(F.sum(n_tokens).over(w), F.lit(0).cast("bigint"))
    out_cols = [F.col(id_col)]
    if shard_col:
        out_cols.append(F.col(shard_col))
    return df.select(
        *out_cols,
        n_tokens.alias("n_tokens"),
        F.floor(cum_before / F.lit(context_len)).cast("bigint").alias("chunk_id"),
        (cum_before % F.lit(context_len)).cast("bigint").alias("chunk_offset"),
    )
