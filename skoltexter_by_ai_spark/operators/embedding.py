"""Embedding-column production: text -> ``array<float>``.

The stand-in for a model-backed encoder (the reference's X1 LLM call
with an embeddings endpoint): same Spark shape — Arrow-batched
``mapInPandas``, fixed-width output schema, pluggable encoder — with a
deterministic feature-hashing encoder so tests need no model.

Scale posture: narrow map-only stage; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``; the output column
feeds operators/similarity.py (top-k, ANN, near-dup) unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def _token_hash(token: str) -> int:
    # md5-based so the assignment is stable across processes, Python
    # versions and engines (hash() is salted; never use it here).
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def hashed_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Deterministic feature-hashing text encoder -> unit-norm vector.

    Each lowercase whitespace token hashes to a bucket and a sign
    (the classic hashing trick); the bucket histogram is L2-normalized.
    Identical texts embed identically; empty text embeds as the zero
    vector. Output: (id_col, embedding array<float>).
    """
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = []
            for text in pdf[text_col]:
                v = np.zeros(dim, dtype=np.float64)
                for tok in (text or "").lower().split():
                    h = _token_hash(tok)
                    sign = 1.0 if (h >> 63) & 1 == 0 else -1.0
                    v[h % dim] += sign
                n = float(np.linalg.norm(v))
                if n > 0:
                    v /= n
                vecs.append([float(x) for x in v])
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.mapInPandas(gen, out_schema)
