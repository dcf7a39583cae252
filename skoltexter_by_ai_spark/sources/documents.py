"""Document-directory source and JSONL source/sink.

Reference parity: Program 2 consumes a directory of per-school
markdown files keyed by filename stem (``sorted(input_dir.glob("*.md"))``,
key = stem — src/program2_ai_processor.py:628,542) and persists raw
LLM responses as per-row JSON files (src/program2_ai_processor.py:600-613).
Spark-first shape: a directory of small files is ONE DataFrame
``(doc_key, content)`` — the key comes from the file path, not a
driver-side glob, so listing and reading stay distributed.

Scale posture: many tiny files is itself the scale problem (one scan
task per file, NameNode/list pressure). These readers are the ingest
edge; the first thing a pipeline should do is compact to parquet
(``cli.py`` stage boundaries do exactly that) and never re-list the
directory again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_document_dir(
    spark: SparkSession,
    path: str,
    pattern: str = "*.md",
    key_suffix_to_strip: str = "",
) -> DataFrame:
    """Read every ``pattern`` file under ``path`` as one row:
    ``(doc_key string, content string)``.

    ``doc_key`` is the filename stem (reference keys documents by stem,
    src/program2_ai_processor.py:542); ``key_suffix_to_strip`` removes
    a trailing marker like ``_ai_description`` when present. Ordering
    is NOT implied — apply ``orderBy(doc_key)`` where the reference
    relied on ``sorted(glob(...))``.
    """
    raw = spark.read.text(f"{path}/{pattern}", wholetext=True)
    stem = F.regexp_extract(F.input_file_name(), r"([^/]+)\.[^./]+$", 1)
    if key_suffix_to_strip:
        stem = F.regexp_replace(stem, f"{key_suffix_to_strip}$", "")
    return raw.select(stem.alias("doc_key"), F.col("value").alias("content"))


def write_jsonl(df: DataFrame, path: str, order_col: str | None = None) -> None:
    """Write a DataFrame as JSON-lines (one object per row).

    The dataset twin of the reference's per-row ``json.dump`` sink —
    one distributed dataset instead of N driver-written files.
    """
    out = df.orderBy(order_col) if order_col else df
    out.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Read JSON-lines with an explicit schema when known.

    Always pass ``schema`` in production: schema inference is a full
    extra pass over the data — at 100 TB that doubles the scan.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
