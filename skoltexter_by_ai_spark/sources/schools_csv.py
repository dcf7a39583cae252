"""Schools wide-CSV source (S1/S2).

Reference read: manual header parse with quote stripping + DictReader,
``utf-8-sig``, ``;`` delimiter (program1_generate_markdowns.py:367-375).
Spark read: declarative CSV scan; the BOM is handled by stripping a
leading U+FEFF from the first column name (Spark keeps it otherwise),
matching the reference's ``utf-8-sig`` decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_schools_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read the semicolon-delimited schools CSV, all columns string.

    Adds ``__row_idx`` = original file order so keep-first dedup (A3)
    is deterministic, mirroring the reference's "first instance in CSV
    order" rule (program3_generate_website.py:149-154). At 100 TB the
    equivalent is an explicit ingest-time sequence column; for a
    single-file CSV Spark reads one split in order, so a per-partition
    id is file order.
    """
    df = (
        spark.read.option("sep", ";")
        .option("header", True)
        .option("quote", '"')
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df.withColumn("__row_idx", F.monotonically_increasing_id())
