"""Dataset sinks with explicit physical layout.

The reference writes one file per row and one HTML artifact; at scale
the layout IS the optimization, so the writers here make the two
levers explicit:

- :func:`write_partitioned` — directory partitioning: predicates on
  the partition columns prune whole directories at plan time
  (``PartitionFilters`` in the scan), the cheapest scan reduction
  available.
- :func:`write_bucketed` — hash bucketing + in-bucket sort: joins and
  aggregations on the bucket keys skip their shuffle entirely
  (no ``Exchange`` in the plan), the single biggest cost at 100 TB.
  Both join sides must agree on bucket count and keys.

Both are asserted at the PLAN level in tests/test_sinks.py — not just
"results match" but "the shuffle is actually gone / the scan actually
prunes".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Write parquet partitioned by ``partition_cols`` (low-cardinality
    columns only — each distinct combination becomes a directory)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Write a bucketed (and optionally sorted) parquet table.

    Registered in the session catalog (bucketing metadata lives in the
    catalog, not the files); ``path`` makes it an external table so
    the data outlives the catalog entry.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    order_col: str | None = None,
) -> int:
    """Rewrite a parquet dataset into files of ~``target_file_bytes``.

    The small-files cure for ingest edges like
    ``sources.documents.read_document_dir``: scans of many tiny files
    pay one task + one open per file and hammer the listing service;
    compaction restores scan throughput. Sizing uses the filesystem's
    own content summary (works on local paths and HDFS-compatible
    stores alike). ``order_col`` switches to a range partitioning so
    the output is additionally clustered for min/max row-group
    skipping on that column. Returns the number of output partitions.
    """
    import math

    df = spark.read.parquet(src)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    out = df.repartitionByRange(n, order_col) if order_col else df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n


# Formats Spark ships without extra packages. Avro needs the external
# spark-avro package, so it is deliberately absent.
DATASET_FORMATS = ("parquet", "orc", "json", "csv")


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
    **options: str,
) -> None:
    """Format-agnostic dataset writer over Spark's built-in sources.

    One code path for parquet/ORC (columnar, splittable — the scale
    formats) and JSON/CSV (interchange). CSV defaults to a header row;
    both text formats stay gzip-free by default so files remain
    splittable — compression is an explicit option because a gzipped
    CSV caps scan parallelism at one task per file.
    """
    if fmt not in DATASET_FORMATS:
        raise ValueError(f"fmt must be one of {DATASET_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_dataset(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Format-agnostic reader matching :func:`write_dataset`.

    For JSON/CSV pass an explicit ``schema`` (DDL string) in
    production: schema inference reads the data twice and can drift
    between runs — acceptable only in exploration.
    """
    if fmt not in DATASET_FORMATS:
        raise ValueError(f"fmt must be one of {DATASET_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
