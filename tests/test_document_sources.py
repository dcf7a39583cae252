"""Document-directory and JSONL source/sink round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from skoltexter_by_ai_spark.sources.documents import (
    read_document_dir,
    read_jsonl,
    write_jsonl,
)


def test_read_document_dir_keys_by_stem(spark, tmp_path):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "1234.md").write_text("# School 1234\nbody text\n")
    (docs / "5678.md").write_text("# School 5678\nother body\n")
    (docs / "ignore.txt").write_text("not matched")

    df = read_document_dir(spark, str(docs)).orderBy("doc_key")
    rows = df.collect()
    assert [r.doc_key for r in rows] == ["1234", "5678"]
    assert rows[0].content == "# School 1234\nbody text\n"


def test_read_document_dir_strips_suffix(spark, tmp_path):
    docs = tmp_path / "ai"
    docs.mkdir()
    (docs / "1234_ai_description.md").write_text("enriched")
    df = read_document_dir(spark, str(docs), key_suffix_to_strip="_ai_description")
    assert df.collect()[0].doc_key == "1234"


def test_jsonl_round_trip(spark, tmp_path):
    df = spark.range(50).select(
        F.col("id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("name"),
        (F.col("id") % 3 == 0).alias("flag"),
    )
    path = str(tmp_path / "out.jsonl")
    write_jsonl(df, path, order_col="id")
    back = read_jsonl(spark, path, schema="id bigint, name string, flag boolean")
    assert back.count() == 50
    got = {(r.id, r.name, r.flag) for r in back.collect()}
    want = {(r.id, r.name, r.flag) for r in df.collect()}
    assert got == want
