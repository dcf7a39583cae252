"""Embedding encoder + approximate-aggregate tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators.embedding import hashed_embedding
from skoltexter_by_ai_spark.operators import similarity


def test_hashed_embedding_deterministic_and_unit_norm(spark):
    rows = [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "something else"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.embedding for r in hashed_embedding(df, dim=32).collect()}
    assert out[1] == out[2]  # identical text -> identical vector
    assert out[1] != out[3]
    assert math.isclose(sum(x * x for x in out[1]), 1.0, rel_tol=1e-5)
    assert all(x == 0.0 for x in out[4])  # empty text -> zero vector
    # Recomputation (different partitioning) gives the same vectors.
    again = {r.doc_id: r.embedding for r in hashed_embedding(df.repartition(3), dim=32).collect()}
    assert again == out


def test_hashed_embedding_feeds_similarity_ops(spark):
    texts = [(i, f"document number {i} about topic {i % 3}") for i in range(30)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    emb = hashed_embedding(df, dim=32).withColumnRenamed("doc_id", "vec_id")
    query = emb.filter(F.col("vec_id") == 0)
    top = similarity.cosine_topk(emb, query, k=5).collect()
    assert len(top) == 5
    # Same-topic documents share more tokens -> rank above other topics.
    assert top[0].vec_id % 3 == 0


def test_approx_count_distinct_within_bound_of_exact(spark, sf_dir):
    from skoltexter_by_ai_spark.sources.tables import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    rows = (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("exact"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) / max(r.exact, 1) < 0.05


def test_quantize_int8_roundtrip_preserves_cosine(spark, sf_dir):
    from skoltexter_by_ai_spark.operators.embedding import dequantize, quantize_int8
    from skoltexter_by_ai_spark.operators.similarity import cosine
    from skoltexter_by_ai_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    deq = dequantize(quantize_int8(emb))
    stats = deq.select(
        cosine(F.col("embedding"), F.col("embedding_deq")).alias("cs")
    ).agg(F.min("cs").alias("mn")).collect()[0]
    # int8 symmetric quantization keeps cosine within ~1e-3 of identity.
    assert stats.mn > 0.999


def test_quantize_int8_bounds_and_zero_vector(spark):
    from skoltexter_by_ai_spark.operators.embedding import quantize_int8

    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert rows[0].q_embedding == [64, -127, 32]
    assert rows[0].q_scale == 127.0
    assert rows[1].q_embedding == [0, 0, 0]
    assert rows[1].q_scale == 1.0


def test_quantize_int8_property_random_vectors(spark):
    """Spark column math vs a numpy oracle over random vectors
    (including negatives, tiny magnitudes, and an all-zero row)."""
    import math
    import random

    from skoltexter_by_ai_spark.operators.embedding import quantize_int8

    rng = random.Random(13)
    vecs = [
        [rng.uniform(-10, 10) * (10 ** rng.randint(-4, 2)) for _ in range(16)]
        for _ in range(50)
    ]
    vecs.append([0.0] * 16)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: (r.q_embedding, r.q_scale) for r in quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        # float32 storage first (the column type), then float64 math —
        # exactly what the Spark plan does.
        v32 = [float.fromhex(float(x).hex()) for x in v]
        import struct

        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        absmax = max(abs(x) for x in v32)
        scale = 127.0 / absmax if absmax > 0 else 1.0
        expect = [math.floor(x * scale + 0.5) for x in v32]
        q, s = got[i]
        assert q == expect, f"row {i}"
        assert abs(s - scale) < 1e-12
        assert all(-127 <= x <= 127 for x in q)


def test_hashed_embedding_matches_spec_replica(spark):
    """The hashing trick is a persistence contract: bucket = first 8
    md5 bytes mod dim, sign = top bit, L2-normalized histogram. A
    test-local replica of that spec pins every constant (digest slice,
    shift 63, mask 1, sign convention) — any drift re-embeds every
    stored corpus differently."""
    import hashlib
    import math

    from skoltexter_by_ai_spark.operators.embedding import hashed_embedding

    texts = [(1, "the cat sat"), (2, "spark spark spark"), (3, "")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: list(r.embedding) for r in hashed_embedding(df, dim=8).collect()}

    def replica(text, dim=8):
        v = [0.0] * dim
        for tok in (text or "").lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            sign = 1.0 if (h >> 63) & 1 == 0 else -1.0
            v[h % dim] += sign
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    for did, text in texts:
        want = replica(text)
        assert all(abs(g - w) < 1e-6 for g, w in zip(got[did], want)), (did, got[did], want)


def test_hashed_embedding_default_dim_is_64(spark):
    from skoltexter_by_ai_spark.operators.embedding import hashed_embedding

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    assert len(hashed_embedding(df).collect()[0].embedding) == 64
