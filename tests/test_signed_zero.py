"""IEEE signed-zero normalization across the float-emitting query
surface (VERDICT r10 item 5, generalizing the x94 fix).

The exposed class: ``ROUND`` of a value that is −0.0 or a tiny
negative (|x| below half the rounding ulp). DuckDB's libm-backed
round keeps the sign (→ −0.0) while Spark's BigDecimal path yields
+0.0 — value-equal but repr/hash-distinct, so the driver's value-hash
comparison fails. Both engine sides now add ``+ 0.0`` after the round
(−0.0 + 0.0 == +0.0 in round-to-nearest), for every rounded column
whose argument can be negative: x36 corr/covar, x39 max_comp, x65
priority, x72 robust_z, x103 entropy/kl, x111 score, cosine columns
(x05/x06/x13/x15/x73/x94/x96), x97 pmi, x99/x114/x119 mean_logprob,
x113 z. These tests craft inputs that actually LAND in the knife-edge
band and assert the emitted zero is +0.0 (sign bit clear)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _positive_zero(x: float) -> bool:
    return x == 0.0 and math.copysign(1.0, x) == 1.0


def test_robust_z_tiny_negative_rounds_to_positive_zero(spark):
    """A value 0.01 below the median in a group whose MAD is ~30000
    gives z ≈ −3.3e−7 → rounds to zero; the emitted zero must be
    +0.0 on the Spark side in BOTH the fused and generic paths."""
    from skoltexter_by_ai_spark.operators.curation import robust_zscore

    rows = [
        ("g", -50000.00),
        ("g", 69999.99),  # 0.01 below the median
        ("g", 70000.01),
        ("g", 130000.00),
    ]
    df = spark.createDataFrame(rows, ["grp", "v"])
    for fused in (True, False):
        out = {
            r.v: r.robust_z
            for r in robust_zscore(df, "v", "grp", fused=fused).collect()
        }
        assert out[69999.99] == 0.0 and out[70000.01] == 0.0
        assert _positive_zero(out[69999.99]), f"fused={fused}: -0.0 leaked"
        assert _positive_zero(out[70000.01])


def test_cosine_tiny_negative_rounds_to_positive_zero(spark):
    """Orthogonal-but-for-a-tiny-negative-component vectors score
    cos ≈ −1e−7 → ROUND → the zero must be +0.0."""
    from skoltexter_by_ai_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(1, [-1.0e-7, 1.0]), (2, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    out = {r.vec_id: r.cos_sim for r in cosine_topk(emb, q, k=5).collect()}
    assert out[1] == 0.0 and _positive_zero(out[1])


def test_entropy_and_kl_zero_is_positive(spark):
    """A source whose every document is one repeated token has
    p = 1 → −sum(p·ln p) computes −0.0; KL against itself computes
    ±0.0. Both must emit +0.0."""
    from skoltexter_by_ai_spark.operators.text_analysis import (
        source_token_divergence,
    )

    df = spark.createDataFrame(
        [("s1", "hello hello hello"), ("s1", "hello")], ["src", "text"]
    )
    row = source_token_divergence(df, "src", "text").collect()[0]
    assert row.entropy == 0.0 and _positive_zero(row.entropy)
    assert row.kl_corpus == 0.0 and _positive_zero(row.kl_corpus)


def test_vocab_classifier_score_zero_is_positive(spark):
    """Weighted score that cancels exactly (e.g. +2 and −2 weights hit
    once each) must emit +0.0, not −0.0."""
    from skoltexter_by_ai_spark.operators.text_analysis import (
        vocab_weight_classifier,
    )

    df = spark.createDataFrame([(1, "spark slow spark slow")], ["doc_id", "text"])
    # spark=+2 twice, slow=-2 twice -> raw 0; score = 0/4.
    row = vocab_weight_classifier(
        df, "doc_id", "text", {"spark": 2.0, "slow": -2.0}, bias=0.0
    ).collect()[0]
    assert row.score == 0.0 and _positive_zero(row.score)


def test_oracle_sides_match_on_knife_edge_robust_z():
    """DuckDB side of the x72 shape with the same knife-edge data must
    now also emit +0.0 (the oracle got the same + 0.0)."""
    import duckdb

    con = duckdb.connect()
    # CAST to DOUBLE: the fixture parquet columns are doubles, and
    # DuckDB's median over DECIMAL picks a nearest VALUE instead of
    # interpolating, which would sidestep the knife-edge entirely.
    con.execute(
        "CREATE TABLE t AS SELECT g, CAST(x AS DOUBLE) AS x FROM (VALUES "
        "('g', -50000.00), ('g', 69999.99), ('g', 70000.01), "
        "('g', 130000.00)) AS v(g, x)"
    )
    val = con.execute(
        """
        WITH med AS (SELECT g, ROUND(median(x), 6) AS med FROM t GROUP BY 1),
        mad AS (
            SELECT t.g, ROUND(median(ABS(CAST(x AS DOUBLE) - m.med)), 6) AS mad
            FROM t JOIN med m ON t.g = m.g GROUP BY 1
        )
        SELECT ROUND((CAST(x AS DOUBLE) - m.med) / d.mad, 6) + 0.0 AS z
        FROM t JOIN med m ON t.g = m.g JOIN mad d ON t.g = d.g
        WHERE x = 69999.99
        """
    ).fetchone()[0]
    assert val == 0.0 and math.copysign(1.0, val) == 1.0
    # and WITHOUT the normalization DuckDB keeps the sign — proving the
    # hazard is real, not hypothetical
    raw = con.execute(
        """
        WITH med AS (SELECT g, ROUND(median(x), 6) AS med FROM t GROUP BY 1),
        mad AS (
            SELECT t.g, ROUND(median(ABS(CAST(x AS DOUBLE) - m.med)), 6) AS mad
            FROM t JOIN med m ON t.g = m.g GROUP BY 1
        )
        SELECT ROUND((CAST(x AS DOUBLE) - m.med) / d.mad, 6) AS z
        FROM t JOIN med m ON t.g = m.g JOIN mad d ON t.g = d.g
        WHERE x = 69999.99
        """
    ).fetchone()[0]
    assert raw == 0.0 and math.copysign(1.0, raw) == -1.0
