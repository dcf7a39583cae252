"""BM25 search + corpus-LM scoring (operators.retrieval)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators.retrieval import bm25_topk, unigram_logprob


def _bm25_term(tf, dfq, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_exact_values_and_ranking(spark):
    # doc 1: "spark spark join" (dl 3), doc 2: "join hash" (dl 2),
    # doc 3: "other words here" (dl 3, no match). N=3, avgdl=8/3.
    df = spark.createDataFrame(
        [(1, "spark spark join"), (2, "join hash"), (3, "other words here")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in bm25_topk(df, "doc_id", "text", ["spark", "hash", "join"]).collect()}
    n, avgdl = 3, 8 / 3
    want1 = _bm25_term(2, 1, n, 3, avgdl) + _bm25_term(1, 2, n, 3, avgdl)
    want2 = _bm25_term(1, 2, n, 2, avgdl) + _bm25_term(1, 1, n, 2, avgdl)
    assert rows[1].n_terms == 2 and rows[1].score == round(want1, 6)
    assert rows[2].n_terms == 2 and rows[2].score == round(want2, 6)
    assert 3 not in rows  # no matching term, no row
    # Term frequency on a rare term dominates: doc 1 (tf=2 on df-1
    # 'spark') outranks doc 2 (tf=1 on df-1 'hash', shorter length).
    assert rows[1].score > rows[2].score


def test_bm25_top_k_cap_and_validation(spark):
    df = spark.createDataFrame(
        [(i, "spark x") for i in range(20)], "doc_id long, text string"
    )
    out = bm25_topk(df, "doc_id", "text", ["spark"], top_k=5).collect()
    # All scores tie; the doc_id tiebreak makes the emitted top-5 the
    # smallest ids (total order).
    assert [r.doc_id for r in out] == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="query_terms"):
        bm25_topk(df, "doc_id", "text", [])
    with pytest.raises(ValueError, match="top_k"):
        bm25_topk(df, "doc_id", "text", ["spark"], top_k=0)


def test_unigram_logprob_exact(spark):
    # Corpus: tokens a a a b -> P(a)=3/4, P(b)=1/4.
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a"), (3, "   ")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    lp_a, lp_b = math.log(3 / 4), math.log(1 / 4)
    assert rows[1].n_tokens == 3
    assert rows[1].mean_logprob == round((2 * lp_a + lp_b) / 3, 6)
    assert rows[2].n_tokens == 1 and rows[2].mean_logprob == round(lp_a, 6)
    # Whitespace-only documents contribute no tokens and get no row.
    assert 3 not in rows
    # The all-common doc is more "typical" than the one with the rare token.
    assert rows[2].mean_logprob > rows[1].mean_logprob


def test_rrf_fuse_exact_fusion_and_null_ranks(spark):
    from skoltexter_by_ai_spark.operators.retrieval import rrf_fuse

    # List A ranks: 10 (0.9), 20 (0.8), 30 (0.7); list B: 20 (0.99),
    # 40 (0.5). Doc 20 is in both; 10/30 only in A; 40 only in B.
    a = spark.createDataFrame(
        [(10, 0.9), (20, 0.8), (30, 0.7)], "doc_id long, s double"
    )
    b = spark.createDataFrame([(20, 0.99), (40, 0.5)], "doc_id long, s double")
    rows = {
        r.doc_id: r
        for r in rrf_fuse(
            [(a, "s", "rank_a"), (b, "s", "rank_b")], "doc_id", rrf_k=60, top_k=10
        ).collect()
    }
    assert rows[20].rank_a == 2 and rows[20].rank_b == 1
    assert rows[20].rrf_score == round(1 / 62 + 1 / 61, 6)
    assert rows[10].rank_a == 1 and rows[10].rank_b is None
    assert rows[10].rrf_score == round(1 / 61, 6)
    assert rows[40].rank_a is None and rows[40].rank_b == 2
    # Doc 20 (two lists) beats every single-list doc.
    ordered = rrf_fuse(
        [(a, "s", "rank_a"), (b, "s", "rank_b")], "doc_id"
    ).collect()
    assert ordered[0].doc_id == 20


def test_rrf_fuse_score_ties_break_on_id_and_topk_caps(spark):
    from skoltexter_by_ai_spark.operators.retrieval import rrf_fuse

    # Equal scores: ranks assigned by (score desc, id), so id 1 gets
    # rank 1. Two docs with the same single-list rank in different
    # lists tie on rrf_score and order by id.
    a = spark.createDataFrame([(1, 0.5), (2, 0.5)], "doc_id long, s double")
    b = spark.createDataFrame([(9, 0.5)], "doc_id long, s double")
    out = rrf_fuse([(a, "s", "ra"), (b, "s", "rb")], "doc_id", top_k=2).collect()
    assert [r.doc_id for r in out] == [1, 9]  # both 1/61; 2 is 1/62
    assert out[0].ra == 1 and out[1].rb == 1

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([], "doc_id")
    with pytest.raises(ValueError, match="duplicate rank_name"):
        rrf_fuse([(a, "s", "r"), (b, "s", "r")], "doc_id")
    with pytest.raises(ValueError, match="top_k"):
        rrf_fuse([(a, "s", "r")], "doc_id", top_k=0)


def test_default_parameters_pinned(spark):
    """The declared queries lean on the documented defaults (top_k=10,
    rrf_k=60) — mutation gate r7: a silent default drift must fail
    here, not surface as an oracle mismatch two rounds later."""
    from skoltexter_by_ai_spark.operators.retrieval import bm25_topk, rrf_fuse

    docs = spark.createDataFrame(
        [(i, "spark " * (i + 1)) for i in range(15)], "doc_id long, text string"
    )
    # 15 matching docs, default cap -> exactly 10 rows.
    assert len(bm25_topk(docs, "doc_id", "text", ["spark"]).collect()) == 10
    # top_k=1 is legal (boundary of the validation guard) and caps to 1.
    assert len(bm25_topk(docs, "doc_id", "text", ["spark"], top_k=1).collect()) == 1

    a = spark.createDataFrame(
        [(i, 1.0 - i / 20.0) for i in range(12)], "doc_id long, s double"
    )
    out = rrf_fuse([(a, "s", "ra")], "doc_id").collect()
    assert len(out) == 10  # default top_k
    assert out[0].rrf_score == round(1 / 61, 6)  # default rrf_k = 60


def test_bigram_logprob_exact_hand_corpus(spark):
    import math

    from skoltexter_by_ai_spark.operators.retrieval import bigram_logprob

    # Corpus: doc 1 "a b a b", doc 2 "a b c", doc 3 "x" (no bigram).
    # Unigrams: a:3 b:3 c:1 x:1 -> V=4.
    # Bigram counts: (a,b):3, (b,a):1, (b,c):1.
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    V = 4

    def lp(cab, ca):
        return math.log((cab + 1.0) / (ca + V))

    want1 = (lp(3, 3) + lp(1, 3) + lp(3, 3)) / 3  # a b, b a, a b
    want2 = (lp(3, 3) + lp(1, 3)) / 2             # a b, b c
    assert rows[1].n_bigrams == 3
    assert rows[1].mean_logprob == round(want1, 6)
    assert rows[2].n_bigrams == 2
    assert rows[2].mean_logprob == round(want2, 6)
    assert 3 not in rows  # sub-2-token doc emits no row
    # Repetitive high-probability doc scores above the novel one.
    assert rows[1].mean_logprob > rows[2].mean_logprob


def test_perplexity_buckets_hand_values(spark):
    """Corpus: t has count 5/8, r 3/8. Fluency order is doc1=doc2
    (all-t) > doc3 (mixed) > doc4 (all-r); ties break on doc_id.
    NTILE(3) over 4 rows -> sizes 2,1,1; NTILE(2) -> 2,2."""
    import math

    import pytest

    from skoltexter_by_ai_spark.operators.retrieval import perplexity_buckets

    df = spark.createDataFrame(
        [(1, "t t"), (2, "t t"), (3, "t r"), (4, "r r")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in perplexity_buckets(df, "doc_id", "text", n_buckets=3).collect()
    }
    assert [rows[i].bucket for i in (1, 2, 3, 4)] == [1, 1, 2, 3]
    assert rows[1].mean_logprob == round(math.log(5 / 8), 6)
    assert rows[3].mean_logprob == round((math.log(5 / 8) + math.log(3 / 8)) / 2, 6)
    assert rows[4].mean_logprob == round(math.log(3 / 8), 6)

    two = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(df, "doc_id", "text", n_buckets=2).collect()
    }
    assert [two[i] for i in (1, 2, 3, 4)] == [1, 1, 2, 2]

    one = perplexity_buckets(df, "doc_id", "text", n_buckets=1)
    assert {r.bucket for r in one.collect()} == {1}

    with pytest.raises(ValueError, match="n_buckets must be"):
        perplexity_buckets(df, "doc_id", "text", n_buckets=0)


def test_perplexity_buckets_equal_window_ntile_on_random_corpora(spark):
    """The closed-form rank->bucket arithmetic must equal Spark's own
    NTILE window for every (N, k) shape — including N < k, N % k != 0
    and heavy score ties. Random corpora seeded for reproducibility."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from skoltexter_by_ai_spark.operators.retrieval import (
        perplexity_buckets,
        unigram_logprob,
    )

    rng = random.Random(190)
    vocab = ["aa", "bb", "cc", "dd"]
    for trial, (n_docs, k) in enumerate([(7, 3), (2, 5), (12, 4), (9, 1), (30, 7)]):
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 6))))
            for i in range(n_docs)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(df, "doc_id", "text", n_buckets=k).collect()
        }
        w = Window.orderBy(F.col("mean_logprob").desc(), F.col("doc_id"))
        expect = {
            r.doc_id: r.b
            for r in unigram_logprob(df, "doc_id", "text")
            .select("doc_id", F.ntile(k).over(w).alias("b"))
            .collect()
        }
        assert got == expect, (trial, n_docs, k, got, expect)


def test_rrf_fuse_top_k_one_is_legal(spark):
    """top_k=1 is the legal lower bound (single best hybrid hit);
    0 raises."""
    import pytest

    from skoltexter_by_ai_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 0.9), (2, 0.5)], "doc_id long, s double")
    b = spark.createDataFrame([(2, 0.8), (1, 0.1)], "doc_id long, s double")
    out = rrf_fuse([(a, "s", "ra"), (b, "s", "rb")], "doc_id", top_k=1).collect()
    assert len(out) == 1 and out[0].doc_id in (1, 2)
    with pytest.raises(ValueError, match="top_k"):
        rrf_fuse([(a, "s", "ra")], "doc_id", top_k=0)
