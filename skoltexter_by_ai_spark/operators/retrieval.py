"""Full-text retrieval operators: BM25 keyword search and corpus
language-model scoring.

Reference parity: the reference's query surface is substring search
over a scanned corpus (SURVEY §2.2 Q-a, ``src`` query paths); these
are the scale-path extensions a user of that surface reaches for next
— ranked keyword retrieval and statistical fluency scoring — built as
pure DataFrame compositions (zero UDFs, everything inside whole-stage
codegen).

Scale shape:

- :func:`bm25_topk` never explodes full documents: the query-term
  filter runs INSIDE the token array (``F.filter``) so only matching
  occurrences reach the one (doc, term) aggregation shuffle. The
  document-frequency table is query-term-bounded and the corpus stats
  are one row — both broadcast. The final top-k plans as
  TakeOrderedAndProject (per-partition heaps), never a global sort.
- :func:`unigram_logprob` joins the exploded token stream against the
  corpus unigram table on the token key WITHOUT a forced broadcast
  (an open-web vocabulary is unbounded — the x97 lesson); AQE still
  broadcasts when the vocabulary is actually small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skoltexter_by_ai_spark.operators.dedup import tokens


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 ranking of documents against a bag of query terms.

    Per matched (document, term): ``idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))`` with the Lucene idf
    ``ln((N − df + 0.5)/(df + 0.5) + 1)``; the document score is the
    sum over matched terms, rounded to 6 places.

    Output: ``(id_col, n_terms, score)`` — top ``top_k`` by
    ``(score desc, id)`` (the id tiebreak keeps the order total).
    ``N``/``avgdl`` are computed over the FULL corpus (standard BM25),
    including documents matching no term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1: {top_k}")
    term_arr = F.array(*[F.lit(t) for t in query_terms])
    toks = tokens(text_col)
    # One corpus pass for N/avgdl (1 row, broadcast); matching docs
    # keep only their query-term hits — the full token stream is never
    # exploded.
    stats = df.agg(
        F.count("*").alias("__n"),
        F.avg(F.size(toks).cast("double")).alias("__avgdl"),
    )
    hits = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("__dl"),
        F.filter(toks, lambda t: F.array_contains(term_arr, t)).alias("__hits"),
    ).filter(F.size("__hits") > 0)
    # Pinned (lazily): tf feeds both the document-frequency aggregate
    # and the scoring join; unpinned, each re-ran the corpus hit scan.
    # Bounded: one row per (matching doc, query term).
    from skoltexter_by_ai_spark.operators.pinning import pin

    tf = pin(
        hits.select(id_col, "__dl", F.explode("__hits").alias("__term"))
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count("*").alias("__tf")),
        eager=False,
    )
    # tf is one row per (doc, term), so a plain count is the document
    # frequency; the table is bounded by len(query_terms).
    dfreq = tf.groupBy("__term").agg(F.count("*").alias("__df"))
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("__tf") * (k1 + 1.0)
        / (
            F.col("__tf")
            + k1 * (1.0 - b + b * F.col("__dl").cast("double") / F.col("__avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", term_score)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.round(F.sum("__s"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    maximum-likelihood unigram model — the classic cheap fluency /
    typicality score (a KenLM-shaped signal without an external model):
    documents full of corpus-rare tokens score low, boilerplate scores
    high. Useful as a quality-filter feature next to
    :func:`~skoltexter_by_ai_spark.operators.text_analysis.quality_score`.

    ``mean_logprob = (1/|d|) Σ_t ln(c(t) / N_tokens)`` over the
    document's tokens (every token has c ≥ 1 by construction — the
    model is estimated on the same corpus, so no smoothing term is
    needed). Output: ``(id_col, n_tokens, mean_logprob)`` for
    documents with at least one token, rounded to 6.

    Scale: one (token) count shuffle (vocabulary-bounded state), one
    token-key join of the exploded stream against that table with NO
    forced broadcast (AQE broadcasts when small), one (doc) rollup
    with map-side partials.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
    # Pin the vocabulary-bounded count table (lazily): it feeds the
    # scalar total AND the stream join, and unpinned each reference
    # re-tokenized the whole corpus (r11 plan: 3 scan towers). The
    # total now aggregates the pinned table — no third corpus pass.
    from skoltexter_by_ai_spark.operators.pinning import pin

    counts = pin(toks.groupBy("__tok").agg(F.count("*").alias("__c")), eager=False)
    total = counts.agg(F.sum("__c").alias("__nt"))
    return (
        toks.join(counts, "__tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            (F.round(
                F.avg(F.log(F.col("__c").cast("double") / F.col("__nt"))), 6
            ) + F.lit(0.0)).alias("mean_logprob"),
        )
    )


def rrf_fuse(
    rankings: list[tuple[DataFrame, str, str]],
    id_col: str,
    rrf_k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of bounded ranked lists — the standard
    hybrid-retrieval combiner (keyword BM25 + embedding cosine, or any
    N retrievers): ``rrf(d) = Σ_r 1 / (rrf_k + rank_r(d))`` over the
    rankings that contain ``d`` (Cormack et al., SIGIR 2009 — public
    formulation; rrf_k=60 is the conventional constant).

    ``rankings`` is a list of ``(df, score_col, rank_name)``; each
    frame is a retriever's candidate list carrying ``id_col`` and a
    score. Ranks are assigned here as ``row_number`` over
    ``(score desc, id)`` so ties are deterministic and the fusion is
    engine-reproducible. Output: ``(id_col, <rank_name>..., rrf_score)``
    top ``top_k`` by ``(rrf_score desc, id)``; absent-from-a-list
    contributes 0 and keeps a NULL rank.

    Scale posture: inputs are top-k candidate lists by contract —
    bounded, usually already on the driver's side of a
    TakeOrderedAndProject — so the unpartitioned ``row_number`` window
    and the full-outer joins all operate on k-sized frames. The
    retrievers bound the work; fusion never touches the corpus.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1: {top_k}")
    from pyspark.sql.window import Window

    fused: DataFrame | None = None
    rank_names: list[str] = []
    for df, score_col, rank_name in rankings:
        if rank_name in rank_names:
            raise ValueError(f"duplicate rank_name {rank_name!r}")
        rank_names.append(rank_name)
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        r = df.select(F.col(id_col), F.row_number().over(w).alias(rank_name))
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    score: F.Column | None = None
    for rank_name in rank_names:
        c = F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(rank_name)), F.lit(0.0)
        )
        score = c if score is None else score + c
    return (
        fused.select(id_col, *rank_names, F.round(score, 6).alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), id_col)
        .limit(top_k)
    )


def bigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    Laplace-smoothed bigram model — the step up from
    :func:`unigram_logprob` on the fluency-scoring ladder:

    ``mean_logprob = (1/(|d|-1)) Σ_i ln( (c(w_{i-1} w_i) + 1)
    / (c(w_{i-1}) + V) )`` with ``V`` the corpus unigram vocabulary
    size (add-one smoothing, so unseen continuations are finite and
    the model is defined on its own training corpus). Word-salad
    documents score low even when individual tokens are common —
    exactly what the unigram model cannot see.

    Output: ``(id_col, n_bigrams, mean_logprob)`` for documents with
    at least 2 tokens, rounded to 6.

    Scale: the bigram expansion is a shuffle-free ``zip_with`` over
    shifted token slices (bigram_pmi's shape); one (pair) count
    shuffle + one (token) count shuffle, both vocabulary-bounded with
    map-side partials; the positional bigram stream joins both count
    tables on their keys with NO forced broadcast (the x97 lesson —
    AQE broadcasts when genuinely small); ``V`` is a broadcast 1-row
    scalar. One final (doc) rollup.
    """
    from skoltexter_by_ai_spark.operators.dedup import _spread

    toks = _spread(df, id_col).select(
        F.col(id_col), tokens(text_col).alias("__t")
    )
    shifted = F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0)))
    pairs_arr = F.slice(
        F.zip_with(
            F.col("__t"), shifted, lambda x, y: F.struct(x.alias("a"), y.alias("b"))
        ),
        F.lit(1),
        F.greatest(F.size("__t") - 1, F.lit(0)),
    )
    stream = toks.select(F.col(id_col), F.explode(pairs_arr).alias("__p")).select(
        id_col, F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b")
    )
    # ONE exploded scan + ONE count shuffle serves BOTH count tables
    # (r11, the bigram_pmi shape): bigrams ride as (a, b) and unigrams
    # as (a, NULL) in the same stream — a real token is never NULL, so
    # the NULL right token unambiguously tags the unigram rows.
    # Previously each count table tokenized the corpus separately. The
    # combined vocabulary-bounded table is pinned (lazily) and every
    # consumer (stream join, unigram join, vocabulary scalar) reads
    # the one materialization.
    from skoltexter_by_ai_spark.operators.pinning import pin

    uni_arr = F.transform(
        F.col("__t"),
        lambda t: F.struct(t.alias("a"), F.lit(None).cast("string").alias("b")),
    )
    counts = pin(
        toks.select(F.explode(F.concat(pairs_arr, uni_arr)).alias("__p"))
        .select(F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count("*").alias("__n")),
        eager=False,
    )
    pair_counts = counts.filter(F.col("__b").isNotNull()).select(
        "__a", "__b", F.col("__n").alias("__cab")
    )
    uni = counts.filter(F.col("__b").isNull()).select(
        "__a", F.col("__n").alias("__ca")
    )
    vocab = uni.agg(F.count("*").alias("__v"))
    lp = F.log(
        (F.col("__cab") + F.lit(1.0))
        / (F.col("__ca") + F.col("__v")).cast("double")
    )
    return (
        stream.join(pair_counts, ["__a", "__b"])
        .join(uni, "__a")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            (F.round(F.avg(lp), 6) + F.lit(0.0)).alias("mean_logprob"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus-LM fluency signal of
    :func:`unigram_logprob`, then split the corpus into ``n_buckets``
    equal-population tiers by score — bucket 1 is the most fluent
    ("head"), the last the least ("tail"). The standard cheap quality
    stratification in front of a pretraining mix: keep head, sample
    middle, drop or re-weight tail.

    Output: ``(id_col, n_tokens, mean_logprob, bucket)`` with exact
    NTILE semantics over ``(mean_logprob DESC, id ASC)`` — base size
    ``N div k``, the first ``N mod k`` buckets one larger — so the
    result is engine-reproducible (deterministic tie-break on id).

    Scale posture: exact corpus-wide NTILE needs a total order, but
    NOT a single-task window — ranks come from
    :func:`~skoltexter_by_ai_spark.operators.skew.distributed_prefix_sum`
    (range-partition + per-partition offsets: one range shuffle over
    narrow (id, score) rows, two narrow passes, driver materializes
    only num_partitions counters). The bucket is then closed-form
    arithmetic on the rank; N itself is the offsets pass's own
    by-product, attached as a driver-side literal — no second pass.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    from skoltexter_by_ai_spark.operators.skew import distributed_prefix_sum

    scored = unigram_logprob(df, id_col, text_col).select(
        F.col(id_col),
        "n_tokens",
        "mean_logprob",
        # mean_logprob is rounded to 6 places, so negation is exact:
        # ascending __ord == descending mean_logprob (head first).
        (-F.col("mean_logprob")).alias("__ord"),
        F.lit(1).cast("bigint").alias("__one"),
    )
    ranked = distributed_prefix_sum(
        scored, ["__ord", id_col], "__one", out_col="__rn", total_col="__N"
    )
    k = F.lit(n_buckets).cast("bigint")
    rn = F.col("__rn")
    b = F.floor(F.col("__N") / k)
    rem = F.col("__N") % k
    cut = (b + 1) * rem
    bucket = F.when(rn <= cut, F.floor((rn - 1) / (b + 1)) + 1).otherwise(
        rem + F.floor((rn - cut - 1) / F.greatest(b, F.lit(1))) + 1
    )
    return ranked.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("mean_logprob"),
        bucket.cast("int").alias("bucket"),
    )
