"""Corpus-curation declared queries (operators/curation.py): the
selection jobs in front of a pretraining mix — stratified sampling,
benchmark-contamination scan, token-budget mixing. Each has an exact
DuckDB oracle: the operators are deliberately built from
engine-portable primitives (md5 draws, word shingles, ordered window
sums) so the driver's hash gate can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from skoltexter_by_ai_spark.plans.ordering import bounded_sort
from skoltexter_by_ai_spark.plans.registry import register
from skoltexter_by_ai_spark.sources.tables import load_table

_TOKS = "string_split_regex(trim(text), '\\s+')"


def _duck_shingles(n: int) -> str:
    """DuckDB expression mirroring operators.dedup.word_shingles."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len(toks) - {n - 1}, 0)), "
        f"i -> array_to_string(toks[i:i+{n - 1}], ' ')))"
    )


# Per-stratum keep fractions for x61 (hex thresholds in the oracle are
# fraction_threshold() of these values).
_X61_FRACTIONS = {"src0": 0.8, "src1": 0.5, "src2": 0.25}
_X61_DEFAULT = 0.1


@register(
    "x61_stratified_sample",
    oracle="""
        SELECT doc_id, source
        FROM documents
        WHERE substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) <
              CASE source WHEN 'src0' THEN 'cccccccc'
                          WHEN 'src1' THEN '80000000'
                          WHEN 'src2' THEN '40000000'
                          ELSE '19999999' END
        ORDER BY doc_id
    """,
    covers="deterministic stratified sampling (md5 draw, per-stratum fractions)",
    tags=("training", "curation"),
)
def x61(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.curation import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(
        docs, "source", _X61_FRACTIONS, "doc_id", default_fraction=_X61_DEFAULT
    ).orderBy("doc_id")


@register(
    "x62_ngram_contamination",
    # Train side = the whole documents table; eval side = every 20th
    # document standing in for a benchmark set. Self-pairs (a document
    # against itself) are the strongest signal and stay in.
    oracle=f"""
        WITH tr AS (
            SELECT doc_id AS train_id, {_duck_shingles(3).replace("toks", _TOKS)} AS shs
            FROM documents
        ),
        trs AS (SELECT train_id, unnest(shs) AS sh FROM tr),
        ev AS (
            SELECT doc_id AS eval_id, {_duck_shingles(3).replace("toks", _TOKS)} AS shs
            FROM documents WHERE doc_id % 20 = 0 AND doc_id < 500
        ),
        evt AS (SELECT eval_id, CAST(len(shs) AS BIGINT) AS eval_ngrams
                FROM ev WHERE len(shs) > 0),
        evs AS (SELECT eval_id, unnest(shs) AS sh FROM ev),
        shared AS (
            SELECT train_id, eval_id, COUNT(*) AS shared_ngrams
            FROM trs JOIN evs USING (sh)
            GROUP BY 1, 2
        )
        SELECT train_id, eval_id, shared_ngrams, eval_ngrams,
               ROUND(shared_ngrams * 1.0 / eval_ngrams, 6) AS overlap_frac
        FROM shared JOIN evt USING (eval_id)
        WHERE ROUND(shared_ngrams * 1.0 / eval_ngrams, 6) >= 0.5
        ORDER BY train_id, eval_id
    """,
    covers="benchmark-contamination scan: n-gram overlap train x eval (leakage)",
    tags=("training", "curation", "text"),
)
def x62(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    # Benchmark sets are FIXED SIZE by contract — they do not grow with
    # the corpus. The fixed id window models that: corpus growth scales
    # only the train side, so the shared-shingle pair volume stays
    # linear (eval % 20 alone would grow both sides and the join
    # quadratically — a fixture artifact, not a property of the scan).
    evals = docs.filter((F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 500))
    return ngram_contamination(docs, evals, n=3, min_overlap=0.5).orderBy(
        "train_id", "eval_id"
    )


@register(
    "x63_token_budget_sample",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) AS draw
            FROM documents
        ),
        c AS (
            SELECT doc_id, source, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY draw, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM t
        )
        SELECT doc_id, source, n_tokens, cum_before
        FROM c WHERE cum_before < 500
        ORDER BY doc_id
    """,
    covers="token-budget corpus mixing: stable-random per-source selection",
    tags=("training", "curation"),
)
def x63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.curation import token_budget_sample

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_sample(
        docs, "source", "doc_id", "text", budget_tokens=500
    ).orderBy("doc_id")


@register(
    "x65_weighted_sample",
    # Weighted-without-replacement sample, 5 docs per source with
    # probability ~ token count. The md5 draw divides by 2^32 (exact
    # in doubles), and the ln/weight priority is rounded to 6 places
    # with an id tie-break, so both engines select identically.
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                   CAST('0x' || substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hx
            FROM documents
        ),
        p AS (
            SELECT doc_id, source, n_tokens,
                   ROUND(-ln((hx + 1) / 4294967296.0) / n_tokens, 6) + 0.0 AS priority
            FROM t WHERE n_tokens > 0
        ),
        r AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY priority, doc_id) AS rn
            FROM p
        )
        SELECT doc_id, source, n_tokens, priority
        FROM r WHERE rn <= 5
        ORDER BY doc_id
    """,
    covers="deterministic weighted sampling (Efraimidis-Spirakis top-k per stratum)",
    tags=("training", "curation"),
)
def x65(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import weighted_sample
    from skoltexter_by_ai_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    return weighted_sample(docs, "source", "doc_id", "n_tokens", k=5).orderBy("doc_id")


@register(
    "x70_winsorize",
    # Per-returnflag 5/95% winsorization of l_extendedprice: quantile
    # thresholds from one aggregation (quantile_cont == Spark
    # percentile, both interpolated, rounded to 6), broadcast back and
    # clipped in a narrow projection.
    oracle="""
        WITH b AS (
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
                   ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS hi
            FROM lineitem GROUP BY 1
        )
        SELECT l_orderkey, l_linenumber, l.l_returnflag,
               CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
               b.lo AS l_extendedprice_lo,
               b.hi AS l_extendedprice_hi,
               LEAST(GREATEST(CAST(l_extendedprice AS DOUBLE), b.lo), b.hi)
                   AS l_extendedprice_w
        FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
        WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber, l.l_returnflag, l_extendedprice
    """,
    covers="winsorization / outlier clipping per group (feature-pipeline numeric prep)",
    tags=("training", "curation", "olap"),
)
def x70(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import winsorize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    # Thresholds from the full table; the projected output is bounded
    # so the declared result stays small.
    out = winsorize(li, "l_extendedprice", group_col="l_returnflag")
    return (
        out.filter(F.col("l_orderkey") <= 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            "l_extendedprice_lo",
            "l_extendedprice_hi",
            "l_extendedprice_w",
        )
        # (l_orderkey, l_linenumber) is NOT unique on the fixture;
        # (flag, price) tiebreaks make the order total — the remaining
        # columns (lo/hi/w) are functions of (flag, price), so tied
        # rows are identical (SURVEY §2.3 rule b).
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    )


@register(
    "x72_robust_zscore",
    # Robust standardization for feature pipelines: (v - median)/MAD
    # per group, where MAD = median(|v - median|). Two aggregation
    # passes, each broadcast back onto the narrow projection — the
    # outlier-insensitive sibling of mean/stddev scaling. Quantiles
    # are interpolated doubles rounded to 6 (the cross-engine-stable
    # form); the final score divides identically-rounded doubles.
    oracle="""
        WITH med AS (
            SELECT l_returnflag, ROUND(median(l_extendedprice), 6) AS med
            FROM lineitem GROUP BY 1
        ),
        mad AS (
            SELECT l.l_returnflag,
                   ROUND(median(ABS(CAST(l_extendedprice AS DOUBLE) - m.med)), 6) AS mad
            FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
            GROUP BY 1
        )
        SELECT l_orderkey, l_linenumber, l.l_returnflag,
               CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
               m.med AS grp_median, d.mad AS grp_mad,
               ROUND((CAST(l_extendedprice AS DOUBLE) - m.med) / d.mad, 6) + 0.0 AS robust_z
        FROM lineitem l
        JOIN med m ON l.l_returnflag = m.l_returnflag
        JOIN mad d ON l.l_returnflag = d.l_returnflag
        WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber, l.l_returnflag, robust_z, l_extendedprice
    """,
    covers="robust z-score: per-group median/MAD standardization (outlier-insensitive scaling)",
    tags=("training", "curation", "olap"),
)
def x72(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import robust_zscore

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    # Bounded-state median/MAD (operators.quantiles bisection) — the
    # oracle's F.median semantics without its per-group value-map
    # state (VERDICT r2 weak-point closed).
    return (
        robust_zscore(li, "l_extendedprice", "l_returnflag")
        .filter(F.col("l_orderkey") <= 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            "grp_median",
            "grp_mad",
            "robust_z",
        )
        # (l_orderkey, l_linenumber) is NOT unique on the fixture;
        # (flag, robust_z, price) tiebreaks make the order total
        # UNCONDITIONALLY: robust_z is strictly monotone in price
        # within a flag group when the group's MAD is nonzero, and the
        # trailing price key covers the MAD = 0 case (robust_z NULL for
        # the whole group), so totality no longer depends on the
        # fixture (ADVICE r4). median/MAD are functions of the flag, so
        # tied rows are identical (SURVEY §2.3 rule b).
        .orderBy(
            "l_orderkey", "l_linenumber", "l_returnflag", "robust_z", "l_extendedprice"
        )
    )


@register(
    "x81_expectation_report",
    # Data-quality expectations over lineitem, all evaluated in one
    # scan/aggregation; the report is rule-count sized. Bounds chosen
    # so some rules pass clean and some surface real violations.
    oracle="""
        WITH agg AS (
            SELECT
                CAST(SUM(CASE WHEN l_quantity IS NULL OR NOT (l_quantity BETWEEN 1 AND 50)
                              THEN 1 ELSE 0 END) AS BIGINT) AS qty_in_range,
                CAST(SUM(CASE WHEN l_discount IS NULL OR NOT (l_discount BETWEEN 0.0 AND 0.06)
                              THEN 1 ELSE 0 END) AS BIGINT) AS discount_low,
                CAST(SUM(CASE WHEN l_extendedprice IS NULL OR NOT (l_extendedprice > 0)
                              THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
                CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_present,
                CAST(SUM(CASE WHEN l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R')
                              THEN 1 ELSE 0 END) AS BIGINT) AS returnflag_domain,
                CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem
        )
        SELECT r.rule, 
               CASE r.rule
                   WHEN 'qty_in_range' THEN qty_in_range
                   WHEN 'discount_low' THEN discount_low
                   WHEN 'price_positive' THEN price_positive
                   WHEN 'shipdate_present' THEN shipdate_present
                   WHEN 'returnflag_domain' THEN returnflag_domain
               END AS n_violations,
               n_rows
        FROM agg, (VALUES ('qty_in_range'), ('discount_low'), ('price_positive'),
                          ('shipdate_present'), ('returnflag_domain')) AS r(rule)
        ORDER BY rule
    """,
    covers="data-quality expectation report: N named rules in one scan/aggregation (production pipeline gate)",
    tags=("curation",),
    min_rows=5,
)
def x81(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import validate_expectations

    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        ("qty_in_range", F.col("l_quantity").between(1, 50)),
        ("discount_low", F.col("l_discount").between(0.0, 0.06)),
        ("price_positive", F.col("l_extendedprice") > 0),
        ("shipdate_present", F.col("l_shipdate").isNotNull()),
        ("returnflag_domain", F.col("l_returnflag").isin("A", "N", "R")),
    ]
    # rule-count-bounded output
    return bounded_sort(validate_expectations(li, rules), "rule")


@register(
    "x90_curation_pipeline",
    # The end-to-end corpus-curation pipeline as ONE declared query:
    # quality-gate documents (x08's heuristic, >= 0.5), cluster the
    # survivors by near-duplicate connected components (x20), keep the
    # best-quality representative per cluster (x77's tiebreak), and
    # assign leak-free train/val/test splits on the cluster id (x89).
    # Each stage is oracle-proven on its own; this query proves the
    # COMPOSITION — what a real training-data job runs nightly.
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
        ),
        q AS (
            SELECT d.doc_id,
                   CAST(len(tk.t) AS BIGINT) AS n_tok,
                   CASE WHEN len(tk.t) > 0 THEN
                       CAST(len(list_filter(string_split_regex(trim(lower(d.text)), '\\s+'),
                                x -> list_contains(['the','a','and','of','to','is','in','it','that','for'], x)))
                            AS DOUBLE) / len(tk.t)
                   ELSE 0.0 END AS stop_ratio,
                   CASE WHEN length(d.text) > 0 THEN
                       CAST(length(regexp_replace(d.text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS DOUBLE)
                       / length(d.text)
                   ELSE 0.0 END AS p_ratio
            FROM documents d JOIN toks tk ON d.doc_id = tk.doc_id),
        quality AS (
            SELECT doc_id,
                   ROUND(0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0
                                     WHEN n_tok > 0 THEN 0.5 ELSE 0.0 END)
                         + 0.3 * least(stop_ratio * 5.0, 1.0)
                         + 0.3 * (1.0 - least(p_ratio * 5.0, 1.0)), 6) AS quality
            FROM q),
        kept AS (SELECT doc_id, quality FROM quality WHERE quality >= 0.5),
        sh AS (SELECT DISTINCT d.doc_id,
                 unnest(list_transform(generate_series(1, len(t.t)-1), i -> t.t[i] || ' ' || t.t[i+1])) AS s
               FROM kept d JOIN toks t USING (doc_id) WHERE len(t.t) >= 2),
        rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 20),
        shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
        szs AS (SELECT doc_id, COUNT(*) AS sz FROM shr GROUP BY doc_id),
        cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
                 FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
        edges0 AS (SELECT id_a, id_b FROM cand
                   JOIN szs sa ON id_a = sa.doc_id
                   JOIN szs sb ON id_b = sb.doc_id
                   WHERE ROUND(common * 1.0 / (sa.sz + sb.sz - common), 6) >= 0.5),
        edges AS (SELECT id_a AS a, id_b AS b FROM edges0
                  UNION SELECT id_b, id_a FROM edges0),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM kept
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        clusters AS (SELECT src AS doc_id, MIN(dst) AS cluster
                     FROM reach GROUP BY src),
        ranked AS (
            SELECT c.cluster, c.doc_id, k.quality,
                   ROW_NUMBER() OVER (PARTITION BY c.cluster
                                      ORDER BY k.quality DESC, c.doc_id) AS rn
            FROM clusters c JOIN kept k USING (doc_id))
        SELECT cluster, doc_id AS rep_doc_id, quality,
               CASE WHEN substring(md5(CAST(cluster AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                    WHEN substring(md5(CAST(cluster AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM ranked WHERE rn = 1
        ORDER BY cluster
    """,
    covers="end-to-end corpus curation: quality gate -> near-dup clusters -> best representative -> leak-free split, composed under one oracle",
    tags=("curation", "dedup", "training"),
    min_rows=200,
)
def x90(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from skoltexter_by_ai_spark.operators import dedup, text_analysis

    docs = load_table(spark, sf_dir, "documents")
    quality = docs.select(
        "doc_id", "text", text_analysis.quality_score("text").alias("quality")
    )
    # The gated frame feeds three consumers (shingle pairs, cluster
    # seed, representative join); a lazy local checkpoint computes
    # the tokenize-heavy quality scan once instead of three times
    # while keeping the builder a pure plan until executed.
    kept = quality.filter(F.col("quality") >= 0.5).localCheckpoint(eager=False)
    pairs = dedup.ngram_jaccard_pairs(kept, "doc_id", "text", n=2, max_df=20).filter(
        F.round("jaccard", 6) >= 0.5
    )
    clusters = dedup.dedup_clusters(kept.select("doc_id"), pairs, id_col="doc_id")
    w = Window.partitionBy("cluster").orderBy(F.col("quality").desc(), "doc_id")
    reps = (
        clusters.join(kept.select("doc_id", "quality"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return reps.select(
        "cluster",
        F.col("doc_id").alias("rep_doc_id"),
        "quality",
        text_analysis.hash_split("cluster").alias("split"),
    ).orderBy("cluster")


@register(
    "x93_source_cap",
    # Per-source document cap (the C4/RefinedWeb "cap per domain"
    # step): at most 10 docs per source, selected by the smallest
    # deterministic md5 draws so the kept set is an unbiased sample of
    # each over-cap source and identical in both engines. n_chars
    # rides along to prove the cap projects payload columns through.
    oracle="""
        SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 8),
                                doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 10
        ORDER BY doc_id
    """,
    covers="per-source/domain cap sampling (corpus curation; caps mega-domains)",
    tags=("training", "curation"),
    min_rows=150,
)
def x93(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.curation import group_cap

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return group_cap(docs, "source", "doc_id", cap=10).orderBy("doc_id")


@register(
    "x100_temperature_mix",
    # Temperature-based source rebalancing (XLM-R/mT5 mixing rule):
    # keep each row of source s with probability (n_s/n_min)^(a-1),
    # a=0.5 — flattens size skew toward uniform. The keep rate is
    # rounded to 6 in BOTH engines so a libm pow ulp cannot flip a
    # boundary draw; the draw itself is the exact md5/2^32 grid.
    oracle="""
        WITH c AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
            FROM documents GROUP BY 1
        ),
        m AS (SELECT MIN(n_source) AS nmin FROM c),
        r AS (
            SELECT source, n_source,
                   ROUND(POW(CAST(n_source AS DOUBLE) / nmin, -0.5), 6) AS keep_rate
            FROM c CROSS JOIN m
        )
        SELECT doc_id, d.source, n_source, keep_rate
        FROM documents d JOIN r USING (source)
        WHERE CAST('0x' || substr(md5(d.source || ':' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              / 4294967296.0 < keep_rate
        ORDER BY doc_id
    """,
    covers="temperature-based source rebalancing (multilingual/multi-source mixing rule)",
    tags=("training", "curation"),
    min_rows=100,
)
def x100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.curation import temperature_resample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_resample(docs, "source", "doc_id", alpha=0.5).select(
        "doc_id", "source", "n_source", "keep_rate"
    ).orderBy("doc_id")


@register(
    "x101_boilerplate_share",
    # Intra-corpus boilerplate scoring: fraction of each document's
    # distinct 3-gram shingles that appear in >= 2 documents (itself
    # included). Shingle df is a plain count(*) because shingles are
    # distinct within a document. Sub-3-token documents keep share 0.
    oracle=f"""
        WITH s AS (
            SELECT doc_id, {_duck_shingles(3).replace("toks", _TOKS)} AS shs
            FROM documents
        ),
        occ AS (SELECT doc_id, unnest(shs) AS sh FROM s),
        cnt AS (SELECT sh, COUNT(*) AS df FROM occ GROUP BY 1),
        agg AS (
            SELECT doc_id, COUNT(*) AS n,
                   SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS nb
            FROM occ JOIN cnt USING (sh) GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_shingles,
               ROUND(COALESCE(nb * 1.0 / n, 0.0), 6) AS boilerplate_share
        FROM documents d LEFT JOIN agg USING (doc_id)
        ORDER BY doc_id
    """,
    covers="intra-corpus boilerplate share: per-doc fraction of corpus-repeated n-grams",
    tags=("training", "curation", "text"),
    min_rows=400,
)
def x101(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import boilerplate_share

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_share(docs, "doc_id", "text", n=3, min_df=2).orderBy("doc_id")


@register(
    "x102_source_overlap",
    # Corpus-mix audit: pairwise distinct-bigram Jaccard between
    # ingest sources. Pair order is lexicographic (source_a < source_b
    # — ASCII source names, so binary and NOCASE collations agree).
    oracle=f"""
        WITH s AS (
            SELECT source, {_duck_shingles(2).replace("toks", _TOKS)} AS shs
            FROM documents
        ),
        d AS (SELECT DISTINCT source, unnest(shs) AS sh FROM s),
        sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
        inter AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM d a JOIN d b USING (sh)
            WHERE a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, n_common,
               sa.n AS n_a, sb.n AS n_b,
               ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
        FROM inter
        JOIN sz sa ON sa.source = source_a
        JOIN sz sb ON sb.source = source_b
        ORDER BY source_a, source_b
    """,
    covers="source-pair shingle Jaccard matrix (corpus-mix overlap audit)",
    tags=("training", "curation", "text"),
    min_rows=3,
)
def x102(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import source_shingle_overlap

    docs = load_table(spark, sf_dir, "documents")
    # source-pair-bounded output
    return bounded_sort(
        source_shingle_overlap(docs, "source", "text", n=2), "source_a", "source_b"
    )


@register(
    "x103_source_divergence",
    # Data-mixing audit: per-source unigram entropy + KL divergence
    # from the corpus distribution. Empty tokens are filtered in the
    # oracle because string_split_regex('') yields [''] where the
    # engine's tokens() yields []. Both engines round the float sums
    # to 6 places (same guard as x99's mean log-prob).
    oracle=f"""
        WITH t AS (
            SELECT source, unnest({_TOKS}) AS tok FROM documents
        ),
        c AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM t WHERE tok <> '' GROUP BY 1, 2
        ),
        g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens FROM c GROUP BY 1),
        v AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM c GROUP BY 1),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM c)
        SELECT c.source, g.n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               ROUND(-SUM((c * 1.0 / n_tokens) * ln(c * 1.0 / n_tokens)), 6) + 0.0 AS entropy,
               ROUND(SUM((c * 1.0 / n_tokens)
                         * ln((c * 1.0 / n_tokens) / (ct * 1.0 / nn))), 6) + 0.0 AS kl_corpus
        FROM c JOIN g USING (source) JOIN v USING (tok) CROSS JOIN n
        GROUP BY c.source, g.n_tokens
        ORDER BY source
    """,
    covers="per-source unigram entropy + KL-from-corpus (data-mixing diagnostics)",
    tags=("training", "curation", "text"),
    min_rows=10,
)
def x103(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import source_token_divergence

    docs = load_table(spark, sf_dir, "documents")
    # source-bounded output
    return bounded_sort(source_token_divergence(docs, "source", "text"), "source")


@register(
    "x106_curation_funnel",
    # Pipeline-owner report: cumulative gate survival per source —
    # length band, metadata language match, quality heuristic — plus
    # the token yield. ONE scan with conditional aggregation; the only
    # shuffle is |sources|-sized. The quality formula is x08's (already
    # value-proven against this oracle); both engines round the final
    # rate to 6.
    oracle=f"""
        WITH t AS (
            SELECT source,
                   lang,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tok,
                   CASE WHEN len({_TOKS}) > 0 THEN
                       CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                x -> list_contains(['the','a','and','of','to','is','in','it','that','for'], x)))
                            AS DOUBLE) / len({_TOKS})
                   ELSE 0.0 END AS stop_ratio,
                   CASE WHEN length(text) > 0 THEN
                       CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS DOUBLE)
                       / length(text)
                   ELSE 0.0 END AS p_ratio
            FROM documents),
        g AS (
            SELECT source, n_tok,
                   (n_tok >= 10 AND n_tok <= 10000) AS len_ok,
                   (n_tok >= 10 AND n_tok <= 10000 AND lang = 'en') AS lang_ok,
                   (n_tok >= 10 AND n_tok <= 10000 AND lang = 'en'
                    AND ROUND(0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0
                                          WHEN n_tok > 0 THEN 0.5 ELSE 0.0 END)
                              + 0.3 * least(stop_ratio * 5.0, 1.0)
                              + 0.3 * (1.0 - least(p_ratio * 5.0, 1.0)), 6) >= 0.5) AS q_ok
            FROM t)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
               CAST(SUM(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
               CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_in,
               CAST(SUM(CASE WHEN q_ok THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept,
               ROUND(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS keep_rate
        FROM g
        GROUP BY source
        ORDER BY source
    """,
    covers="per-source curation-funnel survival + token yield (one-scan conditional agg)",
    tags=("training", "curation", "text"),
    min_rows=10,
)
def x106(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import curation_funnel

    docs = load_table(spark, sf_dir, "documents")
    # source-bounded output
    return bounded_sort(curation_funnel(docs, "source", "text", lang_col="lang"), "source")


@register(
    "x107_epoch_shard_balance",
    # Reproducible-training primitive: deterministic epoch shuffling
    # (md5(epoch:id) draw) + shard assignment, reported as the
    # per-shard doc/token balance a pipeline owner checks before a
    # run. The assignment itself is a narrow projection; only the
    # |shards|-sized report aggregates.
    oracle=f"""
        WITH a AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       % 8 AS shard,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tok
            FROM documents)
        SELECT shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM a
        GROUP BY shard
        ORDER BY shard
    """,
    covers="deterministic epoch shuffle + shard assignment, per-shard balance report",
    tags=("training", "curation"),
    min_rows=8,
)
def x107(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import epoch_shards
    from skoltexter_by_ai_spark.operators.text_analysis import token_count

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        epoch_shards(docs, "doc_id", n_shards=8, epoch=1)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("text")).alias("n_tokens"),
        )
        # shard-count-bounded output
        .transform(lambda d: bounded_sort(d, "shard"))
    )


@register(
    "x108_bpe_merge_table",
    # Distributed BPE tokenizer training (merge learning). Iterative
    # with driver-bounded state (one (pair, count) row per round), so
    # it is NOT SQL-expressible as one query — rows-only here; the
    # REAL verification is tests/test_text_functions.py, which proves
    # the learned merge sequence equals a pure-Python classic-BPE
    # reference EXACTLY (tie-breaks included) on both a hand corpus
    # and the sf0.001 fixture.
    oracle=None,
    covers="distributed BPE merge learning over the word-frequency table",
    tags=("training", "text", "tokenizer"),
    min_rows=6,
)
def x108(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, "text", 6)
    rows = [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)]
    # merge-table-bounded (driver-local rows). ONE slice explicitly:
    # a bare createDataFrame parallelizes the pickled rows across
    # defaultParallelism Python slices, and the coalesce(1) inside
    # bounded_sort then pays one SEQUENTIAL Python-worker round per
    # parent slice inside the single task (~5 s for 6 rows at 32
    # cores, measured r11); one slice makes it one round.
    return bounded_sort(
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            "rank int, left string, right string, pair_count bigint",
        ),
        "rank",
    )


@register(
    "x115_intra_doc_repetition",
    # Gopher-style within-document repetition gate: the duplicate
    # 2-gram fraction of each document — positional (non-distinct)
    # bigrams, so a doc repeating itself scores high even when no
    # other doc shares the text. Purely in-row on both engines.
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || ' ' || toks[i+1]) AS gs
            FROM t
        )
        SELECT doc_id,
               CAST(len(gs) AS BIGINT) AS n_ngrams,
               CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
               ROUND(CASE WHEN len(gs) > 0
                          THEN CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE)
                               / len(gs)
                          ELSE 0.0 END, 6) AS dup_share
        FROM g
        ORDER BY doc_id
    """,
    covers="intra-document repetition gate: per-doc duplicate n-gram fraction (Gopher rule), zero-shuffle in-row computation",
    tags=("text", "quality", "curation"),
    min_rows=400,
)
def x115(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import intra_doc_repetition

    docs = load_table(spark, sf_dir, "documents")
    return intra_doc_repetition(docs, "doc_id", "text", n=2).orderBy("doc_id")


@register(
    "x116_entropy_signals",
    # Compressibility-style quality gate (CCNet/RefinedWeb family):
    # per-document Shannon entropy over characters AND tokens, in
    # nats. Low char entropy = templated boilerplate; high char with
    # low token entropy = encoded blobs. Terms sum in SORTED
    # distinct order on BOTH engines (run-length fold / list_sort) so
    # the float accumulation order is deterministic. Purely in-row on both
    # engines; the `+ 0.0` neutralizes the IEEE -0.0 a single-element
    # distribution produces (ROUND keeps the sign bit otherwise and
    # the engines would hash-differ on 0.0 vs -0.0).
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ''), c -> c != '') AS chars,
                   {_TOKS} AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(chars) AS BIGINT) AS n_chars,
               ROUND(CASE WHEN len(chars) > 0 THEN
                   -list_sum(list_transform(list_sort(list_distinct(chars)),
                       d -> (CAST(len(list_filter(chars, c -> c = d)) AS DOUBLE) / len(chars))
                            * LN(CAST(len(list_filter(chars, c -> c = d)) AS DOUBLE) / len(chars))))
                   + 0.0
               ELSE 0.0 END, 6) AS char_entropy,
               ROUND(CASE WHEN len(toks) > 0 THEN
                   -list_sum(list_transform(list_sort(list_distinct(toks)),
                       d -> (CAST(len(list_filter(toks, x -> x = d)) AS DOUBLE) / len(toks))
                            * LN(CAST(len(list_filter(toks, x -> x = d)) AS DOUBLE) / len(toks))))
                   + 0.0
               ELSE 0.0 END, 6) AS token_entropy
        FROM t
        ORDER BY doc_id
    """,
    covers="entropy quality gate: per-doc char/token Shannon entropy (compressibility signal), zero-shuffle in-row",
    tags=("text", "quality", "curation"),
    min_rows=400,
)
def x116(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import entropy_signals

    docs = load_table(spark, sf_dir, "documents")
    return entropy_signals(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "x110_duplicate_spans",
    # Span-level dedup signal: fraction of each document's token
    # POSITIONS whose 5-gram occurs in >= 2 distinct documents —
    # positional (non-distinct) shingles, cross-document frequency by
    # DISTINCT doc so self-repetition never promotes a span.
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, greatest(len(toks) - 4, 0)),
                       i -> array_to_string(toks[i:i+4], ' ')) AS shs
            FROM t
        ),
        pos AS (SELECT doc_id, unnest(shs) AS sh FROM s),
        hot AS (
            SELECT sh FROM (
                SELECT sh, COUNT(DISTINCT doc_id) AS nd FROM pos GROUP BY 1
            ) WHERE nd >= 2
        ),
        dup AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ndup
            FROM pos JOIN hot USING (sh) GROUP BY 1
        )
        SELECT s.doc_id,
               CAST(len(shs) AS BIGINT) AS n_spans,
               CAST(COALESCE(ndup, 0) AS BIGINT) AS n_dup_spans,
               ROUND(CASE WHEN len(shs) > 0
                          THEN COALESCE(ndup, 0) * CAST(1.0 AS DOUBLE) / len(shs)
                          ELSE 0.0 END, 6) AS dup_share
        FROM s LEFT JOIN dup USING (doc_id)
        ORDER BY doc_id
    """,
    covers="duplicated-span share: positional n-gram cross-document repetition (span-level dedup signal)",
    tags=("training", "curation", "dedup", "text"),
    min_rows=400,
)
def x110(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", n=5, min_docs=2).orderBy(
        "doc_id"
    )


# Exact-binary weights: every tf*w product and their per-document sum
# are exact in IEEE double regardless of aggregation order, so the
# score is bit-identical across engines and partitionings.
_X111_WEIGHTS = {
    "spark": 2.0,
    "fast": 1.0,
    "window": 1.5,
    "slow": -2.0,
    "batch": -0.5,
    "the": -1.0,
}


@register(
    "x111_vocab_classifier",
    # fastText-shaped linear quality classifier: per-document
    # score = (sum tf(t)*w(t)) / n_tokens over a fixed weight
    # vocabulary, prob = sigmoid(score), label = prob >= 0.5.
    # Weights are exact binary fractions (see _X111_WEIGHTS) so the
    # float pipeline is deterministic before the final round.
    oracle=f"""
        WITH w(term, w) AS (VALUES
            ('spark', CAST(2.0 AS DOUBLE)), ('fast', CAST(1.0 AS DOUBLE)),
            ('window', CAST(1.5 AS DOUBLE)), ('slow', CAST(-2.0 AS DOUBLE)),
            ('batch', CAST(-0.5 AS DOUBLE)), ('the', CAST(-1.0 AS DOUBLE))
        ),
        d AS (
            SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM d)
            WHERE term IN ('spark', 'fast', 'window', 'slow', 'batch', 'the')
            GROUP BY 1, 2
        ),
        raw AS (
            SELECT doc_id, SUM(tf * w) AS raw
            FROM tf JOIN w USING (term) GROUP BY 1
        ),
        scored AS (
            SELECT d.doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(0.0 AS DOUBLE) + CASE WHEN len(toks) > 0
                        THEN COALESCE(raw, 0.0) / len(toks)
                        ELSE 0.0 END AS s
            FROM d LEFT JOIN raw USING (doc_id)
        )
        SELECT doc_id, n_tokens,
               ROUND(s, 6) + 0.0 AS score,
               ROUND(CAST(1.0 AS DOUBLE) / (1.0 + EXP(-s)), 6) AS prob,
               CAST(CASE WHEN CAST(1.0 AS DOUBLE) / (1.0 + EXP(-s)) >= 0.5
                         THEN 1 ELSE 0 END AS INT) AS label
        FROM scored
        ORDER BY doc_id
    """,
    covers="linear bag-of-words quality classifier over a fixed weight vocabulary (fastText-shaped filter)",
    tags=("training", "curation", "text"),
    min_rows=400,
)
def x111(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import (
        vocab_weight_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    return vocab_weight_classifier(
        docs, "doc_id", "text", _X111_WEIGHTS, bias=0.0
    ).orderBy("doc_id")


@register(
    "x112_column_profile",
    # One-scan dataset profile over a mixed-type column list: row
    # count, NULL count, exact distinct count per column (NULLs
    # excluded from distinct, SQL semantics both engines).
    oracle="""
        SELECT * FROM (
            SELECT 'l_quantity' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct
            FROM lineitem
            UNION ALL
            SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
                   CAST(COUNT(DISTINCT l_returnflag) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
                   CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'l_shipdate', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
                   CAST(COUNT(DISTINCT l_shipdate) AS BIGINT)
            FROM lineitem
        )
        ORDER BY col_name
    """,
    covers="one-scan per-column dataset profile: rows / NULLs / exact distincts (data-quality snapshot)",
    tags=("curation", "quality"),
    min_rows=4,
)
def x112(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.curation import column_profile

    li = load_table(spark, sf_dir, "lineitem")
    return column_profile(
        li, ["l_quantity", "l_returnflag", "l_extendedprice", "l_shipdate"]
    ).orderBy("col_name")


@register(
    "x118_decontaminate",
    # Benchmark decontamination as a FILTER (x62 is the scan): drop
    # every train doc sharing >= 50% of some eval doc's distinct
    # 3-grams (self-pairs excluded — the eval set is carved out of the
    # corpus here, doc_id % 20 = 0). Same overlap arithmetic as x62's
    # proven oracle; the survivors keep their original columns.
    oracle=f"""
        WITH tr AS (
            SELECT doc_id, {_duck_shingles(3).replace("toks", _TOKS)} AS shs
            FROM documents
        ),
        trs AS (SELECT doc_id AS train_id, unnest(shs) AS sh FROM tr),
        evt AS (SELECT doc_id AS eval_id, CAST(len(shs) AS BIGINT) AS eval_ngrams
                FROM tr WHERE doc_id % 20 = 0 AND doc_id < 500 AND len(shs) > 0),
        evs AS (SELECT doc_id AS eval_id, unnest(shs) AS sh
                FROM tr WHERE doc_id % 20 = 0 AND doc_id < 500),
        shared AS (
            SELECT train_id, eval_id, COUNT(*) AS shared_ngrams
            FROM trs JOIN evs USING (sh)
            GROUP BY 1, 2
        ),
        bad AS (
            SELECT DISTINCT train_id
            FROM shared JOIN evt USING (eval_id)
            WHERE train_id != eval_id
              AND ROUND(shared_ngrams * 1.0 / eval_ngrams, 6) >= 0.5
        )
        SELECT doc_id, source, n_chars
        FROM documents
        WHERE doc_id NOT IN (SELECT train_id FROM bad)
        ORDER BY doc_id
    """,
    covers="benchmark decontamination filter: drop train docs leaking into the eval set (removal half of x62)",
    tags=("training", "curation", "text"),
    min_rows=400,
)
def x118(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    # Fixed-size benchmark window (same contract as x62): the eval
    # side must not grow with the corpus, or the shared-shingle join
    # becomes quadratic in scale factor (measured 13x for 10x data
    # before the bound; linear after).
    evals = docs.filter((F.col("doc_id") % 20 == 0) & (F.col("doc_id") < 500))
    return (
        decontaminate(docs, evals, n=3, min_overlap=0.5)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "x120_ngram_novelty",
    # Per-document novelty: share of the doc's distinct 3-grams whose
    # first corpus occurrence (min doc_id) is this doc — "how much new
    # text does this doc add", the set-level inverse of x101's
    # boilerplate share. Every shingle credits exactly one document.
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_duck_shingles(3).replace("toks", _TOKS)} AS shs
            FROM documents
        ),
        s AS (SELECT doc_id, unnest(shs) AS sh FROM t),
        m AS (SELECT sh, MIN(doc_id) AS first_id FROM s GROUP BY sh),
        nv AS (SELECT first_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
               FROM m GROUP BY 1)
        SELECT t.doc_id,
               CAST(len(shs) AS BIGINT) AS n_shingles,
               CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
               ROUND(CASE WHEN len(shs) > 0
                     THEN CAST(COALESCE(n_novel, 0) AS DOUBLE) / len(shs)
                     ELSE 0.0 END, 6) AS novel_share
        FROM t LEFT JOIN nv USING (doc_id)
        ORDER BY doc_id
    """,
    covers="n-gram novelty share: fraction of a doc's distinct shingles first seen in it (fresh-content signal)",
    tags=("text", "curation"),
    min_rows=400,
)
def x120(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(docs, "doc_id", "text", n=3).orderBy("doc_id")


@register(
    "x121_span_removal",
    # Cross-document exact-span REMOVAL (x110 is the diagnostic):
    # delete every token sitting inside a 5-gram that occurs in >= 2
    # distinct documents, rebuild the text in original order (Lee et
    # al. 2022 span dedup, fixed-width form). DuckDB mirrors the
    # positional arithmetic 1-based; positions never leave either
    # engine, only (n_tokens, n_removed, clean_text) compare.
    oracle=f"""
        WITH t AS (
            SELECT doc_id, list_filter({_TOKS}, x -> x != '') AS toks
            FROM documents
        ),
        sp AS (
            SELECT doc_id, i AS p, array_to_string(toks[i:i+4], ' ') AS sh
            FROM t, unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS u(i)
        ),
        dup AS (SELECT sh FROM sp GROUP BY sh HAVING MIN(doc_id) != MAX(doc_id)),
        rm AS (
            SELECT DISTINCT doc_id, p + off AS rp
            FROM sp JOIN dup USING (sh),
                 unnest(generate_series(0, 4)) AS o(off)
        ),
        rml AS (SELECT doc_id, list(rp) AS rl FROM rm GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(COALESCE(len(rl), 0) AS BIGINT) AS n_removed,
               COALESCE(array_to_string(
                   list_filter(toks, (x, i) -> NOT list_contains(COALESCE(rl, []), i)),
                   ' '), '') AS clean_text
        FROM t LEFT JOIN rml USING (doc_id)
        ORDER BY doc_id
    """,
    covers="cross-document duplicated-span removal: rebuild text without tokens inside shared 5-grams (transform half of x110)",
    tags=("text", "curation", "dedup"),
    min_rows=400,
)
def x121(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import (
        remove_duplicate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, "doc_id", "text", n=5, min_docs=2).orderBy(
        "doc_id"
    )


@register(
    "x123_scrub_pii",
    # PII redaction gate. The fixture corpus is PII-free word salad,
    # so the query INJECTS deterministic PII derived from doc_id on
    # BOTH engines (an email, an international phone, an IPv4 per
    # doc) and then scrubs it — the counts and the rebuilt clean_text
    # are therefore non-trivially hash-checked, not a vacuous no-op
    # pass. Patterns are ASCII-only constructs with identical
    # semantics in Java regex and RE2; DuckDB's regexp_replace needs
    # the explicit 'g' flag to match Spark's replace-all default.
    oracle=r"""
        WITH inj AS (
            SELECT doc_id,
                   COALESCE(text, '') || ' contact user'
                   || CAST(doc_id AS VARCHAR) || '@example.com or +1415555'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || ' from ' || CAST(doc_id % 256 AS VARCHAR) || '.0.0.1' AS text
            FROM documents
        ),
        s1 AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
            FROM inj
        ),
        s2 AS (
            SELECT doc_id, n_email,
                   CAST(len(regexp_extract_all(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
                   regexp_replace(t,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
            FROM s1
        ),
        s3 AS (
            SELECT doc_id, n_email, n_ipv4,
                   CAST(len(regexp_extract_all(t, '\+\d{7,15}')) AS BIGINT) AS n_phone,
                   regexp_replace(t, '\+\d{7,15}', '<PHONE>', 'g') AS t
            FROM s2
        )
        SELECT doc_id, t AS clean_text, n_email, n_ipv4, n_phone,
               n_email + n_ipv4 + n_phone AS n_redactions
        FROM s3
        ORDER BY doc_id
    """,
    covers="PII scrubbing: sequential regex redaction (email/IPv4/phone) with per-kind counts, zero-shuffle in-row",
    tags=("text", "curation"),
    min_rows=400,
)
def x123(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from skoltexter_by_ai_spark.operators.curation import scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1415555"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from "),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.0.1"),
        ).alias("text"),
    )
    return scrub_pii(injected, "doc_id", "text").orderBy("doc_id")
