"""Analytics-completeness declared queries, round 2 of the OLAP
surface: wide-to-long melt (the Spark treatment SURVEY.md §1.2
prescribes for the reference's year-suffixed wide columns),
statistical aggregates, argmin/argmax, fuzzy string matching,
higher-order array functions over the embeddings table, and GROUPING
SETS.

Cross-engine gotchas handled here: DuckDB ``arg_max`` has no
struct-valued ordering key, so deterministic tie-breaks use a
collision-free BIGINT composite; float aggregates are rounded, and
money sums run as exact scaled-integer (cents) LONG arithmetic with a
single double division at the output boundary, so the value hash is
bit-stable; higher-order sums cast elements to DOUBLE *before*
folding so both engines accumulate in the same precision and order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skoltexter_by_ai_spark.plans.ordering import bounded_sort
from skoltexter_by_ai_spark.plans.registry import register
from skoltexter_by_ai_spark.sources.tables import load_table

_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "x35_unpivot_melt",
    # Wide -> long melt of the lineitem measure columns. This is the
    # exact shape SURVEY.md §1.2 calls for on the reference's
    # year-suffixed wide columns (`stack()`/melt to long form); the
    # oracle spells it as the equivalent UNION ALL.
    oracle="""
        SELECT l_orderkey, l_linenumber, measure, value FROM (
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                   CAST(l_quantity AS DOUBLE) AS value FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   CAST(l_extendedprice AS DOUBLE) FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount',
                   CAST(l_discount AS DOUBLE) FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax',
                   CAST(l_tax AS DOUBLE) FROM lineitem
        )
        WHERE l_orderkey <= 5000
        ORDER BY l_orderkey, l_linenumber, measure, value
    """,
    covers="wide->long melt / unpivot (SURVEY §1.2 wide year columns)",
    tags=("analytics",),
)
def x35(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 5000)
    wide = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        *[F.col(m).cast("double").alias(m) for m in _MEASURES],
    )
    # `value` joins the sort key because (l_orderkey, l_linenumber) is
    # not unique on the fixture — duplicate pairs emit the same measure
    # name with different values, so the full row is the total order.
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"], list(_MEASURES), "measure", "value"
    ).orderBy("l_orderkey", "l_linenumber", "measure", "value")


@register(
    "x36_stats_aggregates",
    # Pearson correlation, sample stddev/variance and sample
    # covariance per group. Both engines compute in DOUBLE; rounding
    # to 4 places then casting to DECIMAL absorbs summation-order
    # noise while still failing on any real numeric bug.
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               ROUND(CORR(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
               ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_stddev,
               ROUND(VAR_SAMP(l_discount), 4) AS disc_var,
               ROUND(COVAR_SAMP(l_quantity, l_discount), 4) + 0.0 AS qty_disc_covar
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    covers="statistical aggregates: corr / stddev_samp / var_samp / covar_samp",
    tags=("analytics",),
)
def x36(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias("qty_price_corr"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
            F.round(F.var_samp("l_discount"), 4).alias("disc_var"),
            (F.round(F.covar_samp("l_quantity", "l_discount"), 4) + F.lit(0.0)).alias("qty_disc_covar"),
        )
        # flag-bounded output
        .transform(lambda d: bounded_sort(d, "l_returnflag"))
    )


# Collision-free BIGINT ordering key: cents * 1e10 + orderkey. Cents
# stay < ~5.6e7 at any tested SF and orderkey < 1e10, so the composite
# fits a BIGINT and orders exactly by (price, orderkey) — making
# arg_max/arg_min deterministic even when two orders share a price.
_ORD = "CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey"


@register(
    "x37_arg_extremes",
    oracle=f"""
        SELECT o_orderstatus,
               arg_max(o_orderkey, {_ORD}) AS priciest_order,
               arg_min(o_orderkey, {_ORD}) AS cheapest_order,
               arg_max(o_custkey, o_orderkey) AS latest_cust
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    covers="argmin/argmax aggregates (max_by / min_by) with deterministic tie-break",
    tags=("analytics",),
)
def x37(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ord_key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10000000000).cast("long")
        + F.col("o_orderkey")
    )
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", ord_key).alias("priciest_order"),
            F.min_by("o_orderkey", ord_key).alias("cheapest_order"),
            F.max_by("o_custkey", "o_orderkey").alias("latest_cust"),
        )
        # status-bounded output
        .transform(lambda d: bounded_sort(d, "o_orderstatus"))
    )


@register(
    "x38_fuzzy_name_pairs",
    # Fuzzy matching inside a blocking key: the grouped self-join keeps
    # the comparison count at sum(group^2) instead of n^2 — at 100 TB
    # the blocking column is the thing to get right, not the distance
    # function. levenshtein has identical semantics in both engines.
    oracle="""
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM part a
        JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 3
        ORDER BY key_a, key_b
    """,
    covers="fuzzy string matching (levenshtein) with brand blocking",
    tags=("analytics",),
)
def x38(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # Distance work collapses to DISTINCT (brand, name) pairs: the
    # levenshtein between two names does not depend on which rows
    # carry them, so compute it once per distinct pair and fan the
    # result back out to part keys with two equi-joins. Comparison
    # count becomes sum_brand(distinct_names^2) — independent of how
    # many ROWS each brand has, which is exactly what a Zipf-hot
    # blocking key breaks in the naive sum(block^2) form (the r8
    # salted block-join did bounded-memory block^2; this does not do
    # block^2 at all). Floor: with near-unique names the distinct
    # frame IS the table and the plan degrades to the classic grouped
    # quadratic — the declared contract — at the cost of one extra
    # hash-aggregate shuffle. The OUTPUT (key pairs at distance <= 3)
    # is still quadratic in duplicated names by definition; that part
    # is the answer, not overhead.
    # NOT pinned (r11): a localCheckpoint here would hide the distinct
    # aggregate behind a Scan ExistingRDD and blind the plan-quality
    # guard that pins "distance runs on the DISTINCT frame"
    # (tests/test_plan_quality.py); the duplicated distinct tower is a
    # name-bounded aggregate, cheap relative to the guard's value.
    names = part.select("p_brand", "p_name").distinct()

    # Character-SET mask: one edit changes the set of distinct letters
    # by at most 2 (a substitution can retire one letter and introduce
    # another), so levenshtein(a, b) <= 3 implies
    # bit_count(mask_a XOR mask_b) <= 6 — a SOUND per-pair prefilter
    # costing one xor+bit_count against the banded levenshtein's
    # diagonal walk.
    def _charset_mask(col: str):
        chars = F.array_distinct(F.split(F.lower(F.col(col)), ""))
        return F.aggregate(
            F.filter(chars, lambda c: (c >= "a") & (c <= "z")),
            F.lit(0).cast("long"),
            lambda acc, c: acc.bitwiseOR(
                F.pow(F.lit(2.0), (F.ascii(c) - 97).cast("double")).cast("long")
            ),
        )

    a = names.select(
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
        F.length("p_name").alias("len_a"),
        _charset_mask("p_name").alias("mask_a"),
    )
    b = names.select(
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_b"),
        F.length("p_name").alias("len_b"),
        _charset_mask("p_name").alias("mask_b"),
    )
    # FULL cross within the brand (both orders AND the name==name
    # diagonal): key pairs are ordered by p_partkey, not by name, so
    # the fan-out join below needs (nA, nB), (nB, nA) and (n, n) all
    # present. The banded levenshtein(a, b, 3) walks a 7-wide diagonal
    # and returns -1 past the threshold instead of filling O(m*n).
    # Deliberately NOT halved to name_a <= name_b + a swapped union:
    # without a materialization barrier both union branches recompute
    # the half-frame, so the distance count stays D^2 anyway — and on
    # the distinct-name frame D^2 is thousands of microsecond-scale
    # calls, not the cost center (the key fan-out is).
    cand = (
        a.join(b, "brand")
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= 3)
        .filter(F.bit_count(F.col("mask_a").bitwiseXOR(F.col("mask_b"))) <= 6)
        .select(
            "brand",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b", 3).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )
    pa = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
        F.col("p_partkey").alias("key_a"),
    )
    pb = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_b"),
        F.col("p_partkey").alias("key_b"),
    )
    # Explicit repartition before the expanding join: the pair fan-out
    # happens AT the join, which AQE cannot see from shuffle-read
    # sizes — a coalesce-to-few-tasks decision would serialize the
    # output generation. User repartitions are exempt from AQE
    # coalescing (same reasoning the r8 salted form pinned).
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    mid = pa.join(cand, ["brand", "name_a"]).repartition(
        shuffle_n, "brand", "name_b"
    )
    return (
        mid.join(pb, ["brand", "name_b"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "dist")
        .orderBy("key_a", "key_b")
    )


@register(
    "x39_embedding_array_ops",
    # Higher-order array functions over the embeddings table: fold
    # (sum of squares -> L2 norm), filter (positive-component count),
    # and element max. Elements are cast to DOUBLE before the fold so
    # both engines accumulate left-to-right in DOUBLE.
    oracle="""
        SELECT vec_id,
               ROUND(SQRT(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
               ROUND(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0 AS max_comp
        FROM embeddings
        ORDER BY vec_id
    """,
    covers="higher-order array functions: aggregate/filter/array_max on embeddings",
    tags=("analytics",),
)
def x39(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_pos"),
        (F.round(F.array_max("embedding").cast("double"), 4) + F.lit(0.0)).alias("max_comp"),
    ).orderBy("vec_id")


@register(
    "x40_grouping_sets",
    # Arbitrary GROUPING SETS (not expressible as one rollup/cube):
    # per-flag totals, per-status totals, and the grand total, with a
    # GROUPING() id distinguishing real NULLs from subtotal rows.
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    covers="GROUPING SETS beyond rollup/cube + GROUPING() disambiguation",
    tags=("analytics",),
)
def x40(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("x40_lineitem")
    return lineitem.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
        FROM x40_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


_TOKS = "string_split_regex(trim(text), '\\s+')"


@register(
    "x41_sequence_packing",
    # Concatenate-and-chunk packing for LLM context windows: per
    # source shard, documents laid end to end in doc_id order and cut
    # every 512 tokens. The oracle is the same ordered running total.
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len({_TOKS}) AS BIGINT) AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM t
        )
        SELECT doc_id, source, n_tokens,
               CAST(FLOOR(cum_before / 512.0) AS BIGINT) AS chunk_id,
               CAST(cum_before % 512 AS BIGINT) AS chunk_offset
        FROM c
        ORDER BY doc_id
    """,
    covers="sequence packing: per-shard ordered running total -> context-window chunk assignment",
    tags=("analytics", "training"),
)
def x41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "doc_id", "text", context_len=512, shard_col="source"
    ).orderBy("doc_id")


@register(
    "x42_repetition_stats",
    # Gopher-style repetition filters: distinct-token ratio and the
    # share of the most frequent token, both as narrow higher-order
    # projections (no shuffle, no UDF).
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS distinct_ratio,
               ROUND(list_max(list_transform(list_distinct(toks),
                        d -> len(list_filter(toks, x -> x = d)))) * 1.0 / len(toks), 6) AS top_token_share
        FROM t
        WHERE len(toks) > 0
        ORDER BY doc_id
    """,
    covers="repetition filters: distinct-token ratio + top-token share (Gopher-style)",
    tags=("analytics", "training"),
)
def x42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.text_analysis import (
        distinct_token_ratio,
        token_count,
        top_token_share,
    )

    from skoltexter_by_ai_spark.operators.dedup import _spread

    # documents.parquet arrives as one split at test SFs; the
    # top-token-share fold is the CPU-heavy stage, so spread it across
    # cores first (no-op when the scan already has enough splits).
    docs = _spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.filter(token_count("text") > 0)
        .select(
            "doc_id",
            F.round(distinct_token_ratio("text"), 6).alias("distinct_ratio"),
            F.round(top_token_share("text"), 6).alias("top_token_share"),
        )
        .orderBy("doc_id")
    )


@register(
    "x43_merge_upsert",
    # CDC-style latest-wins merge: customer balances upserted with the
    # price of each customer's latest order (version = orderkey; base
    # rows carry version 0). The oracle is the same union + window.
    oracle="""
        WITH unioned AS (
            SELECT c_custkey AS key, CAST(c_acctbal AS DOUBLE) AS balance,
                   CAST(0 AS BIGINT) AS version, 0 AS src
            FROM customer
            UNION ALL
            SELECT o_custkey, CAST(o_totalprice AS DOUBLE), o_orderkey, 1
            FROM orders
        ), ranked AS (
            SELECT key, balance, version,
                   ROW_NUMBER() OVER (PARTITION BY key
                                      ORDER BY version DESC, src DESC) AS rn
            FROM unioned
        )
        SELECT key, balance, version FROM ranked WHERE rn = 1 ORDER BY key
    """,
    covers="keyed upsert / MERGE latest-wins (CDC merge as recomputed view)",
    tags=("analytics", "temporal"),
)
def x43(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.temporal import merge_upsert

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    base = customer.select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").cast("double").alias("balance"),
        F.lit(0).cast("bigint").alias("version"),
    )
    updates = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_totalprice").cast("double").alias("balance"),
        F.col("o_orderkey").alias("version"),
    )
    return merge_upsert(base, updates, ["key"], "version").orderBy("key")


@register(
    "x44_gap_fill_forward",
    # Sparse hourly per-user series regularized to a dense grid with
    # forward fill — resampling for feature/training pipelines. The
    # per-key grid is generated distributed (sequence + explode), so
    # no driver-side calendar materialization at scale.
    oracle="""
        WITH s AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS hourly_value
            FROM events WHERE user_id < 20
            GROUP BY 1, 2
        ), b AS (
            SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM s GROUP BY 1
        ), g AS (
            SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS h
            FROM b
        )
        SELECT g.user_id,
               epoch_ns(g.h) // 1000000000 AS hour_start,
               s.h IS NOT NULL AS observed,
               last_value(s.hourly_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM g LEFT JOIN s ON g.user_id = s.user_id AND g.h = s.h
        ORDER BY g.user_id, hour_start
    """,
    covers="time-series gap fill + forward fill (resampling to a dense grid)",
    tags=("analytics", "temporal"),
)
def x44(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.temporal import gap_fill_forward

    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("user_id") < 20)
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100)
            .alias("hourly_value")
        )
    )
    filled = gap_fill_forward(
        hourly, "user_id", "h", ["hourly_value"], step="1 hour"
    )
    return filled.select(
        "user_id",
        F.unix_timestamp("h").alias("hour_start"),
        F.col("__observed").alias("observed"),
        F.col("hourly_value").alias("filled_value"),
    ).orderBy("user_id", "hour_start")


@register(
    "x45_posexplode_tokens",
    # Lateral explode with ordinality: one output row per (doc, token
    # position). DuckDB zips parallel unnests; Spark uses posexplode.
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 50
        )
        SELECT doc_id,
               CAST(unnest(generate_series(1, len(toks))) - 1 AS INT) AS pos,
               unnest(toks) AS token
        FROM t
        ORDER BY doc_id, pos
    """,
    covers="lateral explode with ordinality (posexplode)",
    tags=("analytics", "text"),
)
def x45(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


@register(
    "x46_range_frame_window",
    # Time-based RANGE frame: per user, events and value inside the
    # trailing hour. RANGE (unlike ROWS) includes tied peers, so the
    # result is deterministic even with duplicate timestamps; both
    # engines order by epoch seconds with a numeric 3600 bound.
    oracle="""
        WITH e AS (
            SELECT event_id, user_id,
                   epoch_ns(ts) // 1000000000 AS sec,
                   CAST(ROUND(value * 100) AS BIGINT) AS v
            FROM events WHERE user_id < 20
        )
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
               CAST(SUM(v) OVER w AS DOUBLE) / 100 AS value_last_hour
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    covers="RANGE-frame sliding window (trailing-hour aggregates per key)",
    tags=("analytics", "temporal"),
)
def x46(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    e = events.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_last_hour"),
        (F.sum("v").over(w).cast("double") / 100).alias("value_last_hour"),
    ).orderBy("event_id")


@register(
    "x47_ranking_suite",
    # The ranking window functions x23 leaves out. Ordering includes
    # the unique key so ranks are deterministic under value ties.
    oracle="""
        SELECT s_suppkey,
               s_nationkey,
               CAST(DENSE_RANK() OVER w AS INT) AS drank,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS prank,
               ROUND(CUME_DIST() OVER w, 6) AS cdist
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        ORDER BY s_suppkey
    """,
    covers="ranking windows: dense_rank / ntile / percent_rank / cume_dist",
    tags=("analytics", "olap"),
)
def x47(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    ).orderBy("s_suppkey")


@register(
    "x48_string_suite",
    # The scalar string functions not already exercised by q04/q05/
    # q21/q22: translate, split_part, lpad/rpad, left/right, reverse,
    # repeat, strpos, replace. (initcap is absent from DuckDB, so it
    # stays unit-test-only.)
    oracle="""
        SELECT c_custkey,
               translate(c_name, 'Cust', 'Kund') AS t,
               split_part(c_name, '#', 2) AS num_part,
               lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS padded,
               left(c_mktsegment, 3) AS seg3,
               right(c_name, 4) AS name_tail,
               reverse(c_mktsegment) AS rev,
               repeat('*', CAST(c_nationkey % 4 AS INT)) AS stars,
               CAST(strpos(c_mktsegment, 'a') AS BIGINT) AS first_a,
               replace(c_name, '#', '.') AS dotted
        FROM customer
        ORDER BY c_custkey
    """,
    covers="scalar string suite: translate/split_part/pad/left/right/reverse/repeat/strpos/replace",
    tags=("analytics", "text"),
)
def x48(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.translate("c_name", "Cust", "Kund").alias("t"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("num_part"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("padded"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.substring(F.col("c_name"), -4, 4).alias("name_tail"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat(F.lit("*"), (F.col("c_nationkey") % 4).cast("int")).alias("stars"),
        F.locate("a", F.col("c_mktsegment")).cast("bigint").alias("first_a"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit(".")).alias("dotted"),
    ).orderBy("c_custkey")


# Decimal-exact revenue term: DECIMAL*(1-DECIMAL) multiplies exactly,
# so both engines sum identical values in any order.
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# Exact scaled-integer money terms: the fixture's 2-decimal money
# columns scale to integer cents/hundredths, so revenue sums run as
# PRIMITIVE LONG adds inside the aggregation hash map (no BigDecimal
# per row) — measured 2.3x faster than the decimal-sum form at sf0.1
# with bit-identical double output (the scaled sums are exact integers
# below 2^63; the final /10^k double division is correctly rounded
# identically in both engines).
_PRICE_CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_DISC_H = "CAST(ROUND(l_discount * 100) AS BIGINT)"
_TAX_H = "CAST(ROUND(l_tax * 100) AS BIGINT)"
_REV4 = f"{_PRICE_CENTS} * (100 - {_DISC_H})"


def _price_cents_col() -> F.Column:
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def _rev4_col() -> F.Column:
    return _price_cents_col() * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )


def _floor_div(num: F.Column, den: F.Column) -> F.Column:
    """Exact BIGINT floor division for non-negative operands."""
    return ((num - num % den) / den).cast("bigint")


def _bp_floor(num: F.Column, den: F.Column) -> F.Column:
    """floor(10000 * num / den) as exact basis points, with the
    numerator widened to decimal(38,0) BEFORE the 10000× scale-up:
    num is a SUM of ~1e9-per-row scaled revenues, so 10000 * num
    wraps int64 once the sum passes ~9.2e14 — silently, in non-ANSI
    Spark (ADVICE r2 on x85). DuckDB needs no widening: its
    SUM(BIGINT) already returns HUGEINT. The intermediate stays
    exact (decimal % and a remainder-subtracted division), so the
    final bigint cast loses nothing."""
    wide = num.cast("decimal(38,0)") * F.lit(10000)
    return ((wide - wide % den) / den).cast("bigint")


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


@register(
    "x49_pricing_summary",
    # TPC-H Q1 shape on the fixture schema: the canonical scan-heavy
    # multi-aggregate rollup. Partial aggregation collapses 60k rows
    # to 6 groups map-side; the exchange moves 6 rows per partition.
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
               CAST(SUM({_PRICE_CENTS}) AS DOUBLE) / 100 AS sum_base_price,
               CAST(SUM({_REV4}) AS DOUBLE) / 10000 AS sum_disc_price,
               CAST(SUM({_REV4} * (100 + {_TAX_H})) AS DOUBLE) / 1000000 AS sum_charge,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_qty_cents,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_disc_cents,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    covers="TPC-H Q1 pricing summary: multi-aggregate rollup with decimal-exact terms",
    tags=("analytics", "tpch"),
)
def x49(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
    )
    rev4 = _rev4_col()
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    tax_h = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_cents).cast("double") / 100).alias("sum_qty"),
            (F.sum(_price_cents_col()).cast("double") / 100).alias("sum_base_price"),
            (F.sum(rev4).cast("double") / 10000).alias("sum_disc_price"),
            (F.sum(rev4 * (F.lit(100) + tax_h)).cast("double") / 1000000)
            .alias("sum_charge"),
            # Floor-divided integer cents: exact and engine-neutral,
            # where decimal AVG would hit halfway-rounding drift.
            # (sum - sum % n) / n keeps every step in exact integer
            # arithmetic; a bare sum/n would round through a double.
            _floor_div(
                F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")), F.count("*")
            ).alias("avg_qty_cents"),
            _floor_div(
                F.sum(F.round(F.col("l_discount") * 100).cast("bigint")), F.count("*")
            ).alias("avg_disc_cents"),
            F.count("*").alias("count_order"),
        )
        # (flag x status)-bounded output
        .transform(lambda d: bounded_sort(d, "l_returnflag", "l_linestatus"))
    )


@register(
    "x50_shipping_priority",
    # TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    # revenue per order, top 10. The customer side broadcasts; the
    # orders⋈lineitem join shuffles on orderkey — the natural
    # co-partitioning key both tables should be bucketed on at scale.
    oracle=f"""
        SELECT l_orderkey,
               CAST(SUM({_REV4}) AS DOUBLE) / 10000 AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    covers="TPC-H Q3 shipping priority: selective 3-way join + top-k by aggregate",
    tags=("analytics", "tpch"),
)
def x50(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(_rev4_col()).cast("double") / 10000).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "x51_local_supplier_volume",
    # TPC-H Q5 shape: region → nation → supplier dimensions broadcast
    # down onto the lineitem ⋈ orders fact join; revenue rolled up per
    # nation.
    oracle=f"""
        SELECT n_name,
               CAST(SUM({_REV4}) AS DOUBLE) / 10000 AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN supplier ON s_nationkey = n_nationkey
        JOIN lineitem ON l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    covers="TPC-H Q5 local supplier volume: dimension-broadcast star join + rollup",
    tags=("analytics", "tpch"),
)
def x51(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg((F.sum(_rev4_col()).cast("double") / 10000).alias("revenue"))
        # nation-bounded output
        .transform(lambda d: bounded_sort(d, F.col("revenue").desc(), "n_name"))
    )


@register(
    "x52_correlated_scalar_subquery",
    # Customers above their own nation's average balance. Catalyst
    # decorrelates the per-row subquery into an aggregate + join
    # (RewriteCorrelatedScalarSubquery) — the Spark builder writes
    # that target plan directly: per-nation averages as a broadcast
    # side, which is the shape that scales.
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
        ORDER BY c_custkey
    """,
    covers="correlated scalar subquery (per-group aggregate predicate, decorrelated)",
    tags=("analytics", "olap"),
)
def x52(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation_avg = customer.groupBy(F.col("c_nationkey").alias("__nk")).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        customer.join(
            F.broadcast(nation_avg), customer.c_nationkey == F.col("__nk")
        )
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "x71_regex_extract_all",
    # All numeric runs in the raw JSON props text, re-aggregated:
    # regexp_extract_all + array fold are the generic "parse
    # semi-structured text into values" pair (F8's regex sibling).
    oracle="""
        WITH m AS (
            SELECT event_id,
                   regexp_extract_all(props, '[0-9]+') AS nums
            FROM events WHERE event_id <= 5000
        )
        SELECT event_id,
               CAST(len(nums) AS INT) AS n_matches,
               CAST(COALESCE(list_aggregate(list_transform(nums, x -> CAST(x AS BIGINT)), 'sum'), 0) AS BIGINT) AS num_sum
        FROM m
        WHERE len(nums) > 0
        ORDER BY event_id
    """,
    covers="regexp_extract_all -> array analytics (parse semi-structured text)",
    tags=("analytics", "text"),
)
def x71(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 5000)
    nums = F.regexp_extract_all(F.col("props"), F.lit("[0-9]+"), 0)
    return (
        events.select("event_id", nums.alias("nums"))
        .filter(F.size("nums") > 0)
        .select(
            "event_id",
            F.size("nums").cast("int").alias("n_matches"),
            F.coalesce(
                F.aggregate(
                    F.transform("nums", lambda x: x.cast("bigint")),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("num_sum"),
        )
        .orderBy("event_id")
    )


@register(
    "x78_equiwidth_histogram",
    # Feature-distribution histogram: data-driven [min, max] split into
    # 20 equal bins; the top edge folds into the last bin. Both engines
    # compute bin = least(floor((v-lo)/w), 19) on identical doubles, so
    # the bucketing is bit-deterministic. The bounds aggregate is one
    # tiny broadcast; binning is a narrow projection + one partial-agg
    # count — the 100 TB shape for any histogram.
    oracle="""
        WITH b AS (
            SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
            FROM lineitem
        ),
        binned AS (
            SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 20.0)), 19) AS BIGINT) AS bin,
                   lo, hi
            FROM lineitem, b
        )
        SELECT bin,
               COUNT(*) AS n,
               ROUND(lo + bin * ((hi - lo) / 20.0), 6) AS bin_lo,
               ROUND(lo + (bin + 1) * ((hi - lo) / 20.0), 6) AS bin_hi
        FROM binned
        GROUP BY bin, lo, hi
        ORDER BY bin
    """,
    covers="equi-width histogram: broadcast bounds + narrow binning + partial-agg counts (feature distribution analytics)",
    tags=("olap", "training"),
    min_rows=15,
)
def x78(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    binned = li.join(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("lo")) / width), F.lit(19)
        )
        .cast("bigint")
        .alias("bin"),
        "lo",
        "hi",
    )
    return (
        binned.groupBy("bin", "lo", "hi")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            "n",
            F.round(F.col("lo") + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.col("lo") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
        )
        # fixed-bin-count histogram output
        .transform(lambda d: bounded_sort(d, "bin"))
    )


@register(
    "x79_majority_vote",
    # Label consolidation (multi-annotator -> gold label): most frequent
    # l_returnflag per order; ties break to the smallest label so the
    # winner is engine-deterministic (mode()'s tie choice is not).
    oracle="""
        WITH counts AS (
            SELECT l_orderkey, l_returnflag, COUNT(*) AS n_votes
            FROM lineitem GROUP BY 1, 2
        ), ranked AS (
            SELECT l_orderkey, l_returnflag, n_votes,
                   ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                      ORDER BY n_votes DESC, l_returnflag) AS rn,
                   CAST(SUM(n_votes) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_total
            FROM counts
        )
        SELECT l_orderkey, l_returnflag AS label, n_votes, n_total
        FROM ranked WHERE rn = 1
        ORDER BY l_orderkey
    """,
    covers="majority-vote label consolidation: partial-agg counts + per-key keep-best window (SURVEY §2.4 training surface)",
    tags=("training", "curation"),
    min_rows=1000,
)
def x79(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators.curation import majority_vote

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    return majority_vote(li, ["l_orderkey"], "l_returnflag").orderBy("l_orderkey")


@register(
    "x80_snapshot_diff",
    # Data-versioning diff between two deterministic slices of orders:
    # keys ending in 0 are absent from OLD (-> added), keys divisible
    # by 7 absent from NEW (-> removed), keys divisible by 5 carry a
    # doubled price in NEW (-> changed). Unchanged keys drop out.
    oracle="""
        WITH old_t AS (
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0
        ), new_t AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 7 <> 0
        ), diff AS (
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                   o.o_totalprice AS old_o_totalprice,
                   n.o_totalprice AS new_o_totalprice,
                   CASE WHEN o.o_orderkey IS NULL THEN 'added'
                        WHEN n.o_orderkey IS NULL THEN 'removed'
                        WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                             THEN 'changed' END AS change_type
            FROM old_t o FULL OUTER JOIN new_t n ON o.o_orderkey = n.o_orderkey
        )
        SELECT o_orderkey, old_o_totalprice, new_o_totalprice, change_type
        FROM diff WHERE change_type IS NOT NULL
        ORDER BY o_orderkey
    """,
    covers="snapshot diff by key: added/removed/changed via null-safe full outer join (CDC audit companion)",
    tags=("cdc",),
    # ~30% of order keys differ between the slices: ~450 rows at
    # sf0.001, ~4500 at the driver's sf0.01 gate.
    min_rows=300,
)
def x80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.operators import cdc

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old = orders.filter(F.col("o_orderkey") % 10 != 0)
    new = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    return cdc.snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"]).orderBy(
        "o_orderkey"
    )


from skoltexter_by_ai_spark.functions.zorder import morton_sql as _morton_sql  # noqa: E402


@register(
    "x83_morton_zorder_keys",
    # Z-order clustering keys over a 2-D integer grid: the layout key
    # behind multi-dimensional data skipping (see functions/zorder.py
    # and the clustering-quality test in tests/test_sinks.py). The
    # oracle is generated from the SAME bit layout the Spark column
    # uses, so the two can never drift.
    oracle=f"""
        SELECT o_orderkey,
               {_morton_sql('(o_orderkey % 1024)', '(o_custkey % 1024)', bits=10)} AS zkey
        FROM orders
        ORDER BY o_orderkey
    """,
    covers="Z-order (Morton) clustering keys: bit-interleaved 2-D layout for min/max data skipping",
    tags=("olap", "layout"),
    min_rows=1000,
)
def x83(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skoltexter_by_ai_spark.functions.zorder import morton_code

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            (F.col("o_orderkey") % 1024).alias("ga"),
            (F.col("o_custkey") % 1024).alias("gb"),
        )
        .select(
            "o_orderkey", morton_code("ga", "gb", bits=10).alias("zkey")
        )
        .orderBy("o_orderkey")
    )
