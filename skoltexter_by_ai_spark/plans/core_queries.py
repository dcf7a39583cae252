"""Core declared queries Q1..Q24 (SURVEY.md §2.3), adapted to the real
driver fixture schemas (TESTDATA.md — the fixtures are narrower than
classic TPC-H: e.g. no ``c_comment``/``o_clerk`` columns, so queries
that exercised those operators use the closest existing column or the
``documents`` table, keeping the *operator under test* identical).

Each builder is idiomatic DataFrame API — Catalyst handles pushdown,
pruning and join-strategy selection. Every aggregate / computed column
is aliased identically in the Spark builder and the DuckDB oracle.

Determinism rules (SURVEY.md §0 correctness gate):
- total ORDER BY over a unique key,
- no SUM over raw doubles (decimal-stabilized),
- DuckDB ``SUM(INTEGER)`` returns HUGEINT → use ``COUNT(CASE ...)`` or
  explicit casts so both engines agree on result types,
- ``regexp_replace`` in DuckDB needs the ``'g'`` flag to match Spark's
  replace-all default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skoltexter_by_ai_spark.plans.ordering import bounded_sort, bounded_sort_after_wide
from skoltexter_by_ai_spark.plans.registry import register
from skoltexter_by_ai_spark.sources.tables import load_table

MISSING_SENTINEL = "[Data Saknas]"  # reference src/config.py:79


# --- scans / projections / filters -------------------------------------------


@register(
    "q01_scan_project",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_orderkey
    """,
    covers="S1/S2 scan + P1 projection (program3_generate_website.py:85-90)",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Column pruning: the parquet scan reads only these 3 columns.
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "q02_filter_predicates",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_quantity > 30 AND l_shipdate IS NOT NULL
        ORDER BY l_orderkey, l_linenumber, l_quantity
    """,
    covers="P2 key/null predicates (program1_generate_markdowns.py:376-379)",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both predicates push down to the parquet scan (PushedFilters).
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 30) & F.col("l_shipdate").isNotNull())
        .select("l_orderkey", "l_linenumber", "l_quantity")
        # The fixture's (l_orderkey, l_linenumber) is NOT unique (~20%
        # duplicate pairs differing in quantity), so the full output
        # row is the sort key — ties are then identical rows and the
        # emitted order is total (SURVEY §2.3 rule b).
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "q03_sanitize_sentinel",
    oracle=f"""
        SELECT c_custkey,
               COALESCE(NULLIF(TRIM(c_mktsegment), ''), '{MISSING_SENTINEL}') AS segment
        FROM customer
        ORDER BY c_custkey
    """,
    covers="P3 trim/null-normalize + sentinel (program1_generate_markdowns.py:92-123)",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.coalesce(
                F.nullif(F.trim("c_mktsegment"), F.lit("")), F.lit(MISSING_SENTINEL)
            ).alias("segment"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q04_string_casing",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS u,
               LOWER(c_mktsegment) AS l,
               TRIM(c_name) AS t
        FROM customer
        ORDER BY c_custkey
    """,
    covers="F12 casing/trim primitives (program1_generate_markdowns.py:120-121)",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.upper("c_name").alias("u"),
            F.lower("c_mktsegment").alias("l"),
            F.trim("c_name").alias("t"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q05_number_normalize",
    # DECIMAL(18,1) text form is identical in both engines ("901.0"), so
    # the regex is exercised on stable input, not on double->string repr.
    oracle=r"""
        SELECT p_partkey,
               REGEXP_REPLACE(CAST(CAST(p_retailprice AS DECIMAL(18,1)) AS VARCHAR),
                              '^(-?\d+)\.0$', '\1') AS price_fmt
        FROM part
        ORDER BY p_partkey
    """,
    covers="F3 number normalization '10.0'->'10' (program1_generate_markdowns.py:282-297)",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.regexp_replace(
                F.col("p_retailprice").cast("decimal(18,1)").cast("string"),
                r"^(-?\d+)\.0$",
                "$1",
            ).alias("price_fmt"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q06_template_concat",
    oracle="""
        SELECT s_suppkey,
               'Supplier ' || s_name || ' (nation ' || CAST(s_nationkey AS VARCHAR) || ')' AS doc
        FROM supplier
        ORDER BY s_suppkey
    """,
    covers="F2 template render as concat of literals+columns (program1_generate_markdowns.py:254-319)",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            F.concat(
                F.lit("Supplier "),
                F.col("s_name"),
                F.lit(" (nation "),
                F.col("s_nationkey").cast("string"),
                F.lit(")"),
            ).alias("doc"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q07_coalesce_chain",
    oracle=f"""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, ''), NULLIF(c_name, ''), '{MISSING_SENTINEL}') AS v
        FROM customer
        ORDER BY c_custkey
    """,
    covers="F4 year-preference coalesce (program1_generate_markdowns.py:222-251)",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("")),
                F.nullif(F.col("c_name"), F.lit("")),
                F.lit(MISSING_SENTINEL),
            ).alias("v"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q08_case_over_indicators",
    oracle=f"""
        SELECT o_orderkey,
               CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 'recent'
                    WHEN o_orderpriority LIKE '3%' THEN 'previous'
                    ELSE '{MISSING_SENTINEL}' END AS yr
        FROM orders
        ORDER BY o_orderkey
    """,
    covers="F5 survey-year CASE over indicator columns (program1_generate_markdowns.py:183-219)",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = F.col("o_orderpriority")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.when(pr.like("1%") | pr.like("2%"), "recent")
            .when(pr.like("3%"), "previous")
            .otherwise(MISSING_SENTINEL)
            .alias("yr"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q09_substring_search",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE LOWER(c_name) LIKE '%00%' OR LOWER(c_mktsegment) LIKE '%a%'
        ORDER BY c_custkey
    """,
    covers="Q-a case-insensitive substring search (website_template.html:302-304)",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(
            F.lower("c_name").contains("00") | F.lower("c_mktsegment").contains("a")
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q10_point_lookup",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_custkey = 42
        ORDER BY c_custkey
    """,
    covers="Q-b point lookup by key (website_template.html:347-357)",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


# --- joins -------------------------------------------------------------------


@register(
    "q11_inner_join_broadcast",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_nationkey
    """,
    covers="J1 equi-join, broadcast variant (program3_generate_website.py:262-287)",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # region is a dimension table: broadcast it — zero shuffle at any scale.
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "inner")
        .select("n_nationkey", "n_name", "r_name")
        # nation-bounded output
        .transform(lambda d: bounded_sort(d, "n_nationkey"))
    )


@register(
    "q12_left_join_fallback",
    oracle="""
        SELECT c.c_custkey, c.c_name, COALESCE(o.cnt, 0) AS order_cnt
        FROM customer c
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
          ON c.c_custkey = o.o_custkey
        ORDER BY c.c_custkey
    """,
    covers="J1 left join + missing-doc fallback coalesce (program3_generate_website.py:262-287)",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    # Aggregate BEFORE the join: shrinks the shuffled side from |orders|
    # rows to |custkeys| rows (partial aggregation is map-side combined).
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        customer.join(counts, customer.c_custkey == counts.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("order_cnt"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q13_anti_join",
    # customer-vs-orders is vacuous in the fixtures (every customer has
    # orders); customers-without-events exercises real anti-join rows.
    oracle="""
        SELECT c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
        ORDER BY c_custkey
    """,
    covers="J2/X9 anti-join incremental skip (program2_ai_processor.py:692-724)",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    # 'done' side reduced to distinct keys before the anti-join: at scale
    # the build side is |distinct keys|, not |events|.
    done = events.select(F.col("user_id").alias("c_custkey")).distinct()
    return (
        customer.join(done, "c_custkey", "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@register(
    "q19_semi_join",
    oracle="""
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    covers="semi-join complement of J2 (SURVEY.md §2.3 Q19)",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --- aggregation / windows / dedup -------------------------------------------


@register(
    "q14_keep_first_dedup",
    oracle="""
        SELECT s_suppkey, s_name
        FROM (SELECT s_suppkey, s_name,
                     ROW_NUMBER() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
              FROM supplier)
        WHERE rn = 1
        ORDER BY s_suppkey
    """,
    covers="A3 keep-first dedup via row_number window (program3_generate_website.py:138-162)",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT dropDuplicates: keep-first must be deterministic, so the window
    # orders by an explicit key (reference keeps first CSV-file-order row).
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    return (
        load_table(spark, sf_dir, "supplier")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_suppkey", "s_name")
        # One survivor per nation: nation-bounded OUTPUT, but the
        # producing stage is the row_number window over the full
        # supplier table — keep it parallel behind an explicit
        # boundary instead of coalescing it into one task (ADVICE r11).
        .transform(lambda d: bounded_sort_after_wide(d, "s_suppkey"))
    )


@register(
    "q15_conditional_counts",
    # COUNT(CASE...) keeps both engines in BIGINT (DuckDB SUM(int) would
    # widen to HUGEINT and break the hash).
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS big
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    covers="A1/A2 counts & conditional run stats (program2_ai_processor.py:677-690)",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("big"),
        )
        # status-bounded output
        .transform(lambda d: bounded_sort(d, "o_orderstatus"))
    )


@register(
    "q18_decimal_sum",
    oracle="""
        SELECT n_regionkey,
               CAST(SUM(CAST(n_nationkey AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    covers="A2 numeric aggregation, decimal-stable (SURVEY.md §2.3 Q18)",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.sum(F.col("n_nationkey").cast("decimal(18,2)")).cast("double").alias("s"))
        # region-bounded output
        .transform(lambda d: bounded_sort(d, "n_regionkey"))
    )


# --- sorts / limits / top-K --------------------------------------------------


@register(
    "q16_topk",
    # The ranking price is projected alongside the keys so the emitted
    # order is provably total from the output alone (SURVEY §2.3 rule
    # b): the full sort key is the output row's prefix.
    oracle="""
        SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 12
    """,
    covers="O1 sort + L2 top-K cap of 12 (website_template.html:239-241,261-266)",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy().limit(k) compiles to TakeOrderedAndProject: each task
    # keeps a k-row heap, the driver merges — no global sort at scale.
    return (
        load_table(spark, sf_dir, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(12)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        )
    )


@register(
    "q17_ordered_limit",
    oracle="""
        SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    covers="L1 limit after deterministic order (program2_ai_processor.py:637-641)",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select("o_orderkey").orderBy("o_orderkey").limit(100)


@register(
    "q23_binary_collation_sort",
    oracle="""
        SELECT n_nationkey, n_name
        FROM nation
        WHERE n_name IS NOT NULL
        ORDER BY n_name, n_nationkey
    """,
    covers="O1 name sort, binary/UTF8 collation (program3_generate_website.py:171)",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isNotNull())
        .select("n_nationkey", "n_name")
        # nation-bounded output
        .transform(lambda d: bounded_sort(d, "n_name", "n_nationkey"))
    )


# --- set ops -----------------------------------------------------------------


@register(
    "q20_side_output_union",
    oracle="""
        SELECT x FROM (
            SELECT o_orderkey AS x FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey AS x FROM orders WHERE o_orderstatus = 'O'
        ) ORDER BY x
    """,
    covers="X8 success/failed side-output union (program2_ai_processor.py:556-579)",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    succeeded = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderkey").alias("x"))
    failed = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderkey").alias("x"))
    return succeeded.unionByName(failed).orderBy("x")


# --- regex / string pipelines ------------------------------------------------


@register(
    "q21_regex_cleanup_chain",
    # DuckDB regexp_replace needs 'g' to match Spark's replace-all.
    oracle=r"""
        SELECT doc_id,
               REGEXP_REPLACE(REGEXP_REPLACE(text, '\s{2,}', ' ', 'g'),
                              '^\s+|\s+$', '', 'g') AS cleaned
        FROM documents
        ORDER BY doc_id
    """,
    covers="F6/F9 chained regex cleanup (program3_generate_website.py:242-258)",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace(F.col("text"), r"\s{2,}", " "),
                r"^\s+|\s+$",
                "",
            ).alias("cleaned"),
        )
        .orderBy("doc_id")
    )


@register(
    "q22_marker_split",
    oracle="""
        SELECT doc_id,
               SUBSTR(text, 1, POSITION(' ' IN text || ' ') - 1) AS first_tok
        FROM documents
        ORDER BY doc_id
    """,
    covers="F7 SYSTEM:/USER: marker split via locate+substr (program2_ai_processor.py:253-290)",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    padded = F.concat(F.col("text"), F.lit(" "))
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.substring(F.col("text"), 1, F.locate(" ", padded) - 1).alias("first_tok"),
        )
        .orderBy("doc_id")
    )


# --- events (batch view of the streaming table) ------------------------------


@register(
    "q24_events_batch_agg",
    oracle="""
        SELECT user_id, COUNT(*) AS n
        FROM events
        WHERE ts >= (SELECT MIN(ts) FROM events)
        GROUP BY user_id
        ORDER BY user_id
    """,
    covers="batch view of the streaming events table (SURVEY.md §2.3 Q24)",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Compare on raw nanos (ts_ns) so semantics match DuckDB's ns
    # timestamps exactly (Spark's TIMESTAMP is micros).
    min_ts = events.agg(F.min("ts_ns").alias("m"))
    # Scalar subquery as a broadcast cross-join of a 1-row frame — no
    # driver-side collect, stays one distributed plan.
    return (
        events.join(F.broadcast(min_ts))
        .filter(F.col("ts_ns") >= F.col("m"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy("user_id")
    )
