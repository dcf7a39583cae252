"""TPC-H-shaped declared queries, round 2: the remaining canonical
plan shapes the analytics suite (x49–x52) did not cover —
correlated EXISTS with a non-equi condition (Q4), a fact⋈fact⋈dim
revenue report (Q10), a two-level aggregation over a left join
(Q13), an exact-integer ratio metric (Q14), a HAVING-subquery
semi-join (Q18), a scalar-max filter over a grouped aggregate
(Q15), and a disjunctive multi-column predicate join (Q19) — plus a
PII-redaction pass over synthesized contact strings (the text-
pipeline operator, expressed as pure regexp so it is oracle-
checkable).

All ratio/average metrics use exact integer or decimal arithmetic
(see ``_floor_div``): cross-engine double summation is order-
dependent and would break the value hash.

Reference parity: the reference has no analytics surface (SURVEY.md
§2.2 — its joins are key lookups, `src/program3_generate_website.py:262-287`);
these queries are the §2.4 "100 TB posture" extension exercising the
join/agg strategies Catalyst must pick well at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skoltexter_by_ai_spark.plans.analytics_queries import (
    _DISC_H,
    _PRICE_CENTS,
    _REV,
    _REV4,
    _bp_floor,
    _price_cents_col,
    _rev4_col,
    _rev_col,
)
from skoltexter_by_ai_spark.plans.ordering import bounded_sort, bounded_sort_after_wide
from skoltexter_by_ai_spark.plans.registry import register
from skoltexter_by_ai_spark.sources.tables import load_table


@register(
    "x53_exists_inequality_join",
    # TPC-H Q4 shape: EXISTS with an extra non-equi condition
    # (l_shipdate > o_orderdate). Catalyst rewrites the subquery to a
    # left-semi join with a composite condition; the semi join
    # short-circuits per probe row, so the lineitem side is never
    # materialized per match — the shape that matters at 100 TB where
    # lineitem is the biggest fact.
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    covers="TPC-H Q4: EXISTS with non-equi correlation -> semi join + agg",
    tags=("analytics", "tpch"),
)
def x53(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        # enum-bounded output (5 priorities): single-task sort
        .transform(lambda d: bounded_sort(d, "o_orderpriority"))
    )


@register(
    "x54_returned_item_report",
    # TPC-H Q10 shape: revenue lost to returned items per customer.
    # lineitem⋈orders shuffles on orderkey; the result re-shuffles on
    # custkey to meet customer (fact⋈fact at scale — NOT broadcast);
    # nation broadcasts onto the output. Top-20 by revenue.
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({_REV4}) AS DOUBLE) / 10000 AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    covers="TPC-H Q10: returned-item revenue, fact-fact join + dim broadcast + top-k",
    tags=("analytics", "tpch"),
)
def x54(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_rev4_col()).cast("double") / 10000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "x55_customer_order_distribution",
    # TPC-H Q13 shape: histogram of customers by order count. The
    # left join keeps zero-order customers (c_count = 0 bucket); the
    # join condition carries an extra filter on the RIGHT side only —
    # a left-join pushdown case Catalyst must NOT push to the left.
    # Two aggregations: per-customer (shuffle on custkey), then the
    # tiny histogram rollup.
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    covers="TPC-H Q13: left join w/ right-side-only predicate + double aggregation",
    tags=("analytics", "tpch"),
)
def x55(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        # histogram over order counts — bounded by max orders/customer
        .transform(
            lambda d: bounded_sort(
                d, F.col("custdist").desc(), F.col("c_count").desc()
            )
        )
    )


@register(
    "x56_promo_revenue_share",
    # TPC-H Q14 shape: promo revenue share per month, in exact basis
    # points. Revenue terms are exact DECIMALs scaled to BIGINT
    # ten-thousandths before the ratio, so both engines compute the
    # identical integer — a double ratio would hash-drift. part is a
    # dimension: broadcast.
    oracle=f"""
        SELECT ym,
               CAST((10000 * promo_scaled) // total_scaled AS BIGINT) AS promo_bps,
               total_scaled
        FROM (
            SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 100
                        + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ym,
                   CAST(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN {_REV} * 10000 ELSE 0 END) AS BIGINT) AS promo_scaled,
                   CAST(SUM({_REV} * 10000) AS BIGINT) AS total_scaled
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
            GROUP BY 1
        )
        ORDER BY ym
    """,
    covers="TPC-H Q14: conditional-ratio metric in exact integer arithmetic",
    tags=("analytics", "tpch"),
)
def x56(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev4 = _rev_col() * 10000  # integer-valued: scale(rev) == 4
    monthly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("ym")
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev4).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("promo_scaled"),
            F.sum(rev4).cast("bigint").alias("total_scaled"),
        )
    )
    return bounded_sort(
        monthly.select(
            "ym",
            _bp_floor(F.col("promo_scaled"), F.col("total_scaled")).alias("promo_bps"),
            "total_scaled",
        ),
        "ym",  # calendar-bounded output
    )


@register(
    "x57_large_volume_orders",
    # TPC-H Q18 shape: orders whose total quantity exceeds a
    # threshold. The oracle spells the textbook IN-subquery; the
    # Spark builder goes one step past the semi-join rewrite: since
    # an order has exactly one customer, the outer per-order SUM
    # equals the subquery's SUM, so ONE lineitem aggregation produces
    # both the threshold and the output measure — one scan of the
    # biggest fact instead of two, and the joins run on the filtered
    # aggregate (few rows), never on raw lineitem. The threshold
    # compare is on exact DECIMAL, not double.
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS totalprice,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
        )
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_orderkey
    """,
    covers="TPC-H Q18: HAVING-subquery semi join against grouped aggregate",
    tags=("analytics", "tpch"),
)
def x57(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            # One long aggregate serves both the HAVING threshold
            # (> 150 qty == > 15000 cents, exact) and the output
            # measure — primitive adds, no per-row BigDecimal.
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_qty_cents"),
        )
        .filter(F.col("sum_qty_cents") > 150 * 100)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty_cents",
        )
        .orderBy("o_orderkey")
    )


@register(
    "x58_top_supplier",
    # TPC-H Q15 shape: suppliers achieving the maximum revenue. The
    # scalar MAX over the grouped aggregate is a 1-row broadcast
    # cross join — never a global window (which would funnel every
    # group through one partition).
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey, CAST(SUM({_REV4}) AS DOUBLE) / 10000 AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    covers="TPC-H Q15: scalar-max filter over grouped aggregate (broadcast scalar)",
    tags=("analytics", "tpch"),
)
def x58(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg((F.sum(_rev4_col()).cast("double") / 10000).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("__max_rev"))
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        # Only the max-revenue tie set survives the join: bounded
        # OUTPUT — but the producing stage streams the full per-
        # supplier revenue aggregate through the tie-set join, so it
        # must keep its parallelism behind an explicit boundary
        # rather than be coalesced into one task (ADVICE r11).
        .transform(lambda d: bounded_sort_after_wide(d, "s_suppkey"))
    )


@register(
    "x59_disjunctive_predicate_join",
    # TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    # extracts the common join key and pushes the per-side conjuncts
    # below the join (p_brand/p_size prune part; l_quantity prunes
    # lineitem) — the whole disjunction must NOT block pushdown.
    oracle=f"""
        SELECT p_brand, CAST(SUM({_REV4}) AS DOUBLE) / 10000 AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
           OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity < 25)
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    covers="TPC-H Q19: disjunctive multi-column predicate join",
    tags=("analytics", "tpch"),
)
def x59(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 10)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") < 25)
    )
    return (
        joined.filter(cond)
        .groupBy("p_brand")
        .agg((F.sum(_rev4_col()).cast("double") / 10000).alias("revenue"))
        # brand-bounded output
        .transform(lambda d: bounded_sort(d, "p_brand"))
    )


@register(
    "x60_pii_redaction",
    # Text-pipeline PII scrub: emails and phone-shaped tokens ->
    # placeholder tags. The contact string is synthesized from
    # customer fields (the fixtures carry no real PII) so the regexes
    # genuinely match; the whole pass is regexp_replace — JVM-side,
    # codegen-friendly, no UDF. Patterns stick to syntax RE2 (DuckDB)
    # and java.util.regex execute identically (no backrefs, no
    # lookaround).
    oracle="""
        SELECT c_custkey,
               REGEXP_REPLACE(
                   REGEXP_REPLACE(
                       'contact ' || REPLACE(LOWER(c_name), ' ', '.')
                           || '@example.com or 555-' || CAST(1000 + c_custkey % 9000 AS VARCHAR),
                       '[a-z0-9._#-]+@[a-z0-9.-]+', '[EMAIL]', 'g'),
                   '\\d{3}-\\d{4}', '[PHONE]', 'g') AS redacted
        FROM customer
        ORDER BY c_custkey
    """,
    covers="PII redaction: chained regexp_replace scrub (text pipeline)",
    tags=("analytics", "text"),
)
def x60(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.lit("contact "),
        F.regexp_replace(F.lower("c_name"), " ", "."),
        F.lit("@example.com or 555-"),
        (F.lit(1000) + F.col("c_custkey") % 9000).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(contact, r"[a-z0-9._#-]+@[a-z0-9.-]+", "[EMAIL]"),
        r"\d{3}-\d{4}",
        "[PHONE]",
    )
    return customer.select("c_custkey", redacted.alias("redacted")).orderBy(
        "c_custkey"
    )


@register(
    "x84_binational_volume",
    # TPC-H Q7 shape: revenue shipped between two specific nations,
    # by supplier nation x customer nation x year. Two independent
    # dimension chains hang off the same fact join (supplier->nation
    # and orders->customer->nation) — every dimension must broadcast
    # while lineitem ⋈ orders is the only big join. Revenue sums run
    # as exact integer ten-thousandths (primitive longs), divided once
    # at the output boundary.
    oracle=f"""
        SELECT supp_nation, cust_nation, yr,
               CAST(SUM(rev4) AS DOUBLE) / 10000 AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   EXTRACT(year FROM l.l_shipdate) AS yr,
                   {_REV4} AS rev4
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            WHERE n1.n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
              AND n2.n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
              AND n1.n_name <> n2.n_name
        )
        GROUP BY supp_nation, cust_nation, yr
        ORDER BY supp_nation, cust_nation, yr
    """,
    covers="TPC-H Q7: bi-national shipping volume — twin dimension chains off one fact join, per-year rollup",
    tags=("analytics", "tpch"),
    # Three-nation set keeps the query non-vacuous at sf0.001 (14
    # rows) as well as the sf0.01 gate (41).
    min_rows=10,
)
def x84(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(
            F.col("supp_nation").isin("NATION_2", "NATION_7", "NATION_12")
            & F.col("cust_nation").isin("NATION_2", "NATION_7", "NATION_12")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("yr")
        )
        .agg((F.sum(_rev4_col()).cast("double") / 10000).alias("revenue"))
        # (nation, nation, year)-bounded output
        .transform(lambda d: bounded_sort(d, "supp_nation", "cust_nation", "yr"))
    )


@register(
    "x85_market_share",
    # TPC-H Q8 shape: one nation's share of a region's revenue per
    # order-year. The share is exact basis points via BIGINT floor
    # division (x56's idiom) — a double ratio of double sums would
    # drift between engines.
    oracle=f"""
        WITH flows AS (
            SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
                   CASE WHEN n1.n_name = 'NATION_2' THEN {_REV4} ELSE 0 END AS target_rev4,
                   {_REV4} AS rev4
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            JOIN region r   ON n2.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            WHERE r.r_name = 'ASIA'
        )
        SELECT yr,
               CAST(SUM(target_rev4) AS DOUBLE) / 10000 AS target_revenue,
               CAST(SUM(rev4) AS DOUBLE) / 10000 AS total_revenue,
               CAST((10000 * SUM(target_rev4) - (10000 * SUM(target_rev4)) % SUM(rev4))
                    / SUM(rev4) AS BIGINT) AS share_bp
        FROM flows
        GROUP BY yr
        ORDER BY yr
    """,
    covers="TPC-H Q8: market share — conditional revenue ratio per year, exact basis points",
    tags=("analytics", "tpch"),
    min_rows=5,
)
def x85(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    asia = region.filter(F.col("r_name") == "ASIA").select("r_regionkey")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(asia), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
    )
    rev4 = _rev4_col()
    target4 = F.when(F.col("supp_nation") == "NATION_2", rev4).otherwise(F.lit(0))
    agg = joined.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(target4).alias("t4"), F.sum(rev4).alias("r4")
    )
    return agg.select(
        "yr",
        (F.col("t4").cast("double") / 10000).alias("target_revenue"),
        (F.col("r4").cast("double") / 10000).alias("total_revenue"),
        _bp_floor(F.col("t4"), F.col("r4")).alias("share_bp"),
    ).transform(lambda d: bounded_sort(d, "yr"))  # year-bounded


@register(
    "x86_small_quantity_revenue",
    # TPC-H Q17 shape: revenue from lineitems whose quantity is below
    # 20% of their part's average quantity. The correlated scalar
    # average decorrelates into ONE per-part aggregate joined back —
    # at 100 TB the aggregate is |parts|-sized and broadcastable,
    # while the naive correlated form would rescan lineitem per row.
    # The 20%-threshold compare runs on exact scaled integers
    # (5 * qty_cents * n < total_cents) — no double division at all.
    oracle="""
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l.l_partkey,
               COUNT(*) AS n_small,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS small_revenue
        FROM lineitem l
        JOIN per_part p ON l.l_partkey = p.l_partkey
        WHERE 5 * CAST(ROUND(l.l_quantity * 100) AS BIGINT) * p.n < p.qty_cents
        GROUP BY l.l_partkey
        ORDER BY l.l_partkey
    """,
    covers="TPC-H Q17: correlated per-part average decorrelated to aggregate-then-join, exact integer threshold",
    tags=("analytics", "tpch"),
    min_rows=10,
)
def x86(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty_cents).alias("qty_cents"), F.count("*").alias("n")
    )
    small = (
        li.join(F.broadcast(per_part), "l_partkey")
        .filter(F.lit(5) * qty_cents * F.col("n") < F.col("qty_cents"))
    )
    return (
        small.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("double")
                / 100
            ).alias("small_revenue"),
        )
        .orderBy("l_partkey")
    )


@register(
    "x87_idle_rich_customers",
    # TPC-H Q22 shape: customers with above-average account balance
    # and no URGENT-priority orders — a 1-row scalar aggregate
    # (broadcast) feeding an anti-join against a filtered fact slice.
    # (The fixture gives every customer at least one order, so the
    # original "no orders at all" predicate would be vacuous — the
    # priority slice keeps the identical plan shape with real rows.)
    # The average threshold compares exact cents via integer
    # cross-multiply: bal_cents * n_pos > total_pos_cents.
    oracle="""
        WITH pos AS (
            SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   COUNT(*) AS n
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS DOUBLE) / 100 AS acctbal
        FROM customer c, pos
        WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.total_cents
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority LIKE '1%')
        ORDER BY c.c_custkey
    """,
    covers="TPC-H Q22: scalar-average threshold + anti-join against a filtered fact slice",
    tags=("analytics", "tpch"),
    min_rows=5,  # 5 rows at sf0.001, 75 at the sf0.01 gate
)
def x87(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_cents).alias("total_cents"), F.count("*").alias("n")
    )
    rich = (
        customer.join(F.broadcast(pos))
        .filter(bal_cents * F.col("n") > F.col("total_cents"))
    )
    urgent = (
        orders.filter(F.col("o_orderpriority").like("1%"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    idle = rich.join(urgent, "c_custkey", "left_anti")
    return idle.select(
        "c_custkey",
        "c_mktsegment",
        (bal_cents.cast("double") / 100).alias("acctbal"),
    ).orderBy("c_custkey")


@register(
    "x104_forecast_revenue",
    # TPC-H Q6 shape: the canonical scan-only query — every predicate
    # lands in PushedFilters on the parquet scan and the aggregate runs
    # entirely in whole-stage codegen with no join or wide shuffle at
    # all (one exchange for the 7-row year rollup). At 100 TB this is
    # the query where pushdown + column pruning ARE the plan: only 4 of
    # lineitem's 11 columns are read. Discount revenue sums as exact
    # scaled integers (cents × discount-hundredths), divided back once.
    oracle=f"""
        SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
               COUNT(*) AS n_items,
               CAST(SUM({_PRICE_CENTS} * {_DISC_H}) AS DOUBLE) / 10000
                   AS forecast_revenue
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        GROUP BY 1
        ORDER BY yr
    """,
    covers="TPC-H Q6: scan-only multi-predicate aggregate, full pushdown",
    tags=("analytics", "tpch"),
    min_rows=3,
)
def x104(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_h = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy(F.year("l_shipdate").cast("bigint").alias("yr"))
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(_price_cents_col() * disc_h).cast("double") / 10000).alias(
                "forecast_revenue"
            ),
        )
        # year-bounded output
        .transform(lambda d: bounded_sort(d, "yr"))
    )


@register(
    "x105_waiting_suppliers",
    # TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    # finished multi-supplier order ("late" adapted to this fixture's
    # columns: shipped >60 days after the order date — the fixture has
    # no commit/receipt dates). The EXISTS decorrelates to a left-semi
    # self-join and the NOT EXISTS to a left-anti self-join, all three
    # keyed on l_orderkey — at 100 TB the three lineitem passes share
    # one hash-partitioning on orderkey, so AQE reuses the exchange
    # instead of re-shuffling the biggest fact twice. The |suppliers|-
    # sized name table broadcasts onto the aggregated output.
    oracle="""
        SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders o ON l1.l_orderkey = o.o_orderkey
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1, 2
        ORDER BY numwait DESC, s_suppkey
    """,
    covers="TPC-H Q21: EXISTS + NOT EXISTS lineitem self-joins (semi/anti), top waiters",
    tags=("analytics", "tpch"),
    min_rows=5,
)
def x105(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("s_k"))
    has_other = late.join(
        others,
        (late.l_orderkey == others.o_k) & (late.l_suppkey != others.s_k),
        "left_semi",
    )
    late_others = late.select(
        F.col("l_orderkey").alias("lo_k"), F.col("l_suppkey").alias("ls_k")
    )
    sole_late = has_other.join(
        late_others,
        (has_other.l_orderkey == late_others.lo_k)
        & (has_other.l_suppkey != late_others.ls_k),
        "left_anti",
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
    )
