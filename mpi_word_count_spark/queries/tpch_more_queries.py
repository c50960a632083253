"""Second tranche of TPC-H-style analogs (SURVEY.md §7 M2 widening).

Q6/Q7/Q8/Q10/Q14/Q18/Q19 analogs adapted to the fixture star schema
(no partsupp/shipmode columns in the fixtures, so Q2/Q11/Q12/Q16 have
no analog here). Each exercises a distinct physical pattern the
reference engine cannot express (SURVEY.md §2.4-2.6: it has no joins,
no predicates beyond is-delimiter, one aggregate):

- q6: pure scan-filter-agg — every predicate pushes to parquet.
- q7: fact-fact join with a dimension self-join (nation × 2 roles).
- q8: conditional aggregation for market share (CASE inside sum).
- q10: group-by over a 3-way join with top-k.
- q14: scalar ratio aggregate over a broadcast join.
- q18: HAVING over a pre-aggregated fact, re-joined to dims.
- q19: disjunction-of-conjunctions predicate (OR-of-ANDs) across
  both join sides — the classic pushdown/CNF stress test.

Oracle-parity discipline per registry.py: rounded floats, formatted
dates, bigint years, total-order sorts with unique tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table


# --- Q6: forecast revenue change (scan → pushed filters → scalar agg) -----
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates reach the parquet scan (PushedFilters);
    ReadSchema is 4 columns. The whole query is one codegen stage +
    a single-row final aggregate — no shuffle of data rows at any SF."""
    li = table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# --- Q7: volume shipping between nation groups (dim self-join) ------------
@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
          AND n1.n_nationkey <> n2.n_nationkey
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation joins twice in different roles (supplier side / customer
    side) — a dimension self-join needing explicit aliases. Both nation
    copies and supplier/customer broadcast; orders⋈lineitem is the one
    shuffled join, exactly the scalable shape at 100 TB."""
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, "orders", sf_dir)
    c = table(spark, "customer", sf_dir)
    s = table(spark, "supplier", sf_dir)
    n1 = (
        table(spark, "nation", sf_dir)
        .filter(F.col("n_nationkey") < 5)
        .select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = (
        table(spark, "nation", sf_dir)
        .filter(F.col("n_nationkey") < 5)
        .select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.n1_key)
        .join(F.broadcast(n2), c.c_nationkey == n2.n2_key)
        .filter(F.col("n1_key") != F.col("n2_key"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


# --- Q8: national market share (CASE-conditional ratio aggregate) ---------
@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of NATION_3 suppliers inside ASIA: conditional
    numerator via CASE inside the aggregate — one pass, no self-join.
    Seven-table star; every dimension broadcasts."""
    p = table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = table(spark, "customer", sf_dir)
    s = table(spark, "supplier", sf_dir)
    n1 = table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    share_num = F.sum(
        F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    )
    return joined.groupBy("o_year").agg(
        F.round(share_num / F.sum("volume"), 4).alias("mkt_share")
    )


# --- Q10: returned-item reporting (join + group + top-k) ------------------
@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most. The returnflag filter pushes to
    the lineitem scan; top-k runs as TakeOrderedAndProject (per-partition
    heap), never a global sort."""
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = table(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- Q14: promotion revenue share (scalar ratio over broadcast join) ------
@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of revenue from promo parts in one month. part
    broadcasts; the month filter prunes the fact scan; result is a
    single row — zero data-row shuffles end to end."""
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, "part", sf_dir)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(F.lit(100.0) * promo / F.sum(disc), 4).alias("promo_share"))
    )


# --- Q18: large-volume orders (HAVING on pre-aggregated fact) -------------
@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 250
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with >250 total units. Aggregate lineitem FIRST (one
    shuffle on orderkey, HAVING prunes before any join), then join the
    small survivor set — at 100 TB this ordering is the difference
    between shuffling the fact once vs joining the full fact width."""
    li = table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
    )
    o = table(spark, "orders", sf_dir)
    c = table(spark, "customer", sf_dir)
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --- Q13: customer order-count distribution -------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count (zero-order customers
    included via the outer join) — two cascaded aggregations; the
    second groups on the tiny distinct-count domain, so its exchange
    is negligible at any scale."""
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir)
    per_customer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_customer.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --- Q15: top supplier(s) by quarterly revenue ----------------------------
@register(
    "q15_top_suppliers",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) achieving the maximum quarterly revenue: the
    revenue CTE aggregates once and feeds both the scalar-max (a
    1-row aggregate broadcast back via crossJoin) and the final join.
    Round-6 plan-guard fix: this was previously a window max over an
    empty partition spec, which funnels the per-supplier relation
    (SF×10k rows, ~1B at 100 TB) through ONE WindowExec partition;
    the 1-row-broadcast shape reduces it through the partial-agg tree
    instead and costs no second lineitem scan."""
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
        # explicit, so BOTH consumers (max branch + supplier join) see
        # the identical subplan: the join infers isnotnull(supplier_no)
        # on its side only, which breaks canonical plan equality and
        # with it the ReusedExchange — i.e. lineitem would scan twice
        .filter(F.col("supplier_no").isNotNull())
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    best = revenue.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("_max")
    )
    s = table(spark, "supplier", sf_dir)
    return best.join(s, best.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# --- Q19: discounted revenue, OR-of-ANDs predicate ------------------------
@register(
    "q19_bracket_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of per-brand conjunctions spanning both join sides.
    Catalyst CNF-extracts the common implied predicates so each scan
    still prunes (brand list on part, quantity range on lineitem)
    before the broadcast join evaluates the full disjunction."""
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 20) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#4") & sz.between(1, 25) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
