"""Correlated-subquery queries (TPC-H q4/q17/q22 analogs, adapted to
the reduced fixture schema — no partsupp/commitdate columns).

The reference has no joins at all (SURVEY.md §2.4); this family covers
the decorrelation patterns a full engine must handle: EXISTS → semi
join, NOT EXISTS → anti join, correlated scalar aggregate → aggregate
+ equi-join, uncorrelated scalar → broadcast cross join. Spark plans
all four without driver-side scalars — every subquery stays a
distributed plan node.

Scale notes: the semi/anti joins shuffle on the correlation key
(orderkey/custkey) and AQE picks broadcast sides at runtime; the
scalar-average cross join broadcasts a single row; the per-part
threshold join in q17 is an agg on the (pre-filtered, brand-only)
fact — never a re-scan per outer row like a naive correlated plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table


@register(
    "q4_late_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 analog: orders having any line shipped >60 days after
    the order date, counted per priority. EXISTS ≡ left-semi join with
    a non-equi residual — one shuffle on orderkey, per-key early-out
    (a semi join stops probing at the first match)."""
    orders = table(spark, "orders", sf_dir)
    lineitem = table(spark, "lineitem", sf_dir)
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 analog: revenue from unusually-small-quantity orders
    of one brand's parts. The correlated scalar subquery decorrelates
    into a per-part AVG aggregate joined back on partkey; the brand
    filter broadcasts so the (restricted) fact is scanned once."""
    lineitem = table(spark, "lineitem", sf_dir)
    part = table(spark, "part", sf_dir)
    brand_keys = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    li = lineitem.join(
        F.broadcast(brand_keys), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("qty_thresh")
    )
    return (
        li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1995-03-01'
              AND o.o_orderdate <  TIMESTAMP '1995-04-01'
          )
    GROUP BY n.n_name
    """,
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 analog: above-average-balance customers with no order
    in 1995-03, per nation. The global average is a 1-row broadcast
    cross join (no driver collect); NOT EXISTS is an anti join against
    orders pre-filtered to the month (filter applies before the join,
    so the anti side is a month of orders, not the full table)."""
    customer = table(spark, "customer", sf_dir)
    nation = table(spark, "nation", sf_dir)
    orders = table(spark, "orders", sf_dir)
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    month_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select("o_custkey")
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        month_orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return (
        dormant.join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey")
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 analog (reduced schema: late := shipped >90 days after
    order date on a finalized order): suppliers who were the SOLE late
    supplier on multi-supplier orders.

    The oracle keeps the textbook double-correlated form (EXISTS other
    supplier, NOT EXISTS other LATE supplier). The Spark plan uses the
    aggregation decorrelation instead of two self-joins:
      EXISTS other supplier       ⟺ countDistinct(supplier) per order ≥ 2
      NOT EXISTS other late supp  ⟺ exactly 1 distinct late supplier
    so the late fact is derived once, grouped to (order, supplier)
    granularity (tiny), and never self-joined — at 100 TB this is two
    shuffles of key-only rows instead of three fact-vs-fact joins. The
    hash match against the EXISTS oracle proves the rewrite.
    """
    lineitem = table(spark, "lineitem", sf_dir)
    orders = table(spark, "orders", sf_dir)
    supplier = table(spark, "supplier", sf_dir)
    late = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
    )
    sole_late_orders = (
        late.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_late_supps"))
        .filter(F.col("n_late_supps") == 1)
        .select("l_orderkey")
    )
    multi_supp_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supps"))
        .filter(F.col("n_supps") >= 2)
        .select("l_orderkey")
    )
    return (
        late.join(sole_late_orders, "l_orderkey")
        .join(multi_supp_orders, "l_orderkey")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
