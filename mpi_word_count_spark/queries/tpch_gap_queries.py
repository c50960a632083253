"""Third tranche of TPC-H-style analogs: the gap queries.

Q2/Q9/Q11/Q12/Q16/Q20 reference partsupp / shipmode columns the
fixture schema lacks, so earlier tranches skipped them. Each is
re-expressed here against the columns that DO exist — lineitem acts
as the part–supplier supply relation (a (l_partkey, l_suppkey) pair
is "supplier S supplies part P", unit price l_extendedprice /
l_quantity plays ps_supplycost, shipped quantity plays ps_availqty)
— preserving the PHYSICAL pattern each query exists to exercise:

- q2:  correlated per-group MIN subquery (supplier with the minimum
       unit cost per part) → window min, no re-scan, no self-join.
- q9:  profit rollup over a 5-table star with an expression combining
       columns of three tables.
- q11: HAVING against a GLOBAL scalar aggregate — the scalar is a
       window over an empty partition spec, not a second scan, and
       the threshold (1.5× the average part value) is scale-invariant
       so the query stays non-degenerate from sf0.001 to 100 TB.
- q12: integer date arithmetic bucketing + CASE-conditional counts
       (the classic two-priority pivot) — all-integer outputs,
       bitwise-stable across engines.
- q16: count(DISTINCT) per attribute triple with a NOT-IN
       anti-join exclusion list.
- q20: nested semi-join reduction (parts → qualifying supply
       volumes → distinct suppliers → supplier dim).

Oracle-parity discipline per registry.py: money sums rounded with
F.round (2 dp, consistent with tranches 1–2); quotient-derived
values rounded with portable_round (parity.py — Spark's round()
routes doubles through shortest-decimal-string HALF_UP, which can
disagree with DuckDB's floor-based round exactly at half-way points
that unit-price quotients CAN hit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mpi_word_count_spark.functions.parity import portable_round, sql_portable_round
from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table

# q16 attribute slice: a fixed size list keeps the group domain small
# (≤ 25 brands × 6 types × 7 sizes) at every scale factor.
Q16_SIZES = (2, 5, 11, 28, 37, 42, 50)
# q20 "excess supply" threshold: total units of small-parts shipped in
# 1996 by one supplier. Calibrated non-empty from sf0.001 up; at
# larger SF more suppliers qualify, which is the correct Q20 shape
# (the filter is per-supplier volume, not a top-k).
Q20_MIN_QTY = 50
# q11 keeps parts worth more than 3/2 of the average part value —
# scale-invariant (a fixed fraction-of-total threshold degenerates to
# empty as the part domain grows). Expressed as an integer ratio so
# the threshold test runs in EXACT decimal arithmetic — comparing
# drift-prone double sums against 1.5×avg would let a part within a
# few ulps of the boundary flip membership between engines.
Q11_AVG_MULT_NUM = 3
Q11_AVG_MULT_DEN = 2


# --- Q2: minimum-cost supplier per part (correlated MIN subquery) ---------
@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS cost
        FROM lineitem
        GROUP BY 1, 2
    ),
    best AS (
        SELECT partkey, suppkey, cost,
               min(cost) OVER (PARTITION BY partkey) AS best_cost
        FROM supply
    )
    SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name,
           p_partkey, {sql_portable_round("cost", 4)} AS supply_cost
    FROM best
    JOIN part     ON p_partkey = partkey
    JOIN supplier ON s_suppkey = suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE cost = best_cost
      AND p_type = 'SMALL' AND p_size <= 15
    ORDER BY acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC, suppkey ASC
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated subquery (supplier matching the per-part
    MIN supply cost) as a window min over the aggregated supply
    relation: ONE shuffle on (partkey, suppkey), window on partkey
    reuses that partitioning's prefix, and the part/supplier/nation
    dims all broadcast. The reference pattern — re-scanning supply
    per part — is exactly what this plan avoids at 100 TB.

    Unit-price equality across engines is exact: the same binary64
    division produces the same min, and the filter compares doubles
    computed identically on both sides (no rounding before compare).
    """
    li = table(spark, "lineitem", sf_dir)
    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    best = supply.withColumn(
        "best_cost", F.min("cost").over(Window.partitionBy("partkey"))
    ).filter(F.col("cost") == F.col("best_cost"))
    p = table(spark, "part", sf_dir).filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    return (
        best.join(F.broadcast(p), best.partkey == p.p_partkey)
        .join(F.broadcast(s), best.suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            portable_round(F.col("cost"), 4).alias("supply_cost"),
            "suppkey",
        )
        .orderBy(
            F.desc("acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
            F.asc("suppkey"),
        )
        .limit(100)
        .drop("suppkey")
    )


# --- Q9: product-type profit by nation and year ---------------------------
@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          - CAST(0.6 AS DECIMAL(2,1))
                            * CAST(p_retailprice AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 profit rollup with 0.6·p_retailprice·l_quantity as the
    supply-cost term (fixture has no ps_supplycost). The p_name LIKE
    filter prunes part BEFORE its broadcast, so the build side ships
    only matching parts; lineitem⋈orders is the one shuffled join.
    o_year is bigint on both sides (EXTRACT returns int64).

    Profit is computed in exact DECIMAL, not double: 0.6 × a 2-decimal
    price is a 3-decimal value, so the per-group sums land on exact
    half-cent boundaries STRUCTURALLY (observed at sf0.001), where
    Spark's and DuckDB's double-round disagree. Decimal keeps every
    term an exact rational; round(2) is then well-defined HALF_UP in
    both engines, and the final cast to double is bit-identical."""
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir)
    p = table(spark, "part", sf_dir).filter(F.col("p_name").like("%bolt%"))
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    profit = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - F.lit(
        "0.6"
    ).cast("decimal(2,1)") * dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("profit"), 2).cast("double").alias("sum_profit"))
    )


# --- Q11: important parts (HAVING vs a global scalar aggregate) -----------
@register(
    "q11_important_parts",
    oracle=f"""
    WITH partval AS (
        SELECT l_partkey AS partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        WHERE s_nationkey = 3
        GROUP BY 1
    ),
    tot AS (SELECT sum(value) AS total, count(*) AS cnt FROM partval)
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM partval, tot
    WHERE {Q11_AVG_MULT_DEN} * value * cnt > {Q11_AVG_MULT_NUM} * total
    ORDER BY value DESC, partkey ASC
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's HAVING-against-global-scalar: parts whose supply
    value (from NATION_3 suppliers) exceeds 3/2 the average part
    value. The scalar is a 1-row (total, cnt) aggregate of the
    per-part relation, broadcast back via crossJoin — the same
    scan-once shape as a window over an empty partition spec but
    WITHOUT funneling the per-part relation (SF×200k rows ≈ billions
    at 100 TB) through a single WindowExec partition; the partial
    aggregation tree reduces it instead (round-6 plan-guard fix). A
    fraction-of-total threshold (the literal Q11 formulation)
    degenerates as the part domain grows; average-relative keeps the
    selectivity stable at any SF.

    The threshold comparison is exact: values are DECIMAL sums of
    2-decimal prices (order-independent, bit-identical across
    engines) and avg-relative membership is tested as the integer
    cross-multiplication den·value·cnt > num·total — no double
    arithmetic anywhere near the boundary.
    """
    li = table(spark, "lineitem", sf_dir)
    s = table(spark, "supplier", sf_dir).filter(F.col("s_nationkey") == 3)
    partval = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value"))
    )
    tot = partval.agg(
        F.sum("value").alias("_total"), F.count(F.lit(1)).alias("_cnt")
    )
    staged = partval.crossJoin(F.broadcast(tot))
    return (
        staged.filter(
            F.lit(Q11_AVG_MULT_DEN) * F.col("value") * F.col("_cnt")
            > F.lit(Q11_AVG_MULT_NUM) * F.col("_total")
        )
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), F.asc("partkey"))
    )


# --- Q12: shipping-delay buckets vs order priority ------------------------
@register(
    "q12_ship_priority",
    oracle="""
    SELECT CASE WHEN delay >= 60 THEN 'SLOW'
                WHEN delay >= 30 THEN 'MEDIUM'
                ELSE 'FAST' END AS ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS delay
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12's two-priority pivot with ship-minus-order-date delay
    buckets standing in for l_shipmode. Every output is an integer
    (datediff on DATE-cast timestamps is exact day arithmetic in both
    engines), so the hash gate is bitwise — no float discipline
    needed. The year filter pushes to the lineitem scan; the 3-row
    group domain makes the final exchange negligible at any scale."""
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, "orders", sf_dir)
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(delay >= 60, "SLOW")
            .when(delay >= 30, "MEDIUM")
            .otherwise("FAST")
            .alias("ship_bucket"),
            high.alias("high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(F.col("high"), 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# --- Q16: supplier counts per part attribute (NOT-IN exclusion) -----------
@register(
    "q16_supplier_counts",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type <> 'PROMO'
      AND p_size IN {Q16_SIZES}
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct suppliers per (brand, type, size) slice,
    excluding a "complaints" supplier list (acctbal < 0 stands in for
    the comment-scan predicate). The exclusion is a broadcast
    LEFT ANTI join — NOT IN's null-trap semantics without shipping
    the fact table anywhere; count(DISTINCT) expands into Spark's
    two-phase distinct-then-count aggregation on the already-filtered
    slice. Part prunes before broadcast (brand/type/size filters)."""
    p = table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    li = table(spark, "lineitem", sf_dir)
    complaints = (
        table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(complaints), li.l_suppkey == complaints.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


# --- Q20: suppliers with excess supply of small parts ---------------------
@register(
    "q20_excess_suppliers",
    oracle=f"""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > {Q20_MIN_QTY}
    )
    ORDER BY s_name ASC
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's nested semi-join reduction: parts named 'small%'
    → 1996 supply volumes per supplier over those parts → suppliers
    above the volume threshold → supplier⋈nation names. Each stage
    shrinks the key set before the next join touches it; the final
    IN is a broadcast LEFT SEMI join of a key list that is tiny at
    any scale (bounded by #suppliers, not #lineitems)."""
    small_parts = (
        table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(F.broadcast(small_parts), li.l_partkey == small_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy(F.asc("s_name"))
    )
