"""Privacy-engineering queries: k-anonymity / l-diversity audits and
differential-privacy release mechanisms (central Laplace + local
randomized response).

A 100 TB training-data platform does not just redact PII
(text_queries.py pii_redaction_stats) and cascade erasures
(governance_queries.py user_erasure_audit) — before any aggregate
leaves the platform it has to answer "how re-identifiable is this
slice?" (k-anonymity over the quasi-identifiers actually published)
and "what noise does this release carry?" (a calibrated DP
mechanism). These queries make both first-class, oracle-verified
operators.

Determinism device: every stochastic draw is the md5-uniform
`sample_hash_u` (operators/curation.py) seeded by the RELEASED CELL's
key — one draw per released statistic for the central mechanism, one
draw per contributor for the local one — replicated verbatim in the
DuckDB oracle, so the noisy outputs are bit-reproducible across
engines, partitionings, and retries (the same reproducibility
contract dsir_gumbel_sample established for Gumbel noise).

Reference parity note: the reference engine (word_count_mpi.c) has no
privacy surface; these extend the platform the way SURVEY.md §2's
north-star families prescribe, on the governance side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.functions.hashing import sql_hash32
from mpi_word_count_spark.functions.parity import (
    portable_round,
    sql_portable_round,
)
from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table

# ---------------------------------------------------------------------------
# k-anonymity / l-diversity generalization ladder
# ---------------------------------------------------------------------------

# "a class this small is re-identifiable" — the conventional k.
K_THRESHOLD = 5

_KANON_ORACLE = f"""
    WITH qi AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
               c_acctbal AS sensitive
        FROM customer
    ),
    classes AS (
        SELECT GROUPING(nat, seg, band) AS gid,
               count(*) AS class_n,
               count(DISTINCT sensitive) AS l_div
        FROM qi
        GROUP BY ROLLUP (nat, seg, band)
    )
    SELECT CASE gid WHEN 0 THEN 'nation+segment+band'
                    WHEN 1 THEN 'nation+segment'
                    WHEN 3 THEN 'nation'
                    ELSE 'all' END AS qi_level,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(class_n) AS BIGINT) AS k_anonymity,
           CAST(min(l_div) AS BIGINT) AS l_diversity,
           CAST(sum(class_n) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN class_n < {K_THRESHOLD}
                                  THEN class_n END), 0) AS BIGINT)
               AS rows_at_risk,
           {sql_portable_round(
               f'coalesce(sum(CASE WHEN class_n < {K_THRESHOLD} '
               'THEN class_n END), 0) / sum(class_n)', 4)}
               AS pct_at_risk
    FROM classes
    GROUP BY 1
"""


@register("k_anonymity_audit", oracle=_KANON_ORACLE)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit across a GENERALIZATION LADDER
    (Sweeney 2002; Machanavajjhala 2007): for each release candidate —
    the full quasi-identifier (nation, market segment, account-balance
    band), then each coarser generalization — the minimum equivalence-
    class size (k), the minimum count of distinct sensitive values per
    class (l), and how many rows sit in classes smaller than
    k=K_THRESHOLD. The ladder is what a disclosure-review board
    actually reads: it shows exactly how much generalization buys how
    much protection.

    Spark-first shape: ONE `rollup()` aggregation computes every
    ladder level in a single shuffle (Expand ×4 map-side, partial
    hash-agg before the exchange) — never one scan per level; the
    second aggregate runs over the class table, which is bounded by
    QI-domain cardinality (model-sized at any corpus scale, ~10³ rows
    here and at 100 TB alike). l-diversity's count(DISTINCT) rides the
    same grouping-sets plan."""
    c = table(spark, "customer", sf_dir)
    qi = c.select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("band"),
        F.col("c_acctbal").alias("sensitive"),
    )
    classes = qi.rollup("nat", "seg", "band").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("class_n"),
        F.countDistinct("sensitive").alias("l_div"),
    )
    at_risk = F.coalesce(
        F.sum(F.when(F.col("class_n") < K_THRESHOLD, F.col("class_n"))),
        F.lit(0),
    )
    return classes.groupBy(
        F.when(F.col("gid") == 0, "nation+segment+band")
        .when(F.col("gid") == 1, "nation+segment")
        .when(F.col("gid") == 3, "nation")
        .otherwise("all")
        .alias("qi_level")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("class_n").cast("bigint").alias("k_anonymity"),
        F.min("l_div").cast("bigint").alias("l_diversity"),
        F.sum("class_n").cast("bigint").alias("n_rows"),
        at_risk.cast("bigint").alias("rows_at_risk"),
        portable_round(at_risk / F.sum("class_n"), 4).alias("pct_at_risk"),
    )


# ---------------------------------------------------------------------------
# Central DP: Laplace-noised count release
# ---------------------------------------------------------------------------

_DP_EPSILONS = (0.5, 1.0, 2.0)


def _laplace_sql(n_expr: str, u_expr: str, eps: float) -> str:
    """count + Laplace(sensitivity/eps) via inverse-CDF on the
    md5-uniform: -sign(u-0.5)/eps * ln(1 - 2|u-0.5|). Identical text
    on both engines; u=(k+0.5)/2^32 is never exactly 0.5 and
    1-2|u-0.5| is never 0, so sign/ln are total."""
    return (
        f"({n_expr} - (1.0 / {eps}) * sign({u_expr} - 0.5)"
        f" * ln(1.0 - 2.0 * abs({u_expr} - 0.5)))"
    )


def _dp_oracle() -> str:
    cols = []
    for eps in _DP_EPSILONS:
        tag = str(eps).replace(".", "_")
        u = f"(({sql_hash32('event_type', f'dp{eps}')} + 0.5) / 4294967296.0)"
        cols.append(
            sql_portable_round(_laplace_sql("count(*)", u, eps), 4)
            + f" AS noisy_n_eps_{tag}"
        )
    return f"""
    SELECT event_type, {', '.join(cols)}
    FROM events
    GROUP BY 1
    """


@register("dp_event_counts", oracle=_dp_oracle())
def q_dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Central-model differential privacy: release per-event-type
    counts under the Laplace mechanism (Dwork et al. 2006) at three
    privacy budgets. A count query has sensitivity 1, so each release
    adds Laplace(1/ε) noise — drawn ONCE PER RELEASED CELL from the
    cell-key-seeded md5-uniform through the Laplace inverse CDF, which
    is exactly how a production curator makes a DP release replayable
    (re-running the release must not spend fresh budget). The true
    count never appears in the output.

    Scale shape: the corpus-sized work is one partial-aggregated
    count shuffle (identical to wordcount's); the noise is O(released
    cells) arithmetic on the aggregate — mechanism cost is independent
    of data size. ε ladder in one pass, not one scan per ε."""
    from mpi_word_count_spark.operators.curation import sample_hash_u

    ev = table(spark, "events", sf_dir)
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    cols = [F.col("event_type")]
    for eps in _DP_EPSILONS:
        tag = str(eps).replace(".", "_")
        u = sample_hash_u(F.col("event_type"), f"dp{eps}")
        noise = (
            -(F.lit(1.0) / F.lit(eps))
            * F.signum(u - 0.5)
            * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
        )
        cols.append(
            portable_round(F.col("n") + noise, 4).alias(f"noisy_n_eps_{tag}")
        )
    return agg.select(*cols)


# ---------------------------------------------------------------------------
# Local DP: randomized response
# ---------------------------------------------------------------------------

_RR_ORACLE = f"""
    WITH resp AS (
        SELECT user_id % 10 AS cohort,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s,
               CASE WHEN (({sql_hash32("CAST(event_id AS VARCHAR)", "rrkeep")}
                           + 0.5) / 4294967296.0) < 0.5
                    THEN CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    ELSE CASE WHEN (({sql_hash32("CAST(event_id AS VARCHAR)",
                                                 "rrcoin")}
                                     + 0.5) / 4294967296.0) < 0.5
                              THEN 1 ELSE 0 END
               END AS r
        FROM events
    )
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(r) AS BIGINT) AS reported_yes,
           (2.0 * sum(r) - count(*) / 2.0) AS est_yes,
           CAST(sum(s) AS BIGINT) AS true_yes
    FROM resp
    GROUP BY 1
"""


@register("dp_randomized_response", oracle=_RR_ORACLE)
def q_dp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-model differential privacy: Warner's randomized response
    (1965) on a per-event sensitive bit (did the event convert to a
    purchase?). Each CONTRIBUTOR flips coins — keep-coin heads: answer
    truthfully; tails: answer a fresh fair coin — so the collector
    never learns any individual bit (ε = ln 3), yet the per-cohort
    proportion debiases exactly: E[yes] = n/4 + true/2, so
    est = 2·yes − n/2. Both coins are md5-uniforms seeded by event_id,
    making every response (not just the aggregate) reproducible.
    `true_yes` is emitted HERE so the driver hash also locks the
    estimator's calibration target; a production release drops it.

    Scale shape: the mechanism is a per-row projection (stays inside
    whole-stage codegen — two md5s and a CASE), then one
    partial-aggregated groupBy(cohort). Noise cost scales with rows
    scanned, shuffle with cohorts: the local-DP shape by definition."""
    from mpi_word_count_spark.operators.curation import sample_hash_u

    ev = table(spark, "events", sf_dir)
    s = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    keep = sample_hash_u(F.col("event_id").cast("string"), "rrkeep") < 0.5
    coin = F.when(
        sample_hash_u(F.col("event_id").cast("string"), "rrcoin") < 0.5, 1
    ).otherwise(0)
    resp = ev.select(
        (F.col("user_id") % 10).alias("cohort"),
        s.alias("s"),
        F.when(keep, s).otherwise(coin).alias("r"),
    )
    return resp.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("reported_yes"),
        (2.0 * F.sum("r") - F.count(F.lit(1)) / 2.0).alias("est_yes"),
        F.sum("s").cast("bigint").alias("true_yes"),
    )
