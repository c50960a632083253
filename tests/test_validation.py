"""Detection tests for the data-quality operators: each rule family
must actually CATCH planted violations (the fixture is clean on most
rules, so oracle parity alone would let a vacuous always-zero
implementation pass), plus OHLC semantics on a hand-computable frame."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mpi_word_count_spark.operators.validation import (
    Rule,
    check_reference,
    check_rules,
    check_unique,
    quality_report,
)


def _by_rule(df):
    return {r["rule"]: (r["violations"], r["checked"]) for r in df.collect()}


def test_check_rules_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 0.0)],
        "id long, amount double",
    )
    out = _by_rule(
        check_rules(
            df,
            [
                Rule(
                    "amount_positive",
                    F.col("amount").isNull() | (F.col("amount") <= 0),
                ),
                Rule("amount_nonnull", F.col("amount").isNull()),
            ],
        )
    )
    assert out["amount_positive"] == (3, 4)
    assert out["amount_nonnull"] == (1, 4)


def test_check_unique_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (2, 1), (2, 2)], "a long, b long"
    )
    out = _by_rule(check_unique(df, "pk", ["a", "b"]))
    assert out["pk"] == (2, 5)  # three copies of (1,1) → 2 extras


def test_check_reference_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (3,), (3,)], "fk long")
    parent = spark.createDataFrame([(1,), (5,)], "pk long")
    out = _by_rule(check_reference(child, parent, "fk_exists", "fk", "pk"))
    assert out["fk_exists"] == (3, 4)  # 2, 3, 3 are orphans


def test_quality_report_union_is_sorted_and_complete(spark):
    a = check_unique(
        spark.createDataFrame([(1,)], "x long"), "z_rule", ["x"]
    )
    b = check_unique(
        spark.createDataFrame([(1,)], "x long"), "a_rule", ["x"]
    )
    rules = [r["rule"] for r in quality_report([a, b]).collect()]
    assert rules == ["a_rule", "z_rule"]


def test_ohlc_picks_first_and_last_by_time_then_id(spark):
    t = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # same hour, same ts for ids 1/2 → id breaks the tie
        (2, t, "click", 20.0),
        (1, t, "click", 10.0),
        (3, datetime(2024, 1, 1, 10, 59, 0), "click", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    from mpi_word_count_spark.queries.validation_queries import _order_key

    got = (
        df.groupBy("event_type")
        .agg(
            F.min_by("value", _order_key()).alias("open"),
            F.max_by("value", _order_key()).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
        )
        .collect()[0]
    )
    assert got["open"] == 10.0  # earliest ts, lowest id
    assert got["close"] == 5.0  # latest ts
    assert got["high"] == 20.0 and got["low"] == 5.0


def test_ewma_exactness_on_known_series(spark):
    """Hand-computable case: constant series -> ewma equals the level
    (up to the truncated-window deficit during warmup), and a planted
    3x burst after warmup must flag."""
    from datetime import datetime, timezone

    from mpi_word_count_spark.queries.validation_queries import _EWMA_LAGS

    # build 20 hourly buckets of 64 events, then one hour of 192
    rows = []
    eid = 0
    for h in range(21):
        n = 192 if h == 20 else 64
        for i in range(n):
            rows.append(
                (
                    eid,
                    datetime(2024, 1, 1, tzinfo=timezone.utc).replace(hour=0)
                    .fromtimestamp(1704067200 + h * 3600 + i, tz=timezone.utc),
                    1,
                    "burst",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.createOrReplaceTempView("_ewma_fixture")

    import mpi_word_count_spark.queries.validation_queries as vq
    from mpi_word_count_spark import tables

    orig = tables.table
    try:
        tables.table = lambda spark_, name, sf_dir: (
            df if name == "events" else orig(spark_, name, sf_dir)
        )
        vq_table = vq.table
        vq.table = tables.table
        out = {
            r["hour"]: r
            for r in vq.q_events_ewma_hourly(spark, "unused").collect()
        }
    finally:
        tables.table = orig
        vq.table = vq_table
    hours = sorted(out)
    # fully warmed constant rows: ewma == 64000 milli exactly
    warmed_constant = hours[_EWMA_LAGS : 20]
    assert warmed_constant
    for h in warmed_constant:
        # sum_{k=1..16} 64*2^(16-k) = 64*(2^16-1) -> exactly 64.000
        assert out[h]["ewma_milli"] == 64000, (h, out[h])
        assert not out[h]["spike"]
    # the burst hour: 192 > 2 * 64 -> spike
    assert out[hours[20]]["n_events"] == 192
    assert out[hours[20]]["spike"]


def test_benford_audit_flags_uniform_prices(spark):
    """TPC-H prices are uniform-ish, not Benford: every digit present,
    observed proportions sum to 1, counts sum to the table size, and
    the chi-square total is far beyond the df=8 critical value (the
    audit correctly screams 'synthetic')."""
    from mpi_word_count_spark.queries.validation_queries import (
        q_benford_price_audit,
    )
    from tests.conftest import SF_DIR

    rows = q_benford_price_audit(spark, SF_DIR).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r["n_obs"] for r in rows) == n_orders
    assert abs(sum(r["p_obs"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["p_benford"] for r in rows) - 1.0) < 1e-6
    chi2 = sum(r["chi2_term"] for r in rows)
    assert chi2 > 15.51  # chi2_0.95, df=8

    # mechanism calibration: a Benford-distributed sample passes —
    # recompute the statistic the query's formula produces on planted
    # counts proportional to log10(1+1/d)
    import math

    n = 100000
    obs = [round(n * math.log10(1 + 1 / d)) for d in range(1, 10)]
    tot = sum(obs)
    chi2_planted = sum(
        (o - tot * math.log10(1 + 1 / d)) ** 2 / (tot * math.log10(1 + 1 / d))
        for d, o in zip(range(1, 10), obs)
    )
    assert chi2_planted < 15.51
