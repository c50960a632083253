"""Quantitative tolerance checks for the approximate sketches.

The sketch queries now carry their own verification: each emits the
EXACT answer (hash-compared against DuckDB by the driver) plus a
boolean asserting the sketch estimate sits inside the estimator's
published error envelope. These tests lock the envelope claim
locally — every band boolean must be TRUE at sf0.01 — and
independently recompute the exact side so the booleans can't pass
vacuously:

- approx_count_distinct(rsd=0.01): |approx-exact|/exact <= 3*rsd
  (three standard errors of an HLL++ estimator).
- hll_sketch_agg(lgConfigK=12): same 3-sigma envelope with
  rsd = 1.04/sqrt(2^12), including the sketch-union 'ALL' row.
- approx_percentile(acc=10000): rank error <= n/acc = 1e-4; the
  estimate must lie between exact percentiles at q±0.005 (50x
  safety margin, still a tight value claim).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_word_count_spark.queries.approx_queries import (
    q_approx_distinct_words,
    q_approx_value_quantiles,
    q_hll_sketch_rollup,
)
from mpi_word_count_spark.tables import table
from mpi_word_count_spark.tokenizer import tokenize

SF_DIR = "/root/testdata/sf0.01"


def _exact_distinct_by_lang(spark):
    docs = table(spark, "documents", SF_DIR)
    toks = tokenize(docs, col="text", keep=["lang"])
    return toks, {
        r["lang"]: r["exact"]
        for r in toks.groupBy("lang")
        .agg(F.countDistinct("word").alias("exact"))
        .collect()
    }


def test_approx_distinct_words_in_band_and_exact(spark):
    rows = q_approx_distinct_words(spark, SF_DIR).collect()
    assert rows
    assert all(r["within_tolerance"] for r in rows), [
        r["lang"] for r in rows if not r["within_tolerance"]
    ]
    # the exact column is a real countDistinct, not a constant
    _, exact = _exact_distinct_by_lang(spark)
    got = {r["lang"]: r["exact_distinct_words"] for r in rows}
    assert got == exact


def test_hll_sketch_rollup_in_band_and_exact(spark):
    """Per-lang HLL estimates AND the sketch-union 'ALL' row must sit
    inside the HLL++ envelope (the query's own booleans), and the
    exact side must match an independent computation — including the
    'ALL' row, which is the GLOBAL distinct (words shared across
    languages counted once), not the sum of per-lang counts."""
    rows = q_hll_sketch_rollup(spark, SF_DIR).collect()
    got = {r["lang"]: r["exact_distinct_words"] for r in rows}
    assert all(r["within_tolerance"] for r in rows), [
        r["lang"] for r in rows if not r["within_tolerance"]
    ]
    toks, exact = _exact_distinct_by_lang(spark)
    exact["ALL"] = toks.select("word").distinct().count()
    assert got == exact
    assert got["ALL"] < sum(v for k, v in got.items() if k != "ALL")


def test_approx_value_quantiles_in_band_and_exact(spark):
    """The band booleans must hold, and the exact p50/p99 columns must
    match numpy's interpolated percentile (same definition as Spark
    `percentile` / DuckDB quantile_cont) within rounding."""
    import numpy as np

    rows = q_approx_value_quantiles(spark, SF_DIR).collect()
    assert rows
    assert all(r["p50_in_band"] and r["p99_in_band"] for r in rows)
    e = table(spark, "events", SF_DIR)
    pdf = e.select("event_type", "value").toPandas()
    assert {r["event_type"] for r in rows} == set(pdf["event_type"].unique())
    for r in rows:
        vals = pdf.loc[pdf["event_type"] == r["event_type"], "value"].to_numpy()
        assert abs(r["p50"] - np.percentile(vals, 50)) <= 0.01
        assert abs(r["p99"] - np.percentile(vals, 99)) <= 0.01


def test_cms_never_underestimates(spark):
    """Count-min's one-sided error guarantee: estimate ≥ exact for
    EVERY word, not just the reported top-20."""
    from pyspark.sql import functions as F

    from mpi_word_count_spark.operators.sketches import cms_counters, cms_estimates
    from mpi_word_count_spark.tables import table
    from mpi_word_count_spark.tokenizer import tokenize
    from tests.conftest import SF_DIR

    words = tokenize(table(spark, "documents", SF_DIR), col="text").select("word")
    counters = cms_counters(words, "word")
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimates(counters, exact.select("word"), "word")
    bad = (
        exact.join(est, "word")
        .filter(F.col("cms_estimate") < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_bloom_no_false_negatives(spark):
    """Bloom's one-sided guarantee: every batch doc that IS in the
    corpus must probe positive; false-positive rate stays sane for
    1024 bits / 4 hashes at fixture cardinality."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["bloom_prefilter_stats"](spark, SF_DIR).collect()
    assert all(r["might_contain"] for r in rows if r["in_corpus"])
    negatives = [r for r in rows if not r["in_corpus"]]
    if negatives:
        fp = sum(1 for r in negatives if r["might_contain"]) / len(negatives)
        assert fp < 0.5, fp
    del F


def test_hll_intersection_in_band_and_exact(spark):
    """The inclusion-exclusion estimate must sit inside the compounded
    3-sigma envelope (the query's boolean), the exact side must match
    an independent recomputation, and the sets must genuinely
    partially overlap (non-degenerate fixture split)."""
    from pyspark.sql import functions as F

    from mpi_word_count_spark.queries.approx_queries import (
        q_hll_set_intersection,
    )
    from mpi_word_count_spark.tables import table

    row = q_hll_set_intersection(spark, SF_DIR).collect()[0]
    assert row["within_tolerance"]
    e = table(spark, "events", SF_DIR)
    a = {
        r["user_id"]
        for r in e.filter(
            (F.col("event_type") == "click") & (F.col("value") > 90)
        ).select("user_id").distinct().collect()
    }
    b = {
        r["user_id"]
        for r in e.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > 90)
        ).select("user_id").distinct().collect()
    }
    assert row["exact_a"] == len(a)
    assert row["exact_b"] == len(b)
    assert row["exact_intersection"] == len(a & b)
    # genuinely partial overlap: neither set contains the other
    assert a - b and b - a and a & b


def test_bloom_fpr_audit_properties(spark):
    """Zero false negatives (the safety property), and the measured
    FPR sits near the textbook (1-e^{-kn/m})^k for this load — within
    a factor of 2, which at n_negatives~100 covers binomial noise."""
    from mpi_word_count_spark.queries.approx_queries import (
        q_bloom_fpr_audit,
    )

    r = q_bloom_fpr_audit(spark, SF_DIR).collect()[0]
    assert r["n_false_negatives"] == 0
    assert r["n_negatives"] > 0
    assert r["theoretical_fpr"] > 0
    assert r["measured_fpr"] <= 2 * r["theoretical_fpr"] + 0.05
    assert r["measured_fpr"] >= r["theoretical_fpr"] / 2 - 0.05
