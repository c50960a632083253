"""Quantitative tolerance checks for the no-oracle approx sketches.

The driver records rows-only for `approx_distinct_words` and
`approx_value_quantiles` (HLL++/KLL estimates differ between engines,
so a DuckDB value hash can never match). These tests supply the
correctness claim instead: at sf0.01 the sketch answer must sit
within the sketch's own published error envelope of the EXACT answer
computed on the same engine over the same rows.

- approx_count_distinct(rsd=0.01): |approx-exact|/exact <= 3*rsd
  (three standard errors of an HLL++ estimator).
- approx_percentile(acc=10000): rank error <= 1/acc; verified by
  bounding with exact percentiles at q +/- 3/acc (a 3x safety factor
  on the published bound, same spirit as the 3*rsd test).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mpi_word_count_spark.queries.approx_queries import (
    q_approx_distinct_words,
    q_approx_value_quantiles,
)
from mpi_word_count_spark.tables import table
from mpi_word_count_spark.tokenizer import tokenize

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_words_within_3_rsd(spark):
    approx = {
        r["lang"]: r["approx_distinct_words"]
        for r in q_approx_distinct_words(spark, SF_DIR).collect()
    }
    docs = table(spark, "documents", SF_DIR)
    toks = tokenize(docs, col="text", keep=["lang"])
    exact = {
        r["lang"]: r["exact"]
        for r in toks.groupBy("lang")
        .agg(F.countDistinct("word").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    rsd = 0.01
    for lang, est in approx.items():
        rel_err = abs(est - exact[lang]) / exact[lang]
        assert rel_err <= 3 * rsd, (
            f"lang={lang}: approx={est} exact={exact[lang]} "
            f"rel_err={rel_err:.4f} > {3 * rsd}"
        )


def test_hll_sketch_rollup_within_3_rsd(spark):
    """The mergeable-sketch rollup: per-lang HLL estimates AND the
    sketch-union 'ALL' row must each sit inside the HLL++ error
    envelope of the exact countDistinct on the same rows — including
    the union row, which is computed by merging sketch states, never
    re-scanning the corpus."""
    from mpi_word_count_spark.queries.approx_queries import q_hll_sketch_rollup

    got = {
        r["lang"]: r["approx_distinct_words"]
        for r in q_hll_sketch_rollup(spark, SF_DIR).collect()
    }
    docs = table(spark, "documents", SF_DIR)
    toks = tokenize(docs, col="text", keep=["lang"])
    exact = {
        r["lang"]: r["exact"]
        for r in toks.groupBy("lang")
        .agg(F.countDistinct("word").alias("exact"))
        .collect()
    }
    exact["ALL"] = toks.select("word").distinct().count()
    assert set(got) == set(exact)
    # default lgConfigK=12 → rsd ≈ 1.04/sqrt(2^12) ≈ 1.6%
    rsd = 1.04 / (2**12) ** 0.5
    for lang, est in got.items():
        rel_err = abs(est - exact[lang]) / exact[lang]
        assert rel_err <= 3 * rsd, (lang, est, exact[lang])


def test_approx_value_quantiles_within_rank_error(spark):
    """approx_percentile returns an ACTUAL data point whose rank is
    within n/accuracy of the target rank (GK sketch guarantee). With
    n≈2000 per group and accuracy=10000 that's <1 row, so the returned
    value must be one of the order statistics within ±2 of the exact
    rank (±1 sketch drift, ±1 for the discrete-vs-interpolated rank
    convention). Verified against the exactly-sorted per-group values."""
    import numpy as np

    approx = {
        r["event_type"]: (r["p50"], r["p99"])
        for r in q_approx_value_quantiles(spark, SF_DIR).collect()
    }
    e = table(spark, "events", SF_DIR)
    pdf = e.select("event_type", "value").toPandas()
    assert set(approx) == set(pdf["event_type"].unique())
    for et, (p50, p99) in approx.items():
        vals = np.sort(pdf.loc[pdf["event_type"] == et, "value"].to_numpy())
        n = len(vals)
        for q, got in ((0.5, p50), (0.99, p99)):
            k = int(round(q * (n - 1)))
            lo = vals[max(0, k - 2)]
            hi = vals[min(n - 1, k + 2)]
            # the registered query rounds to 2 decimals; pad the bracket
            assert lo - 0.01 <= got <= hi + 0.01, (
                f"{et} q={q}: approx={got} outside order-statistic "
                f"bracket [{lo}, {hi}] (n={n}, rank {k}±2)"
            )


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
