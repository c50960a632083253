"""Approximate-sketch queries (rows-only driver checks).

HLL / KLL sketches are engine-specific (Spark's HyperLogLog++ vs
DuckDB's approx algorithms produce different estimates), so these
register WITHOUT oracles by design; exact twins with full oracles
exist alongside (word_doc_frequency, order_price_percentiles).
At 100 TB these are the variants you actually run first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.operators.skew import salted_count
from mpi_word_count_spark.registry import register, sql_regex
from mpi_word_count_spark.tables import table
from mpi_word_count_spark.tokenizer import tokenize


@register("approx_distinct_words")  # no oracle: engine-specific sketch
def q_approx_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per language — constant memory
    per group at any cardinality."""
    docs = table(spark, "documents", sf_dir)
    toks = tokenize(docs, col="text", keep=["lang"])
    return toks.groupBy("lang").agg(
        F.approx_count_distinct("word", rsd=0.01).alias("approx_distinct_words")
    )


@register("approx_value_quantiles")  # no oracle: engine-specific sketch
def q_approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per event_type — the sketch twin of
    order_price_percentiles."""
    e = table(spark, "events", sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 2).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.99, 10000)"), 2).alias("p99"),
    )


@register(
    "salted_wordcount",
    oracle=f"""
    SELECT word, count(*) AS count
    FROM (
        SELECT lower(unnest(regexp_split_to_array(text, '{sql_regex()}'))) AS word
        FROM documents
    ) WHERE word <> ''
    GROUP BY word
    """,
)
def q_salted_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship aggregation through the two-phase salted operator
    (skew-proof path for Zipfian keys) — same results, full oracle."""
    docs = table(spark, "documents", sf_dir)
    toks = tokenize(docs, col="text")
    return salted_count(toks, ["word"], salt_buckets=16)


@register("hll_sketch_rollup")  # no oracle: engine-specific sketch bytes
def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pattern that actually runs at
    100 TB: per-group HLL sketches (hll_sketch_agg) are built in ONE
    pass, then UNIONED (hll_union_agg) for the rollup row instead of
    re-scanning the corpus for the global distinct. The per-lang rows
    carry the sketch estimates; the 'ALL' row is the union estimate —
    a re-aggregation of kilobyte sketch states, not data.

    Tolerance-verified against exact countDistinct in
    tests/test_approx_tolerance.py (HLL++ 3-sigma envelope); no DuckDB
    oracle because sketch binaries are engine-specific.
    """
    from mpi_word_count_spark.operators import track_cache

    docs = table(spark, "documents", sf_dir)
    toks = tokenize(docs, col="text", keep=["lang"])
    # cache the kilobyte sketch states: both the per-lang branch and
    # the union row consume them — without this the corpus is scanned
    # and sketched twice (verified: two FileScan nodes, no reuse)
    sketches = track_cache(
        toks.groupBy("lang").agg(F.hll_sketch_agg("word").alias("sk"))
    )
    per_lang = sketches.select(
        "lang", F.hll_sketch_estimate("sk").alias("approx_distinct_words")
    )
    total = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
            "approx_distinct_words"
        )
    ).select(F.lit("ALL").alias("lang"), "approx_distinct_words")
    return per_lang.unionByName(total).orderBy("lang")
