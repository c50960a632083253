"""Central query registry: the driver-facing contract.

Every implemented operator from SURVEY.md §2 registers here as
  name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
The oracle SQL is ANSI SQL runnable by DuckDB over the same parquet
fixtures (views: region nation customer supplier part orders lineitem
events documents embeddings). Column names/aliases MUST match the
Spark result exactly — the driver sorts columns by name and hashes
values.

Numeric discipline for oracle parity: floating aggregates are rounded
to a fixed number of decimals on BOTH sides (summation order differs
between engines; last-bit drift would break the hash). Timestamps are
emitted as ISO strings or dates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mpi_word_count_spark.tokenizer import DEFAULT_DELIMITERS, delimiter_regex

SparkQuery = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def sql_regex() -> str:
    """The tokenizer character class, escaped for embedding in a
    single-quoted SQL literal (RE2-compatible, see tokenizer.py)."""
    return delimiter_regex(DEFAULT_DELIMITERS).replace("'", "''")


_LOADED = False

# Driver-verification priority: the per-round correctness harness checks
# registry entries in insertion order with a bounded budget, so queries
# that have never had a CORRECTNESS row (dark through round 2) and queries
# whose defects were fixed this round come FIRST; long-green queries take
# the later slots and rotate back in on subsequent rounds.
_PRIORITY = [
    # flagship + never-verified wordcount family
    "wordcount",
    "sql_wordcount",
    "wordcount_topk",
    "wordcount_per_doc",
    "word_doc_frequency",
    "csv_roundtrip",
    # fixed this round (need fresh rows to confirm)
    "clean_corpus_summary",
    "media_features",
    "media_frames",
    "simhash_dups",
    "embedding_dups",
    "ann_ivf",
    # never-verified text-analysis family
    "token_stats",
    "lang_id",
    "quality_scores",
    "doc_fingerprints",
    "tfidf_top_terms",
    "doc_chunks",
    "packed_sequences",
    "bigram_counts",
    "bigram_pmi",
    "scrubbed_docs",
    "compression_ratios",
    "hash_sample_documents",
    # never-verified TPC-H analogs
    "q4_late_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_suppliers",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q22_dormant_rich_customers",
    # never-verified streaming queries
    "streaming_session_counts",
    "streaming_stateful_totals",
    "streaming_dedup",
]


def _load_all() -> None:
    """Import every query module so its @register calls run, then
    apply the driver-verification priority order."""
    global _LOADED
    if _LOADED:
        return
    from mpi_word_count_spark.queries import (  # noqa: F401
        advanced_queries,
        approx_queries,
        dedup_queries,
        join_queries,
        multimodal_queries,
        pipeline_queries,
        relational_queries,
        similarity_queries,
        streaming_queries,
        subquery_queries,
        text_queries,
        tpch_more_queries,
        wordcount_queries,
    )

    ordered = {n: _REGISTRY[n] for n in _PRIORITY if n in _REGISTRY}
    ordered.update((n, v) for n, v in _REGISTRY.items() if n not in ordered)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)
    _LOADED = True
