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
    # events family: broken by the TIMESTAMP_NTZ regression, fixed in
    # round 4 (tables.normalize_events_ts) — every one needs a fresh
    # row on the current engine
    "streaming_session_counts",
    "streaming_stateful_totals",
    "event_gaps",
    "streaming_wordcount",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_enriched_counts",
    "streaming_click_attribution",
    "events_last_order_asof",
    "user_session_counts",
    "events_json_buckets",
    # round-4 TPC-H gap closure (Q2/Q9/Q11/Q12/Q16/Q20 analogs —
    # first-ever rows, must land in this round's budget)
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q12_ship_priority",
    "q16_supplier_counts",
    "q20_excess_suppliers",
    # round-4 pipeline ops (first-ever rows)
    "edit_distance_dups",
    "incremental_exact_dedup",
    "quota_sample_per_source",
    "seq_length_histogram",
    "lineitem_stats_moments",
    "events_zorder_keys",
    "events_hourly_gapfill",
    "dedup_clusters_twostar",
    "incremental_minhash_dups",
    "cms_word_counts",
    "bloom_prefilter_stats",
    "lineitem_unpivot_metrics",
    "user_event_funnel",
    "session_concurrency_hourly",
    "duplicate_passages",
    "trailing_week_revenue",
    "bucketed_revenue_by_status",
    "scd2_customer_upsert",
    "events_rollup_cascade",
    "ann_ivfpq",
    "salted_segment_revenue",
    "unigram_logprob_scores",
    "overlapping_order_pairs",
    # flagship: a fresh row EVERY round, whatever else rotates
    "wordcount",
    # newly registered this round (O4/O5 sink coverage + curation ops)
    "csv_roundtrip",
    "jsonl_roundtrip",
    "config_delimiters_wordcount",
    "console_lines",
    "q21_waiting_suppliers",
    "segment_dedup_summary",
    "training_shard_manifest",
    "bm25_scores",
    "embedding_cluster_sizes",
    "repetition_scores",
    "semantic_dedup",
    "partitioned_events_rollup",
    "synthetic_corpus_wordcount",
    "streaming_synth_wordcount",
    "value_gini_by_event_type",
    "ann_lsh_partitioned",
    "curation_funnel",
    "benchmark_contamination",
    "corpus_mixture",
    "shuffled_shards",
    "cluster_aware_split",
    # never recorded in ANY round: rows-only sketch — outranks entries
    # that carry older rows
    "hll_sketch_rollup",
    # fixed in round 3's extended session (nondeterministic window
    # order) — old rows are stale, but the fix is evidenced by the
    # full-registry sf0.1 sweeps; refreshes here or in round 5
    "running_revenue_per_supplier",
    # r1/r2-only greens: never re-verified on the current Spark
    "ann_pq",
    "ann_bruteforce",
    "ann_lsh",
    "ann_lsh_multiprobe",
    "simhash_fingerprints",
    "simhash_banded_dups",
    "brand_revenue",
    "churned_customers_9596",
    "customer_order_counts_outer",
    "customers_with_urgent_orders",
    "customers_without_orders",
    "lineitem_cube",
    "lineitem_part_price_band",
    "order_price_deciles",
    "orders_by_month",
    "orders_rollup",
    "orders_status_pivot",
    "priority_status_sets",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "repeat_customers_9596",
    "top3_orders_per_customer",
    # r3-green already; rotated below the 50-row budget to make room
    # for r1/r2-only entries above
    "streaming_dedup",
    # no-oracle trio: rows-only driver record (tolerance-tested vs
    # exact twins in tests/test_approx_tolerance.py)
    "compression_ratios",
    "approx_distinct_words",
    "approx_value_quantiles",
    # flagship family (wordcount itself is pinned at the head)
    "sql_wordcount",
    "wordcount_compat",
    "wordcount_per_doc",
    "salted_wordcount",
    "exact_dedup",
    "minhash_lsh_dups",
    "simhash_dups",
    "embedding_dups",
    "dedup_clusters",
    "clean_corpus_summary",
    "ann_ivf",
    "word_doc_frequency",
    "wordcount_topk",
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
        curation_queries,
        dedup_queries,
        join_queries,
        multimodal_queries,
        pipeline_queries,
        relational_queries,
        similarity_queries,
        streaming_queries,
        subquery_queries,
        text_queries,
        tpch_gap_queries,
        tpch_more_queries,
        wordcount_queries,
    )

    ordered = {n: _REGISTRY[n] for n in _PRIORITY if n in _REGISTRY}
    ordered.update((n, v) for n, v in _REGISTRY.items() if n not in ordered)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)
    _LOADED = True
