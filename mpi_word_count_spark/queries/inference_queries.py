"""Batch model-inference queries: broadcast-model scoring of the
corpus (operators/inference.py), value-hash-verified — the oracle
rebuilds the deterministic demo weight table from the same md5
formula and replays the identical integer dot product in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mpi_word_count_spark.functions.hashing import sql_hash32
from mpi_word_count_spark.functions.parity import sql_portable_round
from mpi_word_count_spark.operators.inference import (
    FEATURE_DIM,
    FEATURE_SEED,
    WEIGHT_SEED,
    demo_weights,
    hashed_linear_scores,
)
from mpi_word_count_spark.registry import register, sql_regex
from mpi_word_count_spark.tables import table


def _inference_oracle() -> str:
    score = sql_portable_round(
        "coalesce(s.logit_milli, 0) / (1000.0 * s.n_tokens)", 6
    )
    return f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{sql_regex()}'),
                           x -> x <> '') AS t
        FROM documents
    ),
    terms AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY 1, 2
    ),
    w AS (
        SELECT j,
               {sql_hash32("j::VARCHAR", WEIGHT_SEED)} % 2001 - 1000 AS w_int
        FROM range(0, {FEATURE_DIM}) t(j)
    ),
    s AS (
        SELECT t.doc_id,
               CAST(sum(t.tf) AS BIGINT) AS n_tokens,
               CAST(sum(t.tf * w.w_int) AS BIGINT) AS logit_milli
        FROM terms t
        JOIN w ON ({sql_hash32("t.term", FEATURE_SEED)} % {FEATURE_DIM}) = w.j
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(s.logit_milli, 0) AS BIGINT) AS logit_milli,
           CASE WHEN coalesce(s.n_tokens, 0) = 0 THEN 0.0
                ELSE {score} END AS score,
           coalesce(s.logit_milli, 0) >= 0 AS keep
    FROM documents d LEFT JOIN s USING (doc_id)
    """


@register("model_quality_scores", oracle=_inference_oracle())
def q_model_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: every document scored by a
    broadcast linear classifier over hashed unigram features — the
    CCNet/fasttext-filter pattern as one tokenize pass + one broadcast
    join + two hash aggregations, integer-exact end to end."""
    docs = table(spark, "documents", sf_dir)
    return hashed_linear_scores(docs, demo_weights(spark))


def _streaming_inference_oracle() -> str:
    from mpi_word_count_spark.sources.synthetic import sql_synth_corpus_cte

    score = sql_portable_round("s.logit_milli / (1000.0 * s.n_tokens)", 6)
    return f"""
    WITH {sql_synth_corpus_cte(1000, "synth")},
    terms AS (
        SELECT doc_id, word AS term, count(*) AS tf
        FROM synth_words GROUP BY 1, 2
    ),
    w AS (
        SELECT j,
               {sql_hash32("j::VARCHAR", WEIGHT_SEED)} % 2001 - 1000 AS w_int
        FROM range(0, {FEATURE_DIM}) t(j)
    ),
    s AS (
        SELECT t.doc_id,
               CAST(sum(t.tf) AS BIGINT) AS n_tokens,
               CAST(sum(t.tf * w.w_int) AS BIGINT) AS logit_milli
        FROM terms t
        JOIN w ON ({sql_hash32("t.term", FEATURE_SEED)} % {FEATURE_DIM}) = w.j
        GROUP BY 1
    )
    SELECT doc_id, n_tokens, logit_milli, {score} AS score,
           logit_milli >= 0 AS keep
    FROM s
    """


@register("streaming_model_scores", oracle=_streaming_inference_oracle())
def q_streaming_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING model inference: the synth connector emits the corpus
    in 5 micro-batches and every arriving document is scored by the
    stateless literal-model expression — append mode, zero streaming
    state, each doc scored exactly once on arrival. The oracle scores
    the whole regenerated corpus in batch SQL, so batch/stream parity
    of the inference path is value-hash-verified (the synth corpus has
    no empty docs, so the append stream and the batch oracle cover the
    same rows)."""
    from mpi_word_count_spark.operators.inference import (
        hashed_linear_scores_stateless,
    )
    from mpi_word_count_spark.sources.synthetic import register_synth_source
    from mpi_word_count_spark.streaming.core import run_to_completion

    register_synth_source(spark)
    stream = (
        spark.readStream.format("synthcorpus")
        .option("n_docs", 1000)
        .option("seed", "synth")
        .option("batch_docs", 200)
        .load()
    )
    return run_to_completion(hashed_linear_scores_stateless(stream), "append")
