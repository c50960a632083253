"""Flagship word-count queries over the `documents` fixture.

These re-express the reference's single fixed query (SURVEY.md §3)
over the fixture table (documents.text stands in for the corpus
directory — FIXTURES.md F3) plus its natural extensions (top-k,
per-document lineage counts, document frequency).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.operators.wordcount import top_k_words, word_count_df
from mpi_word_count_spark.registry import register, sql_regex
from mpi_word_count_spark.tables import table
from mpi_word_count_spark.tokenizer import tokenize

_TOKS = f"""
    SELECT lower(unnest(regexp_split_to_array(text, '{sql_regex()}'))) AS word
    FROM documents
"""

_TOKS_DOC = f"""
    SELECT doc_id,
           lower(unnest(regexp_split_to_array(text, '{sql_regex()}'))) AS word
    FROM documents
"""


@register(
    "wordcount",
    oracle=f"""
    SELECT word, count(*) AS count
    FROM ({_TOKS}) WHERE word <> ''
    GROUP BY word ORDER BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S4: the reference's fixed query (word_count_mpi.c pipeline)."""
    return word_count_df(table(spark, "documents", sf_dir), col="text")


@register(
    "sql_wordcount",
    oracle=f"""
    SELECT word, count(*) AS count
    FROM ({_TOKS}) WHERE word <> ''
    GROUP BY word ORDER BY word
    """,
)
def sql_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same flagship query through the SQL entry point
    (`spark.sql` + temp view) — the engine's second query API. The
    delimiter regex is bound as a named parameter, so the alphabet
    stays a literal byte list (S1) and never meets SQL string
    escaping. Catalyst plans this identically to the DataFrame form
    (same Exchange/HashAggregate shape — one plan, two front ends).
    """
    from mpi_word_count_spark.tokenizer import DEFAULT_DELIMITERS, delimiter_regex

    table(spark, "documents", sf_dir).createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT word, count(*) AS count
        FROM (
            SELECT explode(
                filter(split(lower(text), :rx), x -> x <> '')
            ) AS word
            FROM documents_v
        )
        GROUP BY word
        ORDER BY word
        """,
        args={"rx": delimiter_regex(DEFAULT_DELIMITERS)},
    )


@register(
    "wordcount_topk",
    oracle=f"""
    SELECT word, count(*) AS count
    FROM ({_TOKS}) WHERE word <> ''
    GROUP BY word ORDER BY count DESC, word ASC LIMIT 100
    """,
)
def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 words: TakeOrderedAndProject, no global sort (M1)."""
    return top_k_words(table(spark, "documents", sf_dir), col="text", k=100)


@register(
    "wordcount_per_doc",
    oracle=f"""
    SELECT doc_id, word, count(*) AS count
    FROM ({_TOKS_DOC}) WHERE word <> ''
    GROUP BY doc_id, word
    """,
)
def wordcount_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document counts — the per-file lineage the reference keeps
    via its sorted dirent array (word_count_mpi.c:88-97)."""
    docs = table(spark, "documents", sf_dir)
    toks = tokenize(docs, col="text", keep=["doc_id"])
    return toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("count"))


@register(
    "csv_roundtrip",
    oracle=f"""
    SELECT word, count(*) AS count
    FROM ({_TOKS}) WHERE word <> ''
    GROUP BY word ORDER BY word
    """,
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O5 sink parity: flagship result → `write_word_count_csv`
    (single file, `Word,Count` header — word_count_mpi.c:132-142) →
    read back with an explicit schema → same rows as the in-memory
    result. Exercises the full write/read sink path the reference's
    csv_results.csv consumer sees; the roundtrip must be lossless so
    the oracle is the flagship wordcount SQL itself.
    """
    import tempfile

    from mpi_word_count_spark.sinks import write_word_count_csv

    out = word_count_df(table(spark, "documents", sf_dir), col="text")
    path = os.path.join(tempfile.mkdtemp(prefix="csv_roundtrip_"), "csv_results.csv")
    write_word_count_csv(out, path)
    return (
        spark.read.option("header", True)
        .schema("Word STRING, Count BIGINT")
        .csv(path)
        .withColumnRenamed("Word", "word")
        .withColumnRenamed("Count", "count")
        .orderBy("word")
    )


@register(
    "jsonl_roundtrip",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink roundtrip — the interchange format of LLM
    training corpora. documents → df.write.json (one JSON object per
    line, multi-line text escaped) → read back with an explicit schema
    (never infer at scale: inference is a full extra pass over 100 TB)
    → per-lang summary. Lossless roundtrip means the summary equals
    the same aggregate computed directly on the parquet table.
    """
    import tempfile

    docs = table(spark, "documents", sf_dir).select("doc_id", "lang", "text")
    path = os.path.join(tempfile.mkdtemp(prefix="jsonl_rt_"), "docs.jsonl")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id BIGINT, lang STRING, text STRING").json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )


@register(
    "word_doc_frequency",
    oracle=f"""
    SELECT word,
           count(DISTINCT doc_id) AS doc_freq,
           count(*) AS total_count
    FROM ({_TOKS_DOC}) WHERE word <> ''
    GROUP BY word
    """,
)
def word_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency (distinct-agg exemplar; feeds TF-IDF)."""
    docs = table(spark, "documents", sf_dir)
    toks = tokenize(docs, col="text", keep=["doc_id"])
    return toks.groupBy("word").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_count"),
    )
