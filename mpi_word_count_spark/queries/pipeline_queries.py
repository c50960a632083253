"""End-to-end training-data curation pipeline (north star flagship):

    quality filter (Gopher-style alpha/length gates)
    → language-agreement filter (predicted == recorded lang)
    → exact dedup (min doc_id canonical per content hash)
    → per-source corpus summary (docs kept, BPE-ish token budget)

One registered query composes the text-analysis and dedup operator
families — the shape of a real 100 TB curation job. Each stage is a
narrow projection or a hash-key shuffle (quality/lang are per-doc
projections + one tiny broadcast join; dedup shuffles 16-byte md5
keys; the summary shuffles |sources| rows), so the composition adds
no operator-level scale risk beyond its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.operators.textanalysis import (
    LANG_MARKERS,
    doc_metrics,
    predicted_language,
)
from mpi_word_count_spark.registry import register, sql_regex
from mpi_word_count_spark.tables import table

MIN_ALPHA_RATIO = 0.5
MIN_TOKENS = 50


def clean_corpus_summary(docs: DataFrame) -> DataFrame:
    """documents → per-source summary of the cleaned corpus.

    Plan shape (audited via .explain, see git history for the naive
    versions): ONE doc_metrics projection carries every narrow metric
    (quality gates, BPE token count, content hash) — no per-doc metric
    joins; the only doc_id join is with predicted_language, which
    genuinely needs its own shuffle (token ⋈ broadcast vocab → per-doc
    argmax); dedup is a row_number window, not a groupBy+self-join
    (the self-join re-executed the entire upstream pipeline — incl.
    language scoring — twice). Naive compose-by-join: 44 exchanges /
    10 SMJ. This: every exchange load-bearing (lang score agg, argmax,
    metrics⋈lang join, dedup window, summary agg)."""
    from pyspark.sql.window import Window

    m = doc_metrics(docs, keep=["lang", "source"]).filter(
        (F.col("alpha_ratio") >= MIN_ALPHA_RATIO)
        & (F.col("n_tokens") >= MIN_TOKENS)
    )
    lid = predicted_language(docs).select("doc_id", "pred_lang")
    kept = (
        m.join(lid, "doc_id")
        .filter(F.col("pred_lang") == F.col("lang"))
        .select(
            "doc_id", "source", "n_bpe_tokens", F.md5("_text").alias("content_hash")
        )
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    canon = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return canon.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
    )


def _oracle() -> str:
    from mpi_word_count_spark.functions.parity import sql_portable_round
    from mpi_word_count_spark.operators.textanalysis import BPE_ISH_PATTERN

    vocab_rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(LANG_MARKERS.items())
        for w in words
    )
    ar = "(CASE WHEN length(text) > 0 THEN "
    ar += "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) "
    ar += "ELSE 0 END)"
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, source, text,
               list_filter(string_split_regex(lower(text), '{sql_regex()}'),
                           x -> x <> '') AS t
        FROM documents
    ),
    tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    vocab(vl, marker) AS (VALUES {vocab_rows}),
    best AS (
        SELECT doc_id, vl AS pred_lang FROM (
            SELECT doc_id, vl,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY count(*) DESC, vl ASC
                   ) AS rn
            FROM tok JOIN vocab ON tok = marker GROUP BY doc_id, vl
        ) WHERE rn = 1
    ),
    kept AS (
        SELECT x.doc_id, x.source, x.text, md5(x.text) AS content_hash
        FROM toks x JOIN best b ON x.doc_id = b.doc_id AND b.pred_lang = x.lang
        WHERE {sql_portable_round(ar, 4)} >= {MIN_ALPHA_RATIO}
          AND len(t) >= {MIN_TOKENS}
    ),
    canon AS (
        SELECT * FROM kept
        WHERE doc_id IN (
            SELECT min(doc_id) FROM kept GROUP BY content_hash
        )
    )
    SELECT c.source,
           count(*) AS n_docs,
           -- CAST must wrap the aggregate: DuckDB sum(BIGINT) yields
           -- HUGEINT, which pandas canonicalizes as float64 and the
           -- value hash diverges from Spark's int64
           CAST(sum(len(regexp_extract_all(c.text, '{BPE_ISH_PATTERN}')))
               AS BIGINT) AS total_bpe_tokens
    FROM canon c
    GROUP BY c.source
    """


@register("clean_corpus_summary", oracle=_oracle())
def q_clean_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_corpus_summary(table(spark, "documents", sf_dir))


def _manifest_oracle() -> str:
    from mpi_word_count_spark.functions.hashing import sql_hash32
    from mpi_word_count_spark.functions.parity import sql_portable_round
    from mpi_word_count_spark.operators.curation import CONTAMINATION_NGRAM
    from mpi_word_count_spark.operators.textanalysis import BPE_ISH_PATTERN
    from mpi_word_count_spark.queries.curation_queries import (
        BENCH_MOD,
        _mixture_threshold_sql,
    )

    vocab_rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(LANG_MARKERS.items())
        for w in words
    )
    ar = "(CASE WHEN length(text) > 0 THEN "
    ar += "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) "
    ar += "ELSE 0 END)"
    n = CONTAMINATION_NGRAM
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    mix_hash = sql_hash32("CAST(doc_id AS VARCHAR)", "mix")
    shard_hash = sql_hash32("CAST(doc_id AS VARCHAR)", "shard")
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, source, text,
               list_filter(string_split_regex(lower(text), '{sql_regex()}'),
                           x -> x <> '') AS t
        FROM documents
    ),
    tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    vocab(vl, marker) AS (VALUES {vocab_rows}),
    best AS (
        SELECT doc_id, vl AS pred_lang FROM (
            SELECT doc_id, vl,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY count(*) DESC, vl ASC
                   ) AS rn
            FROM tok JOIN vocab ON tok = marker GROUP BY doc_id, vl
        ) WHERE rn = 1
    ),
    kept AS (
        SELECT x.doc_id, x.lang, x.text, md5(x.text) AS content_hash
        FROM toks x JOIN best b ON x.doc_id = b.doc_id AND b.pred_lang = x.lang
        WHERE {sql_portable_round(ar, 4)} >= {MIN_ALPHA_RATIO}
          AND len(t) >= {MIN_TOKENS}
    ),
    canon AS (
        SELECT * FROM kept
        WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY content_hash)
    ),
    sh8 AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, len(t) - {n - 2}), i -> {gram}))) AS shingle
        FROM toks
    ),
    contaminated AS (
        SELECT DISTINCT c.doc_id
        FROM sh8 c
        JOIN (SELECT DISTINCT shingle FROM sh8
              WHERE doc_id % {BENCH_MOD} = 0) b
          ON c.shingle = b.shingle
        WHERE c.doc_id % {BENCH_MOD} <> 0
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(bpe) AS BIGINT) AS total_bpe_tokens
    FROM (
        SELECT ({shard_hash} % 10000) % 16 AS shard,
               len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe
        FROM canon
        WHERE doc_id % {BENCH_MOD} <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
          AND {mix_hash} % 10000 < {_mixture_threshold_sql()}
    ) GROUP BY shard ORDER BY shard
    """


@register("training_shard_manifest", oracle=_manifest_oracle())
def q_training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete curation pipeline in one plan — what a user of this
    engine actually ships: quality gates → language agreement → exact
    dedup → benchmark decontamination (8-gram, benchmark docs also
    excluded) → deterministic language re-weighting → 16-shard
    manifest with per-shard document and BPE-token budgets.

    Every stage reuses the registered operator (doc_metrics,
    predicted_language, benchmark_contamination, sample_hash) and the
    whole composition is value-hash-verified against a single DuckDB
    statement. Scale shape: per-doc projections + one vocab broadcast
    + hash-key shuffles only; the manifest is |shards| rows."""
    from pyspark.sql.window import Window

    from mpi_word_count_spark.operators.curation import (
        benchmark_contamination,
        mixture_keep_col,
        sample_hash,
    )
    from mpi_word_count_spark.queries.curation_queries import (
        BENCH_MOD,
        MIXTURE_WEIGHTS,
    )

    docs = table(spark, "documents", sf_dir)
    m = doc_metrics(docs, keep=["lang", "source"]).filter(
        (F.col("alpha_ratio") >= MIN_ALPHA_RATIO)
        & (F.col("n_tokens") >= MIN_TOKENS)
    )
    lid = predicted_language(docs).select("doc_id", "pred_lang")
    kept = (
        m.join(lid, "doc_id")
        .filter(F.col("pred_lang") == F.col("lang"))
        .select(
            "doc_id", "lang", "n_bpe_tokens", F.md5("_text").alias("content_hash")
        )
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    canon = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "content_hash")
    )
    bench = F.col("doc_id") % BENCH_MOD == 0
    contaminated = benchmark_contamination(docs, bench).select("doc_id")
    clean = canon.filter(~bench).join(contaminated, "doc_id", "left_anti")
    mixed = clean.filter(mixture_keep_col("lang", MIXTURE_WEIGHTS))
    return (
        mixed.select(
            (sample_hash("doc_id", "shard") % 16).alias("shard"), "n_bpe_tokens"
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        )
        .orderBy("shard")
    )


def _funnel_oracle(by_source: bool = False) -> str:
    from mpi_word_count_spark.functions.parity import sql_portable_round

    vocab_rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(LANG_MARKERS.items())
        for w in words
    )
    ar = "(CASE WHEN length(text) > 0 THEN "
    ar += "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) "
    ar += "ELSE 0 END)"
    src = "source, " if by_source else ""
    grp = "GROUP BY source" if by_source else ""
    order = "ORDER BY source, stage_no" if by_source else ""
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, source, text,
               list_filter(string_split_regex(lower(text), '{sql_regex()}'),
                           x -> x <> '') AS t
        FROM documents
    ),
    tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    vocab(vl, marker) AS (VALUES {vocab_rows}),
    best AS (
        SELECT doc_id, vl AS pred_lang FROM (
            SELECT doc_id, vl,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY count(*) DESC, vl ASC
                   ) AS rn
            FROM tok JOIN vocab ON tok = marker GROUP BY doc_id, vl
        ) WHERE rn = 1
    ),
    flags AS (
        SELECT x.doc_id, x.source,
               ({sql_portable_round(ar, 4)} >= {MIN_ALPHA_RATIO}
                AND len(t) >= {MIN_TOKENS}) AS g_q,
               (b.pred_lang IS NOT NULL AND b.pred_lang = x.lang) AS g_l,
               md5(x.text) AS h
        FROM toks x LEFT JOIN best b ON x.doc_id = b.doc_id
    ),
    staged AS (
        SELECT doc_id, source, g_q, g_l, (g_q AND g_l) AS s3,
               row_number() OVER (
                   PARTITION BY h ORDER BY (g_q AND g_l) DESC, doc_id
               ) AS rn
        FROM flags
    )
    SELECT * FROM (
        SELECT {src}1 AS stage_no, 'raw' AS stage, count(*) AS docs
        FROM staged {grp}
        UNION ALL
        SELECT {src}2, 'quality', count(*) FROM staged WHERE g_q {grp}
        UNION ALL
        SELECT {src}3, 'lang_agreement', count(*) FROM staged
        WHERE s3 {grp}
        UNION ALL
        SELECT {src}4, 'exact_dedup', count(*) FROM staged
        WHERE s3 AND rn = 1 {grp}
    ) {order}
    """


@register("curation_funnel", oracle=_funnel_oracle())
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's audit artifact: per-stage survivor counts for
    raw → quality gates → language agreement → exact dedup, the table
    every production curation run reports. Computed in ONE pass:
    per-doc gate flags ride a single doc_metrics projection + the
    lang broadcast-argmax join, dedup first-wins is a window (s3
    survivors ordered first), and all four stage counts come from one
    conditional aggregate — no per-stage rescans of the corpus."""
    from pyspark.sql.window import Window

    docs = table(spark, "documents", sf_dir)
    m = doc_metrics(docs, keep=["lang", "source"])
    lid = predicted_language(docs).select("doc_id", "pred_lang")
    flags = m.join(lid, "doc_id", "left").select(
        "doc_id",
        (
            (F.col("alpha_ratio") >= MIN_ALPHA_RATIO)
            & (F.col("n_tokens") >= MIN_TOKENS)
        ).alias("g_q"),
        (
            F.col("pred_lang").isNotNull() & (F.col("pred_lang") == F.col("lang"))
        ).alias("g_l"),
        F.md5("_text").alias("h"),
    )
    staged = flags.withColumn("s3", F.col("g_q") & F.col("g_l"))
    w = Window.partitionBy("h").orderBy(F.col("s3").desc(), F.col("doc_id"))
    staged = staged.withColumn("rn", F.row_number().over(w))
    agg = staged.agg(
        F.count(F.lit(1)).alias("raw"),
        F.sum(F.col("g_q").cast("long")).alias("quality"),
        F.sum(F.col("s3").cast("long")).alias("lang_agreement"),
        F.sum((F.col("s3") & (F.col("rn") == 1)).cast("long")).alias("exact_dedup"),
    )
    return agg.selectExpr(
        "stack(4, 1, 'raw', raw, 2, 'quality', quality, "
        "3, 'lang_agreement', lang_agreement, 4, 'exact_dedup', exact_dedup) "
        "AS (stage_no, stage, docs)"
    )


@register("source_funnel", oracle=_funnel_oracle(by_source=True))
def q_source_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation_funnel broken out per SOURCE — the ops view that says
    WHICH feed is losing documents at which stage (a scraper whose
    quality-gate survival collapses, a syndicated source whose docs
    all dedup away against another feed). Same one-pass machinery:
    gate flags + a GLOBAL dedup window (a doc deduped against another
    source's copy still drops — survivors attribute to their own
    source), then one conditional aggregate per source and an
    unpivot; adds exactly one |sources|-keyed exchange over the
    global funnel."""
    from pyspark.sql.window import Window

    docs = table(spark, "documents", sf_dir)
    m = doc_metrics(docs, keep=["lang", "source"])
    lid = predicted_language(docs).select("doc_id", "pred_lang")
    flags = m.join(lid, "doc_id", "left").select(
        "doc_id",
        "source",
        (
            (F.col("alpha_ratio") >= MIN_ALPHA_RATIO)
            & (F.col("n_tokens") >= MIN_TOKENS)
        ).alias("g_q"),
        (
            F.col("pred_lang").isNotNull()
            & (F.col("pred_lang") == F.col("lang"))
        ).alias("g_l"),
        F.md5("_text").alias("h"),
    )
    staged = flags.withColumn("s3", F.col("g_q") & F.col("g_l"))
    w = Window.partitionBy("h").orderBy(F.col("s3").desc(), F.col("doc_id"))
    staged = staged.withColumn("rn", F.row_number().over(w))
    agg = staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("raw"),
        F.sum(F.col("g_q").cast("long")).alias("quality"),
        F.sum(F.col("s3").cast("long")).alias("lang_agreement"),
        F.sum((F.col("s3") & (F.col("rn") == 1)).cast("long")).alias(
            "exact_dedup"
        ),
    )
    return agg.selectExpr(
        "source",
        "stack(4, 1, 'raw', raw, 2, 'quality', quality, "
        "3, 'lang_agreement', lang_agreement, 4, 'exact_dedup', exact_dedup) "
        "AS (stage_no, stage, docs)",
    ).orderBy("source", "stage_no")
