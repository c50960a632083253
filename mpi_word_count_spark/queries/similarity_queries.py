"""Similarity-search queries over `embeddings` (SURVEY.md §7 M3).

Query vectors: vec_id < 10 (stable at every sf). Both the exact and
the LSH path have full oracles; the LSH oracle embeds the identical
md5-derived hyperplane literals the Spark operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_multiprobe_topk,
    ann_lsh_topk,
    lsh_planes,
)
from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table

TOP_K = 5
N_QUERIES = 10


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < N_QUERIES)


@register(
    "ann_bruteforce",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.embedding::DOUBLE[],
                                            v.embedding::DOUBLE[]), 4) AS cosine
        FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the 10 query vectors."""
    emb = table(spark, "embeddings", sf_dir)
    return ann_bruteforce_topk(emb, _queries_df(spark, sf_dir), k=TOP_K)


def _lsh_oracle() -> str:
    planes = lsh_planes()
    def arr(plane: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]"

    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {arr(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, ({bucket_expr})::BIGINT AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.embedding::DOUBLE[],
                                            v.embedding::DOUBLE[]), 4) AS cosine
        FROM bucketed q JOIN bucketed v
          ON q.bucket = v.bucket AND q.vec_id <> v.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """


@register("ann_lsh", oracle=_lsh_oracle())
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (same ranking, candidates
    restricted to the query's hyperplane-sign bucket)."""
    emb = table(spark, "embeddings", sf_dir)
    return ann_lsh_topk(emb, _queries_df(spark, sf_dir), k=TOP_K)


def _multiprobe_oracle() -> str:
    planes = lsh_planes()

    def arr(plane: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]"

    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {arr(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    margin_structs = ", ".join(
        f"{{'m': abs(list_dot_product(embedding::DOUBLE[], {arr(p)})), 'p': {i}}}"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, ({bucket_expr})::BIGINT AS bucket
        FROM embeddings
    ),
    qm AS (
        SELECT vec_id, embedding, bucket,
               list_sort([{margin_structs}])[1].p AS flip_p
        FROM bucketed WHERE vec_id < {N_QUERIES}
    ),
    probes AS (
        SELECT vec_id, embedding, bucket AS probe FROM qm
        UNION ALL
        SELECT vec_id, embedding, xor(bucket, (2**flip_p)::BIGINT) FROM qm
    ),
    scored AS (
        SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.embedding::DOUBLE[],
                                            v.embedding::DOUBLE[]), 4) AS cosine
        FROM probes q JOIN bucketed v
          ON q.probe = v.bucket AND q.vec_id <> v.vec_id
    )
    SELECT q_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """


@register("ann_lsh_multiprobe", oracle=_multiprobe_oracle())
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-5: own bucket + lowest-|margin| bit flip.
    Recall ≥ single-probe ann_lsh at ~2× candidate cost."""
    emb = table(spark, "embeddings", sf_dir)
    return ann_lsh_multiprobe_topk(
        emb, _queries_df(spark, sf_dir), k=TOP_K, nprobes=2
    )


@register("ann_ivf")  # no oracle: iterative k-means isn't SQL-expressible;
# recall vs ann_bruteforce is asserted in tests/test_similarity_text.py
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-5: k-means inverted lists, queries
    probe the 2 nearest lists. Deterministic (id-ordered init, no RNG)."""
    emb = table(spark, "embeddings", sf_dir)
    return ann_ivf_topk(
        emb, _queries_df(spark, sf_dir), k=TOP_K, n_clusters=8, nprobe=2
    )
