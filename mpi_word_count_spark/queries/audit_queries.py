"""Sampling-order and embedding-audit queries: weighted sampling
without replacement, curriculum ordering, Arrow-native norm audits,
and per-label cluster spread — the audit/ordering steps between a
curated corpus and a training run, each with a full DuckDB oracle.

Float parity notes: the Efraimidis–Spirakis key (ln(u)/w) is computed
with the identical binary64 formula in both engines from the same
md5-derived u, so the RANKING matches bit-wise, not just rounded
values; norms/cosines follow the repo's left-fold accumulation
convention (functions/vector.py) and round portably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.functions.hashing import sql_hash32
from mpi_word_count_spark.functions.parity import sql_portable_round
from mpi_word_count_spark.operators.curation import (
    curriculum_stages,
    weighted_sample,
)
from mpi_word_count_spark.operators.embedding_audit import (
    embedding_norms,
    label_centroid_spread,
    stage_position_audit,
)
from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table

SAMPLE_K = 20
CURR_STAGES = 4
CURR_SHARDS = 16
EMB_DIM = 64  # fixture embedding width (TESTDATA.md)


@register(
    "weighted_sample_by_length",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source AS stratum, n_chars AS weight,
               ln(({sql_hash32("CAST(doc_id AS VARCHAR)", "wsample")} + 0.5)
                  / 4294967296.0) / CAST(n_chars AS DOUBLE) AS es_key
        FROM documents
    )
    SELECT doc_id, stratum, weight, pos FROM (
        SELECT doc_id, stratum, weight,
               CAST(row_number() OVER (
                   PARTITION BY stratum ORDER BY es_key DESC, doc_id
               ) AS BIGINT) AS pos
        FROM keyed
    ) WHERE pos <= {SAMPLE_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement:
    {SAMPLE_K} docs per source, inclusion probability ∝ n_chars
    (the quality-weighted subsample between scoring and mixing).
    Deterministic u → the ranking replicates bit-wise in the oracle."""
    docs = table(spark, "documents", sf_dir)
    out = weighted_sample(docs, k=SAMPLE_K, weight_col="n_chars")
    return out.withColumn("pos", F.col("pos").cast("long"))


def _curriculum_oracle() -> str:
    return f"""
    WITH hist AS (
        SELECT n_chars AS d, count(*) AS cnt FROM documents GROUP BY 1
    ),
    cum AS (
        SELECT d,
               coalesce(sum(cnt) OVER (
                   ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS cum_before,
               sum(cnt) OVER () AS total
        FROM hist
    ),
    stages AS (
        -- CAST: sum() windows are HUGEINT in DuckDB, which the driver
        -- canonicalizer reads as float64; Spark's DIV stays BIGINT
        SELECT d, CAST(({CURR_STAGES} * cum_before) // total + 1
                       AS BIGINT) AS stage
        FROM cum
    ),
    laid AS (
        SELECT doc_id, stage,
               {sql_hash32("CAST(doc_id AS VARCHAR)", "curr")}
                   % {CURR_SHARDS} AS shard
        FROM documents JOIN stages ON n_chars = d
    )
    SELECT doc_id, stage, shard,
           CAST(row_number() OVER (
               PARTITION BY stage, shard
               ORDER BY {sql_hash32("CAST(doc_id AS VARCHAR)", "curro")},
                        doc_id
           ) AS BIGINT) AS pos
    FROM laid
    """


@register("curriculum_batches", oracle=_curriculum_oracle())
def q_curriculum_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum layout: {CURR_STAGES} easy-to-hard stages by doc
    length (exact CDF from the tiny length histogram — never NTILE's
    global sort), hash-shuffled within stage, positions dense per
    (stage, shard)."""
    docs = table(spark, "documents", sf_dir)
    out = curriculum_stages(
        docs, n_stages=CURR_STAGES, n_shards=CURR_SHARDS
    )
    return out.withColumn("pos", F.col("pos").cast("long"))


@register(
    "curriculum_layout_audit",
    oracle=f"""
    WITH laid AS ({_curriculum_oracle()})
    SELECT stage, shard, count(*) AS n,
           min(pos) AS min_pos, max(pos) AS max_pos
    FROM laid GROUP BY stage, shard
    """,
)
def q_curriculum_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest invariant check over the curriculum layout:
    positions are dense 1..n per (stage, shard) cell (min_pos = 1,
    max_pos = n) — what a 100 TB ordered-write job asserts before
    publishing."""
    docs = table(spark, "documents", sf_dir)
    laid = curriculum_stages(
        docs, n_stages=CURR_STAGES, n_shards=CURR_SHARDS
    ).withColumn("pos", F.col("pos").cast("long"))
    return stage_position_audit(laid)


@register(
    "embedding_norms",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           {sql_portable_round(
               "sqrt(list_dot_product(embedding::DOUBLE[],"
               " embedding::DOUBLE[]))", 4)} AS l2_norm,
           {sql_portable_round(
               "list_max(list_transform(embedding,"
               " x -> abs(CAST(x AS DOUBLE))))", 4)} AS max_abs
    FROM embeddings
    """,
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native (mapInArrow) per-vector norm audit — catches
    un-normalized shards before they poison cosine retrieval. The
    kernel reproduces the left-fold accumulation of the expression
    twin, so the value hash matches DuckDB's list_dot_product."""
    emb = table(spark, "embeddings", sf_dir)
    return embedding_norms(emb)


@register(
    "label_centroid_spread",
    oracle=f"""
    WITH dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS i),
    ex AS (
        SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
        FROM embeddings, dims
    ),
    cent AS (
        SELECT label, i, avg(v) AS c FROM ex GROUP BY label, i
    ),
    cvec AS (
        SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label
    ),
    cn AS (
        SELECT label,
               sqrt(list_dot_product(centroid, centroid)) AS centroid_norm
        FROM cvec
    ),
    scored AS (
        SELECT e.label,
               list_dot_product(e.embedding::DOUBLE[], v.centroid)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                        e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(v.centroid, v.centroid))) AS cos
        FROM embeddings e JOIN cvec v ON e.label = v.label
    ),
    agg AS (
        SELECT label, count(*) AS n, avg(cos) AS mean_cos
        FROM scored GROUP BY label
    )
    SELECT a.label, a.n,
           {sql_portable_round("cn.centroid_norm", 4)} AS centroid_norm,
           {sql_portable_round("a.mean_cos", 4)} AS mean_cos
    FROM agg a JOIN cn ON a.label = cn.label
    """,
)
def q_label_centroid_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cluster audit: member count, centroid norm,
    mean cosine(member, centroid). O(n·d) single pass + label-sized
    aggregates; no pairwise work."""
    emb = table(spark, "embeddings", sf_dir)
    return label_centroid_spread(emb)


# fixed-point scale for the per-dimension statistics: 2^20 per unit.
# floor(x * S + 0.5) — the SAME expression on both engines — makes the
# quantization deterministic regardless of each engine's round() tie
# rule; after it, every aggregate is exact int64 arithmetic.
DIM_STATS_SCALE = 1 << 20


@register(
    "embedding_dim_stats",
    oracle=f"""
    WITH dims AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS dim,
               unnest(embedding) AS x
        FROM embeddings
    ),
    q AS (
        SELECT dim,
               CAST(floor(CAST(x AS DOUBLE) * {DIM_STATS_SCALE} + 0.5)
                    AS BIGINT) AS xq
        FROM dims
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(xq) AS BIGINT) AS sum_fp,
           CAST(sum(xq * xq) AS BIGINT) AS sumsq_fp
    FROM q GROUP BY 1
    """,
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding statistics — the feature-health audit
    (dead dimensions, scale imbalance, variance collapse) that
    complements the per-VECTOR norm audit (embedding_norms). Values
    quantize to 2^-20 fixed point via floor(x·S + 0.5) — the same
    expression both engines evaluate on the same doubles — and all
    sums are exact int64 from there, so the hash match is exact by
    construction: no float aggregate ever crosses the engine
    boundary. Mean and variance derive downstream from (n, sum_fp,
    sumsq_fp) without another corpus pass.

    Shape: posexplode → one partially-aggregated shuffle keyed on
    the 64 dimension ids. Overflow bound: sumsq terms are ≤ (S·|x|)²
    ≈ 2^46 for unit-scale features; 2^63 admits ~10^5 · corpus rows
    per dimension partition — at larger scale, drop S to 2^14."""
    emb = table(spark, "embeddings", sf_dir)
    dims = emb.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.floor(
            F.col("x").cast("double") * DIM_STATS_SCALE + F.lit(0.5)
        )
        .cast("bigint")
        .alias("xq"),
    )
    return dims.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sum_fp"),
        F.sum(F.col("xq") * F.col("xq")).alias("sumsq_fp"),
    )


# --- PCA (power iteration on the quantized covariance) -----------------------

from mpi_word_count_spark.operators.embedding_audit import (  # noqa: E402
    PCA_Q,
    PCA_ROUNDS,
    embedding_pca_power,
)

_PCA_DIM = 64


def _fdiv(x: str, q: str) -> str:
    """SQL floor division of integers (DuckDB // truncates toward
    zero; Python // floors — this emulates the Python semantics)."""
    return (
        f"(({x}) // ({q}) - CASE WHEN (({x}) % ({q})) <> 0 "
        f"AND ({x}) < 0 THEN 1 ELSE 0 END)"
    )


def _pca_oracle(dim: int = _PCA_DIM, rounds: int = PCA_ROUNDS) -> str:
    from mpi_word_count_spark.functions.parity import sql_portable_round

    # The recurrence is pure integer arithmetic over the 1e-9-quantized
    # covariance (HUGEINT), mirroring the operator's Python ints: the
    # matvec sum is order-independent, the half-up roundings are exact
    # rational floor-divs — no float fold anywhere in the iteration.
    chain = []
    for t in range(1, rounds + 1):
        chain.append(
            f"""w{t} AS MATERIALIZED (
        SELECT c.i,
               {_fdiv('sum(c.cq * v.vq) + 500000000', '1000000000')}
                   AS wq
        FROM covq c JOIN v{t - 1} v ON v.i = c.j GROUP BY c.i
    ),
    m{t} AS MATERIALIZED (SELECT max(abs(wq)) AS m FROM w{t}),
    v{t} AS MATERIALIZED (
        SELECT w.i,
               {_fdiv('2 * w.wq * 1000000000 + m.m', '2 * m.m')} AS vq
        FROM w{t} w, m{t} m
    )"""
        )
    return f"""
    WITH dims AS (SELECT unnest(range(1, {dim} + 1)) AS i),
    qv AS MATERIALIZED (
        SELECT vec_id, d.i AS i,
               CAST(floor(CAST(embedding[d.i] AS DOUBLE) * {PCA_Q} + 0.5)
                    AS BIGINT) AS q
        FROM embeddings, dims d
    ),
    s1 AS MATERIALIZED (SELECT i, sum(q) AS si FROM qv GROUP BY 1),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
    s2 AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sij
        FROM qv a JOIN qv b ON a.vec_id = b.vec_id
        GROUP BY 1, 2
    ),
    cov AS MATERIALIZED (
        SELECT s2.i, s2.j,
               (CAST(sij AS DOUBLE)
                - CAST(a.si AS DOUBLE) * CAST(b.si AS DOUBLE) / nn.n)
                   / nn.n AS c
        FROM s2 JOIN s1 a ON a.i = s2.i JOIN s1 b ON b.i = s2.j, nn
    ),
    covq AS MATERIALIZED (
        SELECT i, j,
               CAST(floor(c * 1000000000 + 0.5) AS HUGEINT) AS cq
        FROM cov
    ),
    v0 AS (SELECT i, CAST(1000000000 AS HUGEINT) AS vq FROM dims),
    {",".join(chain)},
    tr AS MATERIALIZED (SELECT sum(cq) AS trq FROM covq WHERE i = j)
    SELECT CAST(c.i AS INT) AS dim_idx,
           {sql_portable_round('c.c', 6)} AS variance,
           CAST({_fdiv('v.vq + 500', '1000')} AS DOUBLE) / 1000000.0
               AS loading_pc1,
           CAST((2 * m.m * 10000 + tr.trq) // (2 * tr.trq) AS DOUBLE)
               / 10000.0 AS pc1_explained
    FROM cov c
    JOIN v{rounds} v ON v.i = c.i, m{rounds} m, tr
    WHERE c.i = c.j
    """


@register("embedding_pca_power", oracle=_pca_oracle())
def q_embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component of the embedding corpus: per-batch
    integer Gram partials (Arrow kernel over 1e-4-quantized
    components), one model-sized shuffle, then a 12-round power
    iteration on the d×d covariance — linear algebra on sufficient
    statistics, the only PCA shape that works at 100 TB (the corpus
    is touched once; the eigen-iteration is O(d²·rounds) on the
    driver). The oracle recomputes the exact integer Gram in SQL and
    unrolls the identical L∞-normalized, per-round-rounded matvec
    recurrence, so every iterate is hash-verified.

    Output: per dimension its variance, PC1 loading (L∞-normalized)
    and the PC1 explained-variance share λ/trace."""
    return embedding_pca_power(
        table(spark, "embeddings", sf_dir), dim=_PCA_DIM
    )
