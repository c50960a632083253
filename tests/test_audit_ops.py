"""Semantic properties of the sampling-order and embedding-audit
operators beyond oracle parity: weighted-sample partition invariance
and weight bias, curriculum stage monotonicity/density, Arrow-kernel
edge cases (empty vectors) and twin equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpi_word_count_spark.functions.vector import norm
from mpi_word_count_spark.operators.curation import (
    curriculum_stages,
    weighted_sample,
)
from mpi_word_count_spark.operators.embedding_audit import (
    embedding_norms,
    label_centroid_spread,
)
from mpi_word_count_spark.tables import table
from tests.conftest import SF_DIR


def test_weighted_sample_partition_invariance(spark):
    # the sample is a pure function of (id, weight, stratum) — the
    # physical layout must not change it (retries, AQE coalesce, scale)
    docs = table(spark, "documents", SF_DIR)
    a = weighted_sample(docs.repartition(3), k=5)
    b = weighted_sample(docs.repartition(17, "lang"), k=5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_weighted_sample_prefers_heavy_rows(spark):
    # one row with ~all the weight is (near-)always drawn first:
    # ln(u)/w → 0⁻ as w → ∞ while light rows stay ≪ 0
    rows = [(i, "s", 1) for i in range(200)] + [(999, "s", 10**9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    top = weighted_sample(df, k=1, weight_col="n_chars").collect()
    assert [r["doc_id"] for r in top] == [999]


def test_weighted_sample_exact_count_per_stratum(spark):
    docs = table(spark, "documents", SF_DIR)
    out = weighted_sample(docs, k=7).groupBy("stratum").count()
    n_strata = docs.select("source").distinct().count()
    rows = out.collect()
    assert len(rows) == n_strata and all(r["count"] == 7 for r in rows)


def test_curriculum_stages_monotone_and_dense(spark):
    docs = table(spark, "documents", SF_DIR)
    laid = curriculum_stages(docs, n_stages=4, n_shards=8)
    joined = laid.join(docs.select("doc_id", "n_chars"), "doc_id")
    # stage is monotone in difficulty: every doc in stage s is no
    # longer than any doc in stage s+1 (ties share a stage by
    # construction — stage is a function of the length value)
    bounds = joined.groupBy("stage").agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    ).orderBy("stage").collect()
    assert [b["stage"] for b in bounds] == [1, 2, 3, 4]
    for prev, nxt in zip(bounds, bounds[1:]):
        assert prev["hi"] <= nxt["lo"]
    # positions are dense 1..n within every (stage, shard) cell
    cells = laid.groupBy("stage", "shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
    ).collect()
    assert all(c["lo"] == 1 and c["hi"] == c["n"] for c in cells)
    # stages are count-balanced up to length-tie granularity: the
    # fixture has ~unique lengths, so within 20% of the ideal quarter
    total = docs.count()
    sizes = laid.groupBy("stage").count().collect()
    assert all(abs(s["count"] - total / 4) <= total / 4 * 0.2 for s in sizes)


def test_embedding_norms_arrow_matches_expression_twin(spark):
    emb = table(spark, "embeddings", SF_DIR)
    from mpi_word_count_spark.functions.parity import portable_round

    twin = emb.select(
        "vec_id", portable_round(norm(F.col("embedding")), 4).alias("l2_norm")
    )
    got = embedding_norms(emb).select("vec_id", "l2_norm")
    assert got.exceptAll(twin).count() == 0 and twin.exceptAll(got).count() == 0


def test_embedding_norms_kernel_handles_empty_vectors(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, []), (3, [0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in embedding_norms(df).collect()}
    assert rows[1]["dim"] == 2 and rows[1]["l2_norm"] == 5.0
    assert rows[2]["dim"] == 0 and rows[2]["l2_norm"] == 0.0
    assert rows[3]["dim"] == 1 and rows[3]["max_abs"] == 0.0


def test_label_centroid_spread_degenerate_cluster(spark):
    # identical members → mean_cos 1.0 and centroid_norm = member norm
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0], 7) for i in range(5)]
        + [(9, [0.0, 2.0, 0.0], 8), (10, [0.0, 0.0, 2.0], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["label"]: r for r in label_centroid_spread(df).collect()}
    assert rows[7]["n"] == 5
    assert rows[7]["mean_cos"] == 1.0 and rows[7]["centroid_norm"] == 1.0
    # orthogonal pair: centroid (0,1,1), cos(member, centroid) = 1/√2
    assert rows[8]["mean_cos"] == 0.7071


def test_embedding_pca_degenerate_inputs_raise(spark):
    """Empty input (n=0) and an all-constant cloud (zero covariance)
    must fail loudly, not divide by zero (ADVICE r9)."""
    from mpi_word_count_spark.operators.embedding_audit import (
        embedding_pca_power,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        embedding_pca_power(empty, dim=4)
    const = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="degenerate|trace"):
        embedding_pca_power(const, dim=4)


def test_embedding_pca_matches_numpy_power_replica(spark):
    """Replay the quantized-covariance power iteration in numpy
    (exact match on every output) and sanity-check against numpy's
    true eigendecomposition."""
    import math

    import numpy as np
    import pandas as pd

    from mpi_word_count_spark.operators.embedding_audit import (
        PCA_Q,
        PCA_ROUNDS,
    )
    from mpi_word_count_spark.queries.audit_queries import (
        q_embedding_pca_power,
    )
    from tests.conftest import SF_DIR

    got = {r["dim_idx"]: r for r in q_embedding_pca_power(spark, SF_DIR).collect()}
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    q = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * PCA_Q + 0.5)
    n = float(len(q))
    dim = q.shape[1]
    gram = q.T @ q
    s = q.sum(axis=0)
    cov = [
        [(gram[i, j] - s[i] * s[j] / n) / n for j in range(dim)]
        for i in range(dim)
    ]

    def r(x, d):
        sc = float(10**d)
        return math.floor(x * sc + 0.5) / sc

    # exact-integer recurrence replica (the operator's parity form):
    # quantize cov at 1e-9, fold entirely in Python ints
    Q = 10**9
    covq = [
        [math.floor(cov[i][j] * float(Q) + 0.5) for j in range(dim)]
        for i in range(dim)
    ]
    vq = [Q] * dim
    m = 0
    for _ in range(PCA_ROUNDS):
        wq = [
            (sum(covq[i][j] * vq[j] for j in range(dim)) + Q // 2) // Q
            for i in range(dim)
        ]
        m = max(abs(x) for x in wq)
        vq = [(2 * x * Q + m) // (2 * m) for x in wq]
    trq = sum(covq[i][i] for i in range(dim))
    assert set(got) == set(range(1, dim + 1))
    for i in range(dim):
        row = got[i + 1]
        assert row["variance"] == r(cov[i][i], 6)
        assert row["loading_pc1"] == ((vq[i] + 500) // 1000) / 1e6
        assert row["pc1_explained"] == (
            ((2 * m * 10**4 + trq) // (2 * trq)) / 1e4
        )
    v = [x / Q for x in vq]

    # the per-round 1e-9 rounding must not bend the math: a FULL
    # precision numpy power iteration from the same start stays
    # essentially identical to the rounded iterate. (The fixture's
    # embedding cloud is near-isotropic — eigengap ≈ 1 — so neither
    # iterate can align with the ill-defined "true" PC1 in 12 rounds;
    # that near-uniform spectrum is itself what the audit reports.)
    C = np.array(cov)
    v_fp = np.ones(dim)
    for _ in range(PCA_ROUNDS):
        w_fp = C @ v_fp
        v_fp = w_fp / np.abs(w_fp).max()
    vv = np.array(v)
    cos = abs(float(v_fp @ vv) / (np.linalg.norm(v_fp) * np.linalg.norm(vv)))
    assert cos > 0.999999
    # spectrum bounds: the L-inf eigenvalue estimate sits inside the
    # covariance spectrum and the Rayleigh quotient made progress
    # beyond the mean eigenvalue
    evals = np.linalg.eigh(C)[0]
    rayleigh = float(vv @ C @ vv) / float(vv @ vv)
    assert rayleigh > evals.mean()
    assert rayleigh <= evals[-1] * (1 + 1e-9)
    # m is at the 1e-9 integer iterate scale; bring back to cov units
    assert 0 < m / Q <= 1.5 * evals[-1] * np.sqrt(dim)
