"""Multimodal pipeline queries.

The registered queries project the kernel outputs to scalar columns
(csv-joined feature vector, md5 of frame bytes): the driver's
canonicalizer hashes pandas frames and crashes on array cells, and
this DuckDB build has no blob substring/md5. The array/binary-valued
operators stay intact in operators/multimodal.py — these projections
are the driver-facing view.

Oracle derivation relies on the fixture corpus being pure ASCII
(verified across sf0.001/0.01/0.1: octet_length(encode(text)) ==
length(text) for every row), so character positions == byte offsets
and md5(VARCHAR chunk) == md5 of the same bytes. The fake decode
kernel is a 256-bin byte histogram reshaped 16×16 with row sums as
the pooled feature, i.e. feature[i] = #bytes with value in
[16·i, 16·i+16) — expressible as an ascii()//16 bucketed count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpi_word_count_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_from_documents,
    sample_frames,
)
from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table

FRAME_BYTES = 64
FRAME_STRIDE = 4

_FEATURES_ORACLE = f"""
    WITH buckets AS (
        SELECT doc_id, ascii(ch) // 16 AS bucket
        FROM (
            SELECT doc_id, unnest(string_split(text, '')) AS ch
            FROM documents
        )
        WHERE ch <> ''
    ),
    hist AS (
        SELECT doc_id, bucket, count(*) AS c FROM buckets GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.doc_id, i.i AS bucket
        FROM documents d
        CROSS JOIN (SELECT unnest(range(0, {FEATURE_DIM})) AS i) i
    ),
    filled AS (
        SELECT g.doc_id, g.bucket, coalesce(h.c, 0) AS c
        FROM grid g LEFT JOIN hist h USING (doc_id, bucket)
    )
    SELECT f.doc_id AS media_id,
           d.n_bytes,
           string_agg(CAST(c AS VARCHAR), ',' ORDER BY f.bucket) AS feature_csv
    FROM filled f
    JOIN (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes
          FROM documents) d USING (doc_id)
    GROUP BY f.doc_id, d.n_bytes
"""


@register("media_features", oracle=_FEATURES_ORACLE)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → pooled feature vectors via mapInPandas.
    The pooled counts are integers by construction (float32 holds
    them exactly at fixture scale), so the csv projection through
    bigint is lossless."""
    media = media_from_documents(table(spark, "documents", sf_dir))
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("feature", lambda x: x.cast("long").cast("string"))
        ).alias("feature_csv"),
    )


_FRAMES_ORACLE = f"""
    SELECT doc_id AS media_id,
           CAST(i AS INT) AS frame_no,
           CAST(length(substring(text, 1 + i * {FRAME_BYTES * FRAME_STRIDE},
                                 {FRAME_BYTES})) AS BIGINT) AS n_frame_bytes,
           md5(substring(text, 1 + i * {FRAME_BYTES * FRAME_STRIDE},
                         {FRAME_BYTES})) AS frame_md5
    FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text)
                   / {FRAME_BYTES * FRAME_STRIDE}.0) AS BIGINT))) AS i
        FROM documents
    )
"""


@register("media_frames", oracle=_FRAMES_ORACLE)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over byte-stream media (row-exploding kernel).
    Every stride-th FRAME_BYTES chunk becomes a frame; the oracle
    reproduces the chunking with varchar substrings (ASCII corpus →
    chars are bytes) and ceil(n / (bytes·stride)) frames per doc."""
    media = media_from_documents(table(spark, "documents", sf_dir))
    frames = sample_frames(media, frame_bytes=FRAME_BYTES, stride=FRAME_STRIDE, fake=True)
    return frames.select(
        "media_id",
        "frame_no",
        F.octet_length("frame").cast("long").alias("n_frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )
