"""Multimodal column plumbing (north star: image/audio/video at 100 TB).

Design: media travels as an opaque `binary` column plus a typed
metadata struct; all per-item compute (decode, feature extraction,
resize, frame sampling) runs in Arrow-batched Pandas functions via
`mapInPandas` — bytes never pass through row-at-a-time Python, and
each task processes a columnar batch.

The actual codecs (PIL/ffmpeg/torchvision) are NOT in this container,
so the decode kernel is stubbed: `decode_media` raises
NotImplementedError for real codecs and offers a deterministic fake
(`fake=True`) driven by the byte content, keeping every piece of
Spark-side plumbing — schema, batching, partitioning, UDF signatures
— real and testable.

Scale notes: binary columns make parquet row groups large; keep
`spark.sql.files.maxPartitionBytes` at the default 128 MB so a task
holds only a handful of items, and repartition by a size-balanced key
before heavy kernels. Feature extraction is compute-bound: the
mapInPandas iterator shape lets one task pipeline decode batches
without materializing the partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: text bytes as
    the opaque payload (the fixtures ship no real media; the schema
    and byte-handling are what's under test)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(data: bytes, mime: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload to an array.

    STUB: real decoding needs codec libraries not present in this
    environment. `fake=True` returns a deterministic 16×16 byte
    histogram "image" derived from the payload so downstream kernels
    are exercisable end to end.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries (PIL/ffmpeg) not "
            "available in this environment; pass fake=True for the "
            "deterministic stub"
        )
    counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
    return counts.reshape(16, 16).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media → (media_id, n_bytes, feature: array<float>) via
    mapInPandas (Arrow batches, iterator form)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list[Any] = []
            nbytes: list[int] = []
            for payload, meta in zip(pdf["media"], pdf["meta"]):
                img = decode_media(bytes(payload), meta["mime"], fake=fake)
                # deterministic pooled feature: row sums, fixed dim
                pooled = img.sum(axis=1)[:FEATURE_DIM]
                feats.append(pooled.astype(np.float32))
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": nbytes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, schema=out_schema)


def resize_stub(media: DataFrame, height: int, width: int, fake: bool = True) -> DataFrame:
    """Resize kernel: decode → (fake) nearest-neighbor resample →
    re-encode as raw bytes. Demonstrates binary-in/binary-out batch
    shape; swap the body for a real codec at deployment."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media", T.BinaryType(), True),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("width", T.IntegerType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, meta in zip(pdf["media"], pdf["meta"]):
                img = decode_media(bytes(payload), meta["mime"], fake=fake)
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                out.append(img[np.ix_(ys, xs)].astype(np.float32).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media": out,
                    "height": height,
                    "width": width,
                }
            )

    return media.mapInPandas(kernel, schema=out_schema)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, stride: int = 4, fake: bool = True
) -> DataFrame:
    """Frame-sampling kernel for byte-stream "video": every stride-th
    fixed-size chunk becomes a frame row (media_id, frame_no, frame).
    Output explodes rows — exactly how real video frame extraction
    behaves — so downstream ops see per-frame granularity."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                data = bytes(payload)
                chunks = [
                    data[i : i + frame_bytes]
                    for i in range(0, len(data), frame_bytes)
                ]
                for no, chunk in enumerate(chunks[::stride]):
                    ids.append(mid)
                    nos.append(no)
                    frames.append(chunk)
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": frames}
            )

    return media.mapInPandas(kernel, schema=out_schema)
