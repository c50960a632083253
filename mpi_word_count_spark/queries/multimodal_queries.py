"""Multimodal pipeline queries (rows-only driver checks — the fake
decode kernels are not SQL-expressible, so no oracle entries; the
driver records the weaker rows/schema check, per the contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mpi_word_count_spark.operators.multimodal import (
    extract_features,
    media_from_documents,
    sample_frames,
)
from mpi_word_count_spark.registry import register
from mpi_word_count_spark.tables import table


@register("media_features")  # no oracle: pandas-UDF kernel
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → pooled feature vectors via mapInPandas."""
    media = media_from_documents(table(spark, "documents", sf_dir))
    return extract_features(media, fake=True)


@register("media_frames")  # no oracle: pandas-UDF kernel
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over byte-stream media (row-exploding kernel)."""
    media = media_from_documents(table(spark, "documents", sf_dir))
    return sample_frames(media, frame_bytes=64, stride=4, fake=True)
