"""Skew-handling operators (SCALE.md: hot keys at 100 TB).

AQE's skew-join splitting covers joins; for AGGREGATIONS over power-law
keys (word counts over web corpora are Zipfian — the flagship's own
risk) the standard fix is two-phase salted aggregation:

  phase 1: group by (key, salt) — spreads one hot key over S reducers
  phase 2: group by key — merges the S partials

Works for any algebraic aggregate (sum/count/min/max); the extra
shuffle carries only |keys|·S rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    key_cols: list[str],
    salt_buckets: int = 16,
    count_alias: str = "count",
) -> DataFrame:
    """count(*) per key via two-phase salted aggregation."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").cast("bigint").alias(count_alias)
    )


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value: Column | str,
    salt_buckets: int = 16,
    sum_alias: str = "sum",
) -> DataFrame:
    """sum(value) per key via two-phase salted aggregation."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_v", v).withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.sum("_v").alias("_partial"))
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(sum_alias))
