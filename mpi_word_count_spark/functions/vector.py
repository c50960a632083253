"""Vector math over ArrayType(FloatType) embedding columns.

All expressions are built-in higher-order functions (zip_with /
aggregate) — JVM-side, codegen'd, no UDF in the hot path. Arrays are
cast to double before arithmetic so Spark and the DuckDB oracle
accumulate in the same precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — left-fold in index order (matches DuckDB's
    list_dot_product accumulation for parity-rounded outputs)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_cosine(a: str, b: str) -> str:
    """DuckDB SQL computing cosine over FLOAT[] as double."""
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
