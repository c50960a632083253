"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side on the
same parquet fixtures and compares row count, column names, and
order-insensitive values. Used by tests/test_oracle_parity.py so
mismatches surface before the driver's per-round check does.
"""

from __future__ import annotations

import math
import os

import duckdb
from pyspark.sql import SparkSession

from mpi_word_count_spark.tables import TABLES


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse last-bit drift the way a sane hasher would
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def compare(
    spark: SparkSession, spark_fn, sql: str, sf_dir: str
) -> tuple[bool, str]:
    """Returns (ok, message)."""
    sdf = spark_fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(_normalize(row[c]) for c in spark_cols) for row in sdf.collect()
    ]

    con = duckdb_connection(sf_dir)
    res = con.execute(sql)
    duck_cols = sorted(d[0] for d in res.description)
    fetched = res.fetchall()
    name_pos = {d[0]: i for i, d in enumerate(res.description)}
    duck_rows = [
        tuple(_normalize(row[name_pos[c]]) for c in duck_cols) for row in fetched
    ]

    if spark_cols != duck_cols:
        return False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    if sorted(map(repr, spark_rows)) != sorted(map(repr, duck_rows)):
        s, d = sorted(map(repr, spark_rows)), sorted(map(repr, duck_rows))
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
