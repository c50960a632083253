"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side on the
same parquet fixtures and compares row count, column names, and
order-insensitive values. Used by tests/test_oracle_parity.py so
mismatches surface before the driver's per-round check does.

The comparison is deliberately pandas-dtype-faithful, because the
driver's canonicalizer works on pandas frames: DuckDB HUGEINT (the
result type of sum(BIGINT)) lands as float64 and must NOT silently
equal Spark's int64 (774.0 != 774 under a value hash), and array-
valued cells make the driver's sort_values crash with "unhashable
type: 'list'" — both failure modes reproduce here instead of only in
the per-round CORRECTNESS report.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from mpi_word_count_spark.tables import TABLES


def _cell(v):
    """Canonical (type-class, value) pair for one cell. Type classes
    are intentionally coarse within a numeric family but distinct
    between ints and floats — the exact distinction the driver's
    pandas value hash makes."""
    if v is None:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        return ("f", round(f, 6))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        # Distinct type class, deliberately: the driver hashes pandas
        # frames where Spark DECIMAL columns land as object-dtype
        # Decimal while DuckDB DECIMAL lands as float64 — those rows
        # NEVER hash-equal at the gate even when numerically identical
        # (events_rollup_cascade went red in round 4 exactly this way
        # while this function's old ("f", ...) coercion scored it
        # green locally). Queries must present decimals as DOUBLE on
        # both sides (the q9_product_profit pattern).
        return ("dec", round(float(v), 6))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v))
    if isinstance(v, pd.Timestamp) or hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("s", str(v))


def _unhashable_columns(pdf: pd.DataFrame) -> list[str]:
    bad = []
    for c in pdf.columns:
        if pdf[c].dtype == object and pdf[c].map(
            lambda v: isinstance(v, (list, np.ndarray, dict))
        ).any():
            bad.append(c)
    return bad


def _canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


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
    spdf = spark_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    dpdf = con.execute(sql).df()

    spark_cols = sorted(spdf.columns)
    duck_cols = sorted(dpdf.columns)
    if spark_cols != duck_cols:
        return False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    if len(spdf) != len(dpdf):
        return False, f"row count differs: spark={len(spdf)} duck={len(dpdf)}"
    for side, pdf in (("spark", spdf), ("duck", dpdf)):
        bad = _unhashable_columns(pdf)
        if bad:
            return False, (
                f"{side} columns {bad} contain array/map cells — the "
                "driver canonicalizer crashes on these (unhashable "
                "list); project to a scalar form"
            )
    s_rows = _canon_rows(spdf)
    d_rows = _canon_rows(dpdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
