"""Mimics the driver's t2 correctness gate locally at sf0.001:
every registered query vs its DuckDB oracle (row count + columns +
order-insensitive values)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mpi_word_count_spark.oracle import compare

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, name):
    if name not in ORACLES:
        # weaker check (driver records rows-only): must run, schema
        # stable, and actually produce rows — a 0-row result would let
        # a broken sketch/scorer pass silently (the quantitative bounds
        # live in test_approx_tolerance.py)
        df = QUERIES[name](spark, SF_DIR)
        assert df.columns and df.count() > 0
        return
    ok, msg = compare(spark, QUERIES[name], ORACLES[name], SF_DIR)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "count"]


def test_cell_decimal_is_distinct_type_class():
    """Regression for the round-4 driver red on events_rollup_cascade:
    the driver's pandas value hash type-mismatches Spark object-dtype
    Decimal cells against DuckDB float64 cells even when numerically
    identical. oracle._cell used to coerce Decimal -> ("f", ...),
    which scored such queries green locally while the driver scored
    them red. Decimal must be its own type class so local sweeps
    predict the gate."""
    from decimal import Decimal

    from mpi_word_count_spark.oracle import _cell

    assert _cell(Decimal("4043.850000")) != _cell(4043.85)
    assert _cell(Decimal("1.5")) == _cell(Decimal("1.50"))
    # floats and ints stay distinct from each other too (HUGEINT class)
    assert _cell(774.0) != _cell(774)
