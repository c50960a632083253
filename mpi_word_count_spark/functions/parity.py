"""Cross-engine numeric parity helpers.

`round(x, d)` is NOT portable at half-way points: Spark routes the
double through BigDecimal HALF_UP while DuckDB computes
floor(x·10^d + 0.5)/10^d — the same binary64 value can land on
different sides (e.g. 0.41875 → 0.4187 vs 0.4188). For derived
scores where half-way points are reachable, both engines must run
the IDENTICAL floating-point formula; floor-based round-half-up is
expressible in both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(c: Column, digits: int = 4) -> Column:
    scale = float(10**digits)
    return F.floor(c * scale + F.lit(0.5)) / scale


def sql_portable_round(expr: str, digits: int = 4) -> str:
    scale = float(10**digits)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"
