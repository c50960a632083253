"""Z-order (Morton) data layout: multi-dimensional clustering keys.

The 100 TB problem this solves: a table queried by TWO independent
range predicates (user bucket × day, lat × lon, …) can be sorted or
partitioned by only one of them — the other predicate scans
everything. Interleaving the bits of both dimensions into one Morton
key makes rows that are close in BOTH dimensions close in the key, so
one sorted/partitioned layout serves 2-D range queries: an aligned
2^k × 2^k box is exactly ONE contiguous key range, and an arbitrary
box intersects a provably bounded set of key tiles (enumerated
driver-side, turned into partition pruning). This is the technique
behind Delta/Iceberg `OPTIMIZE ZORDER BY` — here expressed as plain
integer expressions any engine evaluates identically, so the key
itself is oracle-verifiable bit for bit.

Everything is pure 64-bit integer arithmetic (shift/and/or, the
classic mask-spreading construction) — no floats, no UDFs, codegen
end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Successive mask-spreading rounds: after all four, the low 16 bits of
# the input occupy the even bit positions of a 32-bit value.
_SPREAD_ROUNDS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

BITS_PER_DIM = 16  # supported key width per dimension


def spread_bits_sql(expr: str) -> str:
    """SQL text spreading the low 16 bits of `expr` into even bit
    positions — valid (and bit-identical) in both Spark SQL and
    DuckDB. Built by textual substitution; engines CSE the repeated
    subtrees."""
    s = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_ROUNDS:
        s = f"((({s}) | (({s}) << {shift})) & {mask})"
    return s


def morton_key_sql(x_expr: str, y_expr: str) -> str:
    """SQL text of the Morton key interleaving two ≤16-bit values:
    x in even bits, y in odd bits. Same text runs on both engines."""
    return f"({spread_bits_sql(x_expr)} | ({spread_bits_sql(y_expr)} << 1))"


def morton_key(x: Column | str, y: Column | str) -> Column:
    """Spark column form of morton_key_sql (via F.expr so the shift
    amounts stay SQL-side)."""
    xn = x if isinstance(x, str) else x._jc.toString()  # pragma: no cover
    yn = y if isinstance(y, str) else y._jc.toString()  # pragma: no cover
    return F.expr(morton_key_sql(xn, yn))


def py_morton(x: int, y: int) -> int:
    """Python reference (tests + driver-side tile enumeration)."""

    def spread(v: int) -> int:
        v &= 0xFFFF
        for shift, mask in _SPREAD_ROUNDS:
            v = (v | (v << shift)) & mask
        return v

    return spread(x) | (spread(y) << 1)


def zorder_box_buckets(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, tile_bits: int
) -> list[int]:
    """Bucket ids (zkey >> 2·tile_bits) intersecting the inclusive box
    [x_lo, x_hi] × [y_lo, y_hi], where each bucket is an aligned
    2^tile_bits × 2^tile_bits tile.

    Driver-side enumeration over TILE indices, not points: the loop is
    O(#intersecting tiles) — e.g. a 100×100 box over 16×16 tiles is
    ≤ 64 iterations however large the table. The identity making
    buckets tiles is morton(x, y) >> 2k == morton(x >> k, y >> k)
    (interleaved bits shift out pairwise). The returned IN-list turns
    a 2-D range predicate into partition pruning on a zbucket
    partition column — the directory-level analog of what file-level
    z-clustering + min/max stats give on a real lakehouse layout."""
    return sorted(
        py_morton(xt, yt)
        for xt in range(x_lo >> tile_bits, (x_hi >> tile_bits) + 1)
        for yt in range(y_lo >> tile_bits, (y_hi >> tile_bits) + 1)
    )


def zorder_keys(
    df: DataFrame,
    x_col: str,
    y_col: str,
    tile_bits: int = 4,
) -> DataFrame:
    """Append (zkey, zbucket) to df: zkey interleaves x_col/y_col
    (callers pre-bucket each dimension into [0, 2^16)), zbucket is the
    aligned-tile id used as the write partition column. Pure
    projection — no shuffle; the shuffle happens (once, on zbucket)
    only when the layout is WRITTEN, and it is the same shuffle the
    partitioned write needs anyway."""
    return df.withColumn("zkey", F.expr(morton_key_sql(x_col, y_col))).withColumn(
        "zbucket", F.expr(f"zkey >> {2 * tile_bits}")
    )
