"""Z-order (Morton) interleaving for two-dimensional data layout —
the clustering key behind Delta/Iceberg OPTIMIZE ZORDER: sorting an
edge table by the bit-interleaved (src, dst) key places edges whose
endpoints are BOTH near each other in the same file ranges, so
point/range lookups on either column prune most files (a single-column
sort clusters one dimension and scatters the other).

The encode is the branch-free magic-mask spread (each 32-bit value's
bits moved to even positions in 5 shift-and-mask steps), pure int64
bit algebra — identical in any engine, no UDFs, no shuffle: a
projection on a 10^12-row table.

The locality law this buys (and the thing the stats query measures):
keys agreeing on all but the low s bits agree on all but the low
~ceil(s/2) bits of EACH coordinate, so a "file" of edges sharing the
key prefix spans < 2^ceil(s/2) in src AND in dst — bounded min/max
column ranges per file are exactly what format-level zone maps prune
with."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread(x: Column) -> Column:
    """Spread the low 32 bits of x to the even bit positions of int64."""
    for shift, mask in _MASKS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_key(x: Column, y: Column) -> Column:
    """The 64-bit Morton interleave of two values in [0, 2^32): x on
    even bits, y on odd bits."""
    return _spread(x.cast("long")).bitwiseOR(F.shiftleft(_spread(y.cast("long")), 1))


def zorder_layout_stats(
    df: DataFrame, x_col: str, y_col: str, shift: int = 32
) -> DataFrame:
    """(bucket, n_rows, x_min, x_max, y_min, y_max): rows grouped by
    the Morton key >> shift ("files" of a z-ordered layout) with the
    per-file column ranges a zone map would store. Spans are bounded by
    2^ceil(shift/2) per dimension — the pruning guarantee."""
    if not 0 <= shift <= 63:
        raise ValueError("shift must be in [0, 63]")
    key = morton_key(F.col(x_col), F.col(y_col))
    return (
        df.select(
            F.shiftrightunsigned(key, shift).alias("bucket"),
            F.col(x_col).cast("long").alias("x"),
            F.col(y_col).cast("long").alias("y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
