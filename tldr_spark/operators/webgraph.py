"""WebGraph-style adjacency-gap encoding statistics — how compressible
the link graph's adjacency lists are under delta-gap coding (Boldi &
Vigna, "The WebGraph Framework I", WWW'04 §3: successor lists sorted
ascending, first successor zigzag-encoded against the source id, the
rest as gaps). The statistic is the storage planner's input: estimated
bits/edge by out-degree bucket vs the 64-bit raw encoding, computed
exactly in integer arithmetic.

Cost model (γ-code order-of-magnitude, integer-exact):
  first successor d1:   bits(zigzag) = bitlen(2*|d1 - src| + 1)
  subsequent gap g>=1:  bits(g)      = bitlen(g)           (g = d_i - d_{i-1})
where bitlen(x) = floor(log2 x) + 1 is computed as the LENGTH OF THE
BINARY STRING (never floor(log2(double)) — fp log at power-of-2
boundaries is off-by-one bait), so both engines agree bit-for-bit.

Spark shape: one distinct over (src, dst) (map-side combined), one
src-partitioned window sort (the natural adjacency-list layout — at
100 TB this is exactly the CSR/bucketed layout the engine already uses
for prepared edges, so the sort is per-partition-local), one bucket
aggregate. No UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _bitlen(col):
    """floor(log2(x)) + 1 for x >= 1, via binary-string length (exact)."""
    return F.length(F.conv(col.cast("string"), 10, 2)).cast("long")


def adjacency_gap_bits(edges: DataFrame) -> DataFrame:
    """Per out-degree-bucket gap-coding stats over the distinct directed
    adjacency: (deg_bucket, n_srcs, n_edges, total_bits, bits_per_edge
    rational as *_q, raw_bits). deg_bucket = bitlen(outdeg)."""
    adj = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    per_edge = adj.select(
        "src",
        "dst",
        F.lag("dst").over(w).alias("prev"),
    ).select(
        "src",
        F.when(
            F.col("prev").isNull(),
            _bitlen(F.lit(2) * F.abs(F.col("dst") - F.col("src")) + 1),
        )
        .otherwise(_bitlen(F.col("dst") - F.col("prev")))
        .alias("bits"),
    )
    per_src = per_edge.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg"), F.sum("bits").alias("src_bits")
    )
    return (
        per_src.groupBy(_bitlen(F.col("outdeg")).alias("deg_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_srcs"),
            F.sum("outdeg").alias("n_edges"),
            F.sum("src_bits").alias("total_bits"),
        )
        .select(
            "deg_bucket",
            "n_srcs",
            "n_edges",
            "total_bits",
            F.round(F.col("total_bits") * 16384 / F.col("n_edges"))
            .cast("long")
            .alias("bits_per_edge_q"),
            (F.lit(64) * F.col("n_edges")).alias("raw_bits"),
        )
    )
