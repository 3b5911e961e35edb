"""Hypertable-style hierarchical time rollup — the continuous-aggregate
ladder (minute → hour → day) a time-series store maintains: the finest
level is aggregated from raw ONCE, and every coarser level is re-aggregated
from the previous level's partials, never from raw.

That re-aggregation is the whole point at scale: a day-level rollup over
10^12 raw events costs one scan of the hour-level table (10^5-10^6 rows),
not a second scan of the raw table. It is only correct for MERGEABLE
aggregates — count/sum/min/max here (mean derives as sum/count; for
distinct-ish measures see the KMV/count-min sketches elsewhere in this
package). The differential oracle computes every level directly from raw,
so the merge algebra itself is what gets verified.

Buckets are epoch-second floors (``floor(t / level) * level``) — levels
must nest (each coarser level a multiple of the finer) or coarse buckets
would straddle fine ones and the rollup would be silently wrong; the
constructor enforces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_AGGS = ("n", "sum_v", "min_v", "max_v")


def rollup_levels(
    df: DataFrame,
    ts_sec_col: str,
    value_col: str,
    levels: list[int],
    materialize: bool = True,
) -> DataFrame:
    """(level_s, bucket_s, n, sum_v, min_v, max_v): one row per bucket per
    level. ``ts_sec_col`` is integer epoch seconds; ``value_col`` must be
    an exact (integer/decimal) type — pass cents, not float dollars, so
    partial-sum merge order cannot change the answer. levels[0] is
    aggregated from raw; levels[i>0] from levels[i-1].

    ``materialize`` (default) lazily localCheckpoints each level before it
    feeds both the output union and the next level — without it Catalyst
    re-derives every level from raw once per union branch (3 raw scans for
    3 levels), which is exactly what a continuous aggregate exists to
    avoid; a production deployment would write each level to storage
    (Iceberg table per level) instead."""
    if not levels:
        raise ValueError("levels must be non-empty")
    if any(l < 1 for l in levels):
        raise ValueError("levels must be positive")
    for fine, coarse in zip(levels, levels[1:]):
        if coarse % fine != 0 or coarse <= fine:
            raise ValueError(
                f"levels must strictly nest: {coarse} is not a proper multiple of {fine}"
            )

    def bucket(col, width):
        return (F.floor(col / width) * width).cast("long").alias("bucket_s")

    cur = (
        df.select(bucket(F.col(ts_sec_col), levels[0]), F.col(value_col).alias("v"))
        .groupBy("bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )
    if materialize:
        cur = cur.localCheckpoint(eager=False)
    out = cur.withColumn("level_s", F.lit(levels[0]).cast("long"))
    for width in levels[1:]:
        cur = (
            cur.select(bucket(F.col("bucket_s"), width), *_AGGS)
            .groupBy("bucket_s")
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
        )
        if materialize:
            cur = cur.localCheckpoint(eager=False)
        out = out.unionByName(cur.withColumn("level_s", F.lit(width).cast("long")))
    return out.select(
        "level_s", "bucket_s", F.col("n").cast("long").alias("n"),
        F.col("sum_v").cast("long").alias("sum_v"),
        F.col("min_v").cast("long").alias("min_v"),
        F.col("max_v").cast("long").alias("max_v"),
    )
