"""Range (interval) join: match point rows to interval rows with
``start <= t <= end`` — the temporal containment join (event→maintenance
window, click→error burst, log line→deploy window) that Spark SQL plans
as a BroadcastNestedLoopJoin theta join, O(|points|·|intervals|).

Spark-first shape: fixed-width time bucketing. Points land in bucket
floor(t/W); each interval explodes to the buckets it covers
(floor(start/W)..floor(end/W), ceil(len/W)+1 rows — bounded when interval
length is bounded); the join is then a plain hash equi-join on
(key, bucket) with the exact BETWEEN as a post-filter. Every matching
(point, interval) pair meets in EXACTLY one bucket — the point's — so no
dedup pass is needed. Cost: one shuffle each side on (key, bucket), join
fan-in per bucket = points-in-bucket × intervals-covering-bucket; pick
``bucket_width`` ≈ the typical interval length so intervals explode to
~2 rows. Skew ceiling is the hottest bucket, the same knob AQE skew-join
splits.

Reference parity note: no temporal operators exist in the reference; this
is beyond-the-reference pipeline surface alongside asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: str | None = None,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    ``start <= point_ts <= end`` (and equal ``on`` key when given).
    Returns all point columns + all interval columns. Timestamps and
    bounds must be integers (epoch micros by this repo's convention);
    intervals with end < start match nothing.
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    clash = set(points.columns) & set(intervals.columns) - ({on} if on else set())
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    pb = points.withColumn("__bucket", F.floor(F.col(point_ts) / bucket_width))
    ib = intervals.where(F.col(end_col) >= F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    keys = ["__bucket"] + ([on] if on else [])
    return (
        pb.join(ib, keys)
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bucket")
    )
