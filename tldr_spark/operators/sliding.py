"""Exact sliding-window distinct counts (trailing W buckets) — "24h
active users per hour" — WITHOUT per-window set enumeration and
without sketches: an occurrence of key k at bucket t whose previous
occurrence sits at bucket p is the window's FIRST occurrence of k for
exactly the windows ending in h in [max(t, p + W), t + W - 1]. Scatter
+1/-1 at the interval ends (a difference array) and one running sum
over the bucket axis yields every window's exact distinct count.

Cost: two rows per (key, bucket) occurrence pair + ONE ordered prefix
sum over the bounded bucket axis — O(events) work, no window x key
blowup, no COUNT(DISTINCT) over overlapping frames (which Spark
cannot even express in a sliding frame without exploding). This is the
same previous-occurrence interval algebra as mattr.py, applied to
time instead of token position.

Windows with no events at all still report (their count may be
non-zero — carried by spans from earlier buckets — or zero): the
dense axis is arithmetic like changepoint.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_STEPS = {"hour": 3600, "day": 86400}


def sliding_distinct(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "key",
    bucket: str = "hour",
    window: int = 24,
) -> DataFrame:
    """(bucket_epoch, distinct_keys): for every bucket h in the data's
    span, the number of distinct keys with >= 1 event in the trailing
    ``window`` buckets (h - window + 1 .. h)."""
    if bucket not in _STEPS:
        raise ValueError(f"bucket must be one of {sorted(_STEPS)}")
    if window < 1:
        raise ValueError("window must be >= 1")
    step = _STEPS[bucket]
    ev = events.select(
        F.col(key_col).alias("k"),
        F.unix_timestamp(F.date_trunc(bucket, F.col(time_col))).cast("long").alias("te"),
    ).distinct()  # one row per (key, bucket)
    ax = ev.agg(
        F.min("te").alias("t0"),
        (((F.max("te") - F.min("te")) / step).cast("long") + 1).alias("big_t"),
    )
    occ = (
        ev.join(F.broadcast(ax))
        .withColumn("t", ((F.col("te") - F.col("t0")) / step).cast("long") + 1)
        .withColumn(
            "p", F.lag("t", 1, -(10**9)).over(Window.partitionBy("k").orderBy("t"))
        )
    )
    lo = F.greatest(F.col("t"), F.col("p") + window)
    hi = F.least(F.col("t") + (window - 1), F.col("big_t"))
    spans = occ.where(lo <= hi).select(
        "t0", "big_t", lo.alias("lo"), hi.alias("hi")
    )
    deltas = spans.select("t0", "big_t", F.col("lo").alias("h"), F.lit(1).alias("d")).union(
        spans.where(F.col("hi") + 1 <= F.col("big_t")).select(
            "t0", "big_t", (F.col("hi") + 1).alias("h"), F.lit(-1).alias("d")
        )
    )
    per_bucket = deltas.groupBy("t0", "big_t", "h").agg(F.sum("d").alias("d"))
    axis = (
        F.broadcast(ax)
        .select("t0", "big_t", F.explode(F.sequence(F.lit(1), F.col("big_t"))).alias("h"))
        .join(per_bucket, ["t0", "big_t", "h"], "left")
        .withColumn("d", F.coalesce(F.col("d"), F.lit(0)))
    )
    run = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return axis.select(
        (F.col("t0") + (F.col("h") - 1) * step).alias("bucket_epoch"),
        F.sum("d").over(run).alias("distinct_keys"),
    )
