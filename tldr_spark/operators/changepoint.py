"""CUSUM mean-shift changepoint estimation (Page '54 / Pettitt-style
max-deviation form): per group, over a dense bucketed count series
x_1..x_T, the changepoint estimate is the bucket t maximizing
|S_t - (t/T) * S_T| where S_t is the prefix sum — the point where the
observed cumulative mass deviates most from the uniform-rate line.

All comparisons run in EXACT INTEGER arithmetic: the deviation is
|T * S_t - t * S_T| (the same argmax as the rational form, scaled by
T), so the argmax and the reported statistic are engine-independent by
construction — no floats anywhere. Ties break to the EARLIEST bucket.

Spark shape: the dense axis is arithmetic (bucket epochs are exact
step multiples); the group x axis grid left-joins the observed counts
(zero-count buckets matter — the maximum deviation can sit inside a
gap); ONE group-keyed window sort produces the prefix sums and the
argmax is a min(struct(-dev, t)) aggregate on the same shuffle. Groups
scale out; T is the bounded analysis window."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_STEPS = {"hour": 3600, "day": 86400}


def cusum_changepoints(
    events: DataFrame,
    time_col: str = "ts",
    group_col: str = "group",
    bucket: str = "day",
) -> DataFrame:
    """(group, cp_epoch, dev_scaled, total, n_buckets): per group the
    max-|deviation| bucket (its END, i.e. the shift is between
    cp_epoch and the next bucket), the integer deviation
    |T*S_t - t*S_T|, the series total S_T and the axis length T."""
    if bucket not in _STEPS:
        raise ValueError(f"bucket must be one of {sorted(_STEPS)}")
    step = _STEPS[bucket]
    ev = events.select(
        F.col(group_col).alias("g"),
        F.unix_timestamp(F.date_trunc(bucket, F.col(time_col))).cast("long").alias("te"),
    )
    ax = ev.agg(
        F.min("te").alias("t0"),
        (((F.max("te") - F.min("te")) / step).cast("long") + 1).alias("big_t"),
    )
    counts = (
        ev.join(F.broadcast(ax))
        .withColumn("i", ((F.col("te") - F.col("t0")) / step).cast("long") + 1)
        .groupBy("g", "i")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    grid = (
        counts.select("g")
        .distinct()
        .join(F.broadcast(ax))
        .select(
            "g", "t0", "big_t", F.explode(F.sequence(F.lit(1), F.col("big_t"))).alias("i")
        )
        .join(counts, ["g", "i"], "left")
        .withColumn("x", F.coalesce(F.col("x"), F.lit(0)))
    )
    wcum = Window.partitionBy("g").orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("g")
    scored = (
        grid.withColumn("s", F.sum("x").over(wcum))
        .withColumn("tot", F.sum("x").over(wall))
        .withColumn(
            "dev", F.abs(F.col("big_t") * F.col("s") - F.col("i") * F.col("tot"))
        )
    )
    # argmax deviation, earliest bucket on ties; exclude t = T (deviation
    # is identically 0 there, and "shift after the last bucket" is no shift)
    return (
        scored.where(F.col("i") < F.col("big_t"))
        .groupBy("g", "t0", "big_t", "tot")
        .agg(
            F.max(F.struct(F.col("dev").alias("d"), (-F.col("i")).alias("ni"))).alias("m")
        )
        .select(
            F.col("g").alias("group"),
            (F.col("t0") + (-F.col("m.ni") - 1) * step).alias("cp_epoch"),
            F.col("m.d").alias("dev_scaled"),
            F.col("tot").alias("total"),
            F.col("big_t").alias("n_buckets"),
        )
    )
