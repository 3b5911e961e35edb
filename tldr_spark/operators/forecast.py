"""Forecast-baseline evaluation over event time series — the capacity-
planning sanity check every ingestion pipeline runs before trusting a
fancier model: score the SEASONAL-NAIVE forecast (y_hat(t) = y(t - s),
s = 24 h) against the one-step naive walk (y_hat(t) = y(t-1)) with
MAE and MASE (Hyndman & Koehler 2006; MASE < 1 = seasonality is real
signal, worth modeling).

The hourly series is DENSIFIED onto a complete per-group hour spine
(missing hours count 0) — lag-based scores on a gappy series silently
compare non-adjacent hours and overstate accuracy. Spine construction
is `sequence()` on integer epochs: exact, engine-agnostic.

All numerators/denominators are integer sums of absolute integer
errors; the two ratios at the end are the only doubles.

Scale shape: one (group, hour) map-side-combined count, a per-group
spine explode (rows = groups x hours — the series itself), one
group-partitioned ORDER BY hour window for the two lags, one final
group aggregate. No driver loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def seasonal_naive_eval(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    season: int = 24,
) -> DataFrame:
    """(grp, n_scored, mae_seasonal_num, mae_naive_num, mase) per group.
    n_scored = hours with both lags defined (hour index >= season);
    mase = mean|y - y_{t-season}| / mean|y - y_{t-1}| over those hours
    (NULL when the naive denominator is 0)."""
    hours = events.select(
        F.col(group_col).alias("grp"),
        (F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / 3_600_000_000))
        .cast("long")
        .alias("h"),
    )
    counts = hours.groupBy("grp", "h").agg(F.count(F.lit(1)).alias("y"))
    span = counts.groupBy("grp").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = span.select(
        "grp", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    dense = spine.join(counts, ["grp", "h"], "left").select(
        "grp", "h", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    w = Window.partitionBy("grp").orderBy("h")
    scored = dense.select(
        "grp",
        "y",
        F.lag("y", season).over(w).alias("ys"),
        F.lag("y", 1).over(w).alias("y1"),
    ).filter(F.col("ys").isNotNull())
    return (
        scored.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.abs(F.col("y") - F.col("ys"))).alias("mae_seasonal_num"),
            F.sum(F.abs(F.col("y") - F.col("y1"))).alias("mae_naive_num"),
        )
        .select(
            "grp",
            "n_scored",
            "mae_seasonal_num",
            "mae_naive_num",
            F.when(
                F.col("mae_naive_num") > 0,
                F.col("mae_seasonal_num") / F.col("mae_naive_num").cast("double"),
            ).alias("mase"),
        )
    )
