"""Traffic anomaly detection: hourly burst flags over the event stream.

A crawl/serving pipeline watches for hours whose event volume spikes
above the corpus's own baseline — the classic mean + 2-sigma rule over
the hourly count series (the cheap, exact cousin of Kleinberg's burst
automaton; at web scale the per-hour counts feed the same dashboards).

Cross-engine exactness: with n observed hours, S = sum of counts and
S2 = sum of squared counts, the flag

    c > mean + 2*sigma_pop   <=>   n*c > S  AND  (n*c - S)^2 > 4*(n*S2 - S^2)

is PURE INTEGER arithmetic — no float mean/variance to drift. The
reported z-score (n*c - S) / sqrt(n*S2 - S^2) costs one correctly-
rounded IEEE sqrt + one division from identical integers (the
directed_assortativity precedent), then 2^-20 quantization.

Scale shape: one map-combined hour aggregate over E events, one 1-row
global-stats frame broadcast back — two stages total. Overflow: S2
sums c^2 over hours; c ~ 10^9 events/hour overflows int64 at ~1 hour,
so c is bounded by bucketing first (hourly counts at even extreme web
scale are < 10^12, and n*S2 < 2^63 holds to ~10^5 hours x 10^7/hour;
beyond that, swap the BIGINTs for DECIMAL(38,0) like mixing.py).

Reference semantics scope: didasy/tldr has no temporal surface; this
extends the events-table analytics (events_hourly, sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hourly_bursts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(hour_epoch, n_events, burst, z_q): every OBSERVED hour's event
    count, a mean+2*sigma burst flag decided in exact integer arithmetic,
    and the 2^-20-quantized z-score. Hours with zero events do not form
    rows (sparse series semantics)."""
    hourly = events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", ts_col)).alias("hour_epoch")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = hourly.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("n_events").alias("_s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("_s2"),
    )
    dev = F.col("_n") * F.col("n_events") - F.col("_s")  # n*c - S
    var_n2 = F.col("_n") * F.col("_s2") - F.col("_s") * F.col("_s")  # n^2*var
    return hourly.crossJoin(F.broadcast(stats)).select(
        "hour_epoch",
        "n_events",
        ((dev > 0) & (dev * dev > 4 * var_n2)).cast("long").alias("burst"),
        F.when(var_n2 > 0, F.round(dev / F.sqrt(var_n2) * 1048576))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("z_q"),
    )
