"""Cohort retention — the standard clickstream/engagement matrix.

Assign every user to the cohort period of their FIRST event (period =
epoch-days integer-divided by ``unit_days``, so the bucketing is pure
int64 arithmetic — identical in Spark, DuckDB, and any other engine:
no calendar/week-start/timezone semantics to disagree on). For each
(cohort, offset) cell, count the distinct users of that cohort active
``offset`` periods after their first event. Cell (c, 0) is the cohort
size; n_users is monotone non-increasing in offset only in aggregate,
not per user (users can skip periods and return — the matrix keeps the
true re-activation signal).

Scale shape (the 100-TB story): one project to (user, period), ONE
distinct on (user, period) — this is also the map-side-combinable
dedup that bounds everything downstream to <= users x periods rows —
one user-keyed min-aggregate for the cohort assignment, one hash join
back on user_id (users x periods rows vs users rows: AQE picks
broadcast when cohorts fit, shuffle otherwise), and a final
map-side-combined count per (cohort, offset). No windows, no driver
rows, no per-row Python. Hot users contribute at most
n_periods rows after the distinct, so user skew is capped by the
calendar, not by event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_US_PER_DAY = 86_400_000_000


def retention_cohorts(
    events: DataFrame,
    unit_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_start: date, offset: long, n_users: long) — distinct users
    of each first-event cohort active ``offset`` units later. Periods are
    floor(epoch_days / unit_days); ``cohort_start`` is the period's first
    calendar day (period * unit_days days after 1970-01-01). NTZ
    timestamps are interpreted in the session zone, which session.py
    pins to UTC — identical to DuckDB's epoch_us over a naive timestamp."""
    if unit_days <= 0:
        raise ValueError(f"unit_days must be positive, got {unit_days}")
    per = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        )
        .select(
            "user_id",
            F.expr(f"(us div {_US_PER_DAY}) div {int(unit_days)}").alias("period"),
        )
        .distinct()
    )
    first = per.groupBy("user_id").agg(F.min("period").alias("cohort"))
    return (
        per.join(first, "user_id")
        .groupBy("cohort", (F.col("period") - F.col("cohort")).alias("offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_add(
                F.to_date(F.lit("1970-01-01")),
                (F.col("cohort") * int(unit_days)).cast("int"),
            ).alias("cohort_start"),
            "offset",
            "n_users",
        )
    )
