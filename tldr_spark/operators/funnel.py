"""Ordered funnel conversion over the clickstream.

The standard product-analytics question — of the users who did step 1,
how many went on to do step 2 AFTER it, then step 3 after that — with
the earliest-match semantics every funnel engine uses: a user's step-k
timestamp is the MINIMUM event time of step-k's type that is STRICTLY
after their step-(k-1) timestamp (greedy earliest matching is optimal
here: an earlier prefix match can only admit more suffix matches).

Spark shape: one hash join + one map-side-combined min aggregate PER
STEP — the frontier after step k is one row per surviving user, so
every join is (events of one type) x (shrinking user frontier), never
events x events. K steps = K shuffles, each keyed on user_id; at web
scale the per-type event filter is pushed to the scan (event_type is
a pushed filter on the parquet source).

Determinism: min-timestamp matching only; no RNG, no order dependence.
Ties between two events of the SAME type at the same microsecond
collapse into one min — identical in the SQL oracle.

Reference semantics scope: didasy/tldr has no event analytics; this is
the clickstream layer (pairs with sessions.py and temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, event_type, n_users) — users completing each funnel prefix
    in timestamp order. ``steps`` is the ordered list of event types."""
    if not steps:
        raise ValueError("steps must be non-empty")
    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(ts_col).cast("timestamp").alias("t"),
    )
    frontier = None
    out_rows = []
    for i, step in enumerate(steps, start=1):
        matches = ev.filter(F.col("et") == step)
        if frontier is None:
            frontier = matches.groupBy("u").agg(F.min("t").alias("t"))
        else:
            prev = frontier.select("u", F.col("t").alias("_pt"))
            frontier = (
                matches.join(prev, "u")
                .filter(F.col("t") > F.col("_pt"))
                .groupBy("u")
                .agg(F.min("t").alias("t"))
            )
        frontier = frontier.localCheckpoint(eager=True)
        out_rows.append((i, step, frontier.count()))
    return spark.createDataFrame(
        out_rows, "step long, event_type string, n_users long"
    )
