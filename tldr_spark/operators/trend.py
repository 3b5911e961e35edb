"""Mann-Kendall monotonic-trend test (Mann '45, Kendall '75) per group
over a dense bucketed count series: S = sum over bucket pairs i < j of
sign(x_j - x_i); variance with the tie correction
Var(S) = [T(T-1)(2T+5) - sum_k t_k(t_k-1)(2t_k+5)] / 18 over the tie
groups t_k; z = (S -/+ 1)/sqrt(Var) with the standard continuity
shift, 0 when S = 0 or Var = 0.

S and the scaled variance numerator are EXACT integers (the pair
count is a self-join of integer counts; tie groups come from a value
groupBy), so the only floats are the final sqrt and division — one
IEEE sequence, identical cross-engine, quantized by callers.

Spark shape: same dense arithmetic axis as changepoint.py (gap buckets
are zero and DO tie — the tie correction absorbs them); the pair pass
is a group-keyed equi-join with an i < j filter — O(T^2) rows per
group with T the bounded analysis window, groups scale out. One count
shuffle, one pair-join shuffle, one value-tie shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_STEPS = {"hour": 3600, "day": 86400}


def mann_kendall(
    events: DataFrame,
    time_col: str = "ts",
    group_col: str = "group",
    bucket: str = "day",
) -> DataFrame:
    """(group, s_stat, var18, n_buckets, z): Mann-Kendall S, the
    integer 18*Var(S), the axis length and the continuity-corrected
    z-score per group."""
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
        .select("g", "big_t", F.explode(F.sequence(F.lit(1), F.col("big_t"))).alias("i"))
        .join(counts, ["g", "i"], "left")
        .withColumn("x", F.coalesce(F.col("x"), F.lit(0)))
    )
    s_stat = (
        grid.select("g", F.col("i").alias("ia"), F.col("x").alias("xa"))
        .join(grid.select("g", F.col("i").alias("ib"), F.col("x").alias("xb")), "g")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("g")
        .agg(F.sum(F.signum(F.col("xb") - F.col("xa")).cast("long")).alias("s_stat"))
    )
    ties = (
        grid.groupBy("g", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    return (
        s_stat.join(ties, "g")
        .join(F.broadcast(ax.select("big_t")))
        .select(
            F.col("g").alias("group"),
            "s_stat",
            (
                F.col("big_t") * (F.col("big_t") - 1) * (2 * F.col("big_t") + 5)
                - F.col("tie_term")
            ).alias("var18"),
            F.col("big_t").alias("n_buckets"),
        )
        .withColumn(
            "z",
            F.when((F.col("s_stat") == 0) | (F.col("var18") == 0), F.lit(0.0))
            .when(
                F.col("s_stat") > 0,
                (F.col("s_stat") - 1) / F.sqrt(F.col("var18") / F.lit(18.0)),
            )
            .otherwise(
                (F.col("s_stat") + 1) / F.sqrt(F.col("var18") / F.lit(18.0))
            ),
        )
    )
