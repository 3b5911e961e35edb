"""Log-histogram quantile estimation — the deterministic, mergeable,
order-free alternative to sorting for percentiles at scale (the same
family as DDSketch, Datadog VLDB'19: geometric buckets give a bounded
RELATIVE error). Bucket b = floor(log2(v) * k) holds values in
[2^(b/k), 2^((b+1)/k)), so the upper-bound estimate is within a factor
2^(1/k) of the true quantile, and the sketch is a bucket->count map:
partitions histogram independently, merging is addition, and a
10^12-row quantile costs ONE groupBy instead of a global sort.

Estimated quantile = the upper edge of the first bucket whose
cumulative count reaches ceil(q * n) (ranks in exact integer
arithmetic: (n*qn + den - 1) div den). The operator ALSO emits the
exact rank-statistic value (robust.py convention: value at rank
ceil(q*n), no interpolation) so every row self-validates the
guarantee exact <= est < exact * 2^(1/k) — production use drops the
exact column and with it the only sort.

Values must be positive integers (cents); zero/negative rows raise at
plan time via an ANSI-mode-safe filter convention: they are excluded
and counted separately would hide bugs, so callers pre-clean."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_LN2 = 0.6931471805599453


def log_histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 16,
    quantiles: tuple[tuple[int, int], ...] = ((50, 100), (95, 100), (99, 100)),
) -> DataFrame:
    """(group, q_num, q_den, n, bucket, est, exact) per group and
    quantile, from positive integer values."""
    if k < 1:
        raise ValueError("k must be >= 1")
    for qn, qd in quantiles:
        if not 0 < qn <= qd:
            raise ValueError(f"quantile {qn}/{qd} out of (0, 1]")
    v = F.col(value_col).cast("long")
    base = df.select(F.col(group_col).alias("g"), v.alias("v")).where(v > 0)
    bucket = F.floor(F.log(F.col("v").cast("double")) / F.lit(_LN2) * k).cast("long")
    hist = (
        base.select("g", bucket.alias("b"), F.col("v"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy("g").orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("g"))
    )
    wrank = Window.partitionBy("g").orderBy("v", F.monotonically_increasing_id())
    ranked = base.withColumn("rn", F.row_number().over(wrank)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    qdf = None
    for qn, qd in quantiles:
        rank = (F.col("n") * qn + (qd - 1)) / qd
        rank = F.floor(rank).cast("long")  # = ceil(n*qn/qd) for integers
        qb = (
            cum.where(F.col("cum") >= rank)
            .groupBy("g", "n")
            .agg(F.min("b").alias("bucket"))
            .select(
                "g",
                F.lit(qn).alias("q_num"),
                F.lit(qd).alias("q_den"),
                "n",
                "bucket",
                F.pow(F.lit(2.0), (F.col("bucket") + 1).cast("double") / k).alias("est"),
            )
        )
        ex = (
            ranked.where(F.col("rn") == rank)
            .select("g", F.col("v").alias("exact"))
        )
        one = qb.join(ex, "g")
        qdf = one if qdf is None else qdf.unionByName(one)
    return qdf.select(
        F.col("g").alias("group"), "q_num", "q_den", "n", "bucket", "est", "exact"
    )
