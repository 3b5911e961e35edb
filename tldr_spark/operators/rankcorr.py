"""Spearman rank correlation between two scorings of the same id space
— the standard "did the ranking actually change?" statistic for crawl-
over-crawl authority drift (a complement to top-k movers: movers show
WHO changed, rho says HOW MUCH the whole ordering changed).

rho = 1 - 6 * sum(d_i^2) / (n (n^2 - 1)), d_i = rank difference of id i
between the two sides over the ids present in BOTH (each side is
semi-joined to the other BEFORE ranking — ranks are positions within
the common subset, not the full side). Ranks follow the explicit total
order (score DESC, id ASC); scores must be quantized integers so ties
break identically cross-engine. Degenerate n <= 1 yields NULL rho.

Spark shape: global positions come from fusion.rank_positions — the
range-partition + partition-offset prefix-sum global rank, NOT a
single-partition window sort, so ranking 10^9 ids stays distributed;
then one id join and one global aggregate. sum(d^2) stays in int64
(< n^3; exact for n up to ~2 million — beyond that, pre-aggregate in
DECIMAL), and rho is one double division."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tldr_spark.operators.fusion import rank_positions


def spearman_rho(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """1-row (n, sum_d2, rho) over the ids present in BOTH frames.
    ``score_col`` must be integral — pre-quantize floats."""
    aa = a.select(F.col(id_col).alias("id"), F.col(score_col).alias("score"))
    bb = b.select(F.col(id_col).alias("id"), F.col(score_col).alias("score"))
    ca = aa.join(bb.select("id"), "id", "left_semi")
    cb = bb.join(aa.select("id"), "id", "left_semi")
    ra = rank_positions(ca, "score", "id").withColumnRenamed("pos", "rank_a")
    rb = rank_positions(cb, "score", "id").withColumnRenamed("pos", "rank_b")
    d = F.col("rank_a") - F.col("rank_b")
    agg = ra.join(rb, "id").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(d * d), F.lit(0)).alias("sum_d2"),
    )
    return agg.select(
        "n",
        "sum_d2",
        F.when(F.col("n") <= 1, F.lit(None).cast("double"))
        .otherwise(
            F.lit(1.0)
            - F.lit(6.0)
            * F.col("sum_d2")
            / (F.col("n").cast("double") * (F.col("n") * F.col("n") - 1))
        )
        .alias("rho"),
    )
