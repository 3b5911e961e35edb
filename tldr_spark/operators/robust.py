"""Robust per-group statistics: exact lower median, MAD (median absolute
deviation), and the 3-sigma-equivalent outlier flag — the data-cleaning
pass that survives the heavy-tailed value distributions mean/stddev break
on (one fat-fingered 10^9 value moves a mean arbitrarily; it moves a
median by one rank).

Everything is EXACT rank statistics, not approx-percentile: the lower
median is the value at 1-based rank ceil(n/2) in (value, tiebreak) order —
a deterministic row every engine agrees on, unlike interpolated medians
whose midpoint arithmetic differs. MAD repeats the same rank pick on
|v - median|. The outlier test |v - med| * 10000 > 44478 * mad is the
classic 3 * 1.4826 * MAD Gaussian-consistent threshold cleared of floats:
with integer inputs (cents) the whole operator is integer arithmetic end
to end.

Shape: two window-sort passes over the value column (one per median),
each a single hash shuffle on the group key; skew ceiling = largest
group. No driver rows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 3 * 1.4826 (the Gaussian MAD-to-sigma constant), times 1e4 and rounded,
# so the comparison stays in int64.
_THRESH_NUM = 44478
_THRESH_DEN = 10_000


def _grouped_median(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """(key, out): exact lower median of ``val`` per group."""
    w = Window.partitionBy(key).orderBy(F.col(val).asc())
    ranked = df.select(key, val).withColumn("__rn", F.row_number().over(w))
    n = df.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.join(n, key)
        .where(F.col("__rn") == F.ceil(F.col("__n") / 2))
        .select(key, F.col(val).alias(out))
    )


def robust_outliers(
    df: DataFrame, key: str, val: str
) -> DataFrame:
    """(key, n, med, mad, n_outliers): per group, the exact lower median,
    the MAD, and how many rows clear 3·1.4826·MAD. ``val`` should be an
    integer column (e.g. cents) for end-to-end exactness; a MAD of 0
    (over half the group identical) flags every non-median value, the
    standard degenerate-MAD behavior — callers wanting leniency should
    pre-deduplicate."""
    med = _grouped_median(df, key, val, "med")
    dev = df.select(key, val).join(med, key).withColumn(
        "__ad", F.abs(F.col(val) - F.col("med"))
    )
    mad = _grouped_median(dev, key, "__ad", "mad")
    flagged = (
        dev.join(mad, key)
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med").cast("long").alias("med"),
            F.max("mad").cast("long").alias("mad"),
            F.sum(
                F.when(
                    F.col("__ad") * _THRESH_DEN > _THRESH_NUM * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
    return flagged
