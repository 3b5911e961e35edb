"""AMS sketch for the second frequency moment (Alon, Matias & Szegedy,
STOC'96): k counters X_j = sum over stream occurrences of sign_j(item),
sign_j(item) = +/-1 from a per-counter hash; E[X_j^2] = F2 = sum_v
f_v^2, and the estimate is the mean of the k squares. F2 drives
self-join size estimation (the exact cost of every equi-join this
engine plans) and skew scoring — and the sketch is LINEAR: the sketch
of a union of streams is the elementwise sum of their sketches, so
executors sketch partitions independently and merging is one k-row
add, the canonical distributed-aggregation shape.

Spark shape: the k signs are computed per occurrence as k column
expressions summed by ONE map-side-combined aggregate — no k-fold row
explosion, no shuffle of the stream (the only exchange moves the
k partial sums per partition). Signs come from the repo's md5 bridge
(parity of the first hex nibble of md5("j:item")), exact and
reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _sign(j: int, token: Column) -> Column:
    nib = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), token)), 1, 1), 16, 10
    ).cast("long")
    return F.lit(1) - F.lit(2) * (nib % 2)


def ams_sketch(tokens: DataFrame, k: int = 16, token_col: str = "token") -> DataFrame:
    """(counter, x): the k AMS counters over the token stream WITH
    multiplicity. Deterministic; empty input yields k zero rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    t = F.col(token_col)
    sums = tokens.agg(
        *[
            F.coalesce(F.sum(_sign(j, t)), F.lit(0)).cast("long").alias(f"x{j}")
            for j in range(k)
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("counter"), F.col(f"x{j}").alias("x"))
            for j in range(k)
        ]
    )
    return sums.select(F.explode(pairs).alias("p")).select("p.counter", "p.x")


def ams_f2_estimate(sketch: DataFrame) -> DataFrame:
    """1-row (k, sum_x2, f2_est) from an ams_sketch result; the
    estimate is the mean of squares (use median-of-means across
    independent sketches for tail bounds)."""
    return sketch.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
    ).select(
        "k",
        "sum_x2",
        (F.col("sum_x2").cast("double") / F.col("k")).alias("f2_est"),
    )
