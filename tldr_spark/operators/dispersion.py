"""Token dispersion DP (Gries 2008, "Dispersions and adjusted
frequencies in corpus linguistics"): for a token with per-part
frequencies f_i over corpus parts of sizes n_i (N = sum n_i,
F = sum f_i),

    DP = 0.5 * sum_i | f_i/F - n_i/N |      in [0, 1)

0 = the token is spread across parts exactly like the text mass
(function words); near 1 = concentrated in one part (topical/ bursty
terms, source-specific boilerplate). The standard corpus-health twin
to frequency: two tokens with equal counts can have wildly different
dispersion.

Exactness: each term is |f_i * N - n_i * F| / (F * N), so DP's
numerator is an exact INTEGER sum; parts where the token is absent
contribute n_i * F, folded in closed form as (N - sum_present n_i) * F
— no dense token x part grid, only observed (token, part) rows. The
single double division happens once per token, quantized by callers.
DP_norm divides by (1 - min_i n_i/N) = (N - min_n)/N, again integers.

Spark shape: one (token, part) count shuffle, one token-keyed
aggregate; part sizes are an m-row broadcast (m = #parts, a small
constant). Tokens below ``min_freq`` are pruned after their total is
known (one filter on the token aggregate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def token_dispersion(
    tokens: DataFrame,
    part_col: str = "part",
    token_col: str = "token",
    min_freq: int = 1,
) -> DataFrame:
    """(token, f_total, numer, dp, dp_norm) from a (part, token) frame
    with multiplicity. numer = the exact integer 2*F*N*DP."""
    if min_freq < 1:
        raise ValueError("min_freq must be >= 1")
    t = tokens.select(F.col(part_col).alias("part"), F.col(token_col).alias("token"))
    sizes = t.groupBy("part").agg(F.count(F.lit(1)).alias("n"))
    totals = sizes.agg(F.sum("n").alias("big_n"), F.min("n").alias("min_n"))
    f = t.groupBy("token", "part").agg(F.count(F.lit(1)).alias("fi"))
    ftot = (
        f.groupBy("token")
        .agg(F.sum("fi").alias("f_total"))
        .where(F.col("f_total") >= min_freq)
    )
    per_part = (
        f.join(ftot, "token")
        .join(F.broadcast(sizes), "part")
        .join(F.broadcast(totals))
        .groupBy("token", "f_total", "big_n", "min_n")
        .agg(
            F.sum(
                F.abs(F.col("fi") * F.col("big_n") - F.col("n") * F.col("f_total"))
            ).alias("present"),
            F.sum("n").alias("n_present"),
        )
    )
    numer = F.col("present") + (F.col("big_n") - F.col("n_present")) * F.col("f_total")
    return per_part.select(
        "token",
        "f_total",
        numer.alias("numer"),
        (
            numer
            / (F.lit(2.0) * F.col("f_total") * F.col("big_n"))
        ).alias("dp"),
        # single-part corpora: DP = 0 and the normalizer vanishes; 0.0
        F.when(F.col("big_n") == F.col("min_n"), F.lit(0.0))
        .otherwise(
            numer
            / (
                F.lit(2.0)
                * F.col("f_total")
                * (F.col("big_n") - F.col("min_n"))
            )
        )
        .alias("dp_norm"),
    )
