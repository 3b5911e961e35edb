"""Population Stability Index (PSI) — the standard "did this slice
drift from the reference distribution?" audit, applied per corpus
source: each source's document-length distribution is compared against
the whole-corpus distribution. PSI ~ 0 means the dump looks like the
corpus; PSI > 0.25 is the classic "significant shift" flag (a crawl
dump full of stubs or megapages shows up immediately).

    PSI(p || q) = sum over buckets i of (p_i - q_i) * ln(p_i / q_i)

Buckets are FIXED log2 length buckets — bitlen(value + 1) computed as
binary-string length (integer-exact, engine-agnostic, no quantile pass
needed). Zero counts are Laplace-smoothed: p_i = (c_i + 1/2) /
(n + B/2) with B = number of corpus-observed buckets, so empty buckets
contribute a finite, deterministic penalty; only integer counts enter
the smoothing, so both engines feed libm identical rationals.

Scale shape: one (group, bucket) map-side-combined histogram + a
corpus histogram, the (groups x B) grid from a broadcast of the tiny
bucket list, one group aggregate. No windows, no quantiles, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bitlen(col):
    return F.length(F.conv(col.cast("string"), 10, 2)).cast("long")


def psi_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """(grp, n, psi) — PSI of each group's bucketed ``value_col``
    distribution against the all-rows distribution. ``value_col`` must
    be a non-negative integer column (bucket = bitlen(value + 1))."""
    b = df.select(
        F.col(group_col).alias("grp"),
        _bitlen(F.col(value_col) + 1).alias("bucket"),
    )
    ghist = b.groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("c"))
    chist = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cc"))
    totals = b.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    nb = chist.agg(
        F.count(F.lit(1)).alias("nbuckets"), F.sum("cc").alias("ntot")
    )
    grid = totals.crossJoin(F.broadcast(chist)).join(
        ghist, ["grp", "bucket"], "left"
    )
    # Laplace smoothing with integer-exact rationals: (2c + 1) / (2n + B)
    p = (2 * F.coalesce(F.col("c"), F.lit(0)) + 1) / (
        2 * F.col("n") + F.col("nbuckets")
    )
    q = (2 * F.col("cc") + 1) / (2 * F.col("ntot") + F.col("nbuckets"))
    return (
        grid.join(F.broadcast(nb))
        .select("grp", "n", ((p - q) * F.log(p / q)).alias("term"))
        .groupBy("grp")
        .agg(F.min("n").alias("n"), F.sum("term").alias("psi"))
    )
