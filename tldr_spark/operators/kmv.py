"""KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al.,
RANDOM'02: hash every key, keep the k smallest distinct hash values; the
kth smallest, normalized, estimates cardinality as (k-1)/u_(k).

Why this next to the HyperLogLog-based hyper_anf: HLL register state is
implementation-defined (hyper_anf is a rows-only driver query for exactly
that reason), while a KMV sketch is a pure SET — the k smallest values of
a deterministic hash — so the whole sketch AND the estimate are
bit-reproducible in any engine, giving the approximate-distinct path a
real cross-engine oracle. KMV is also trivially mergeable (union the
sketches, keep the k smallest — proven by the pytest merge law), which is
what makes it a sketch and not just a sample: per-partition sketches
combine without rescanning.

Hash: the repo's MINSTD stream at full width, h = ((key + salt) mod M) *
48271 mod M with M = 2^31-1, so u = h/M is uniform on ~[0,1) and every
engine computes the identical integer. Scale shape: one map-side hash +
DISTINCT (the only shuffle) + TakeOrdered(k) — the sketch of a 10^12-row
table is k longs on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M = 2_147_483_647
_A = 48271


def _h(key, salt: int):
    return F.pmod(F.pmod(key.cast("long") + F.lit(int(salt)), F.lit(_M)) * _A, F.lit(_M))


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256, salt: int = 0) -> DataFrame:
    """The sketch itself: up to k rows of the smallest distinct hash
    values (column ``h``). Merge two sketches with
    ``a.union(b).distinct().orderBy("h").limit(k)`` — identical to
    sketching the concatenated input (the KMV merge law)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.select(_h(F.col(key_col), salt).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """1-row (k_used, kth_h, distinct_est): (k-1)/u_(k) when the sketch is
    full, else the exact count (a sketch with fewer than k values has SEEN
    every distinct hash). ``distinct_est`` is rounded to a long."""
    return sketch.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").cast("long").alias("kth_h"),
    ).select(
        "k_used",
        "kth_h",
        F.when(F.col("k_used") < k, F.col("k_used").cast("double"))
        .otherwise(F.lit(float(k - 1)) * _M / F.col("kth_h"))
        .cast("double")
        .alias("_e"),
    ).select(
        "k_used", "kth_h", F.round("_e").cast("long").alias("distinct_est")
    )


def kmv_distinct(df: DataFrame, key_col: str, k: int = 256, salt: int = 0) -> DataFrame:
    """Sketch + estimate in one call."""
    return kmv_estimate(kmv_sketch(df, key_col, k, salt), k)
