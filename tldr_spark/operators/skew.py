"""Explicit salted-key skew mitigation for hub vertices (north rule).

For ALGEBRAIC aggregates (sum/count/min/max) Spark's map-side partial
aggregation already acts as implicit salting — a hot key receives at most
one partial row per upstream partition — which is why the PageRank
`groupBy(dst)` needs no manual salt. Explicit salting earns its keep when:

  * the aggregate is NOT algebraic (collect_list, exact percentile) so no
    partial aggregation happens and a hub key's rows all land on one task;
  * a hot key's per-partition partials are still too many (10^5 upstream
    partitions on a 1000-executor cluster) and you want a tree reduce;
  * a JOIN (not an aggregate) is skewed and AQE's skew-split is off or
    can't help (e.g. a broadcast-ineligible dimension).

``salted_aggregate`` is the standard two-phase shape: only keys above a
degree threshold are salted (blanket salting doubles shuffle cost for the
long tail — the reason the 0.8 scaling target would otherwise be eaten).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """(key) rows whose frequency exceeds ``threshold`` — the salt set."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(key)
    )


def _row_salt(df: DataFrame, n_salts: int, salt_cols: list[str] | None) -> Column:
    """Deterministic salt in [0, n_salts): a hash of the row's CONTENT
    (all columns unless ``salt_cols`` restricts it), never ``F.rand`` —
    rand(seed) is only stable for a fixed partition layout, so a
    rand-derived salt makes results depend on how the input happened to be
    partitioned. A content hash is bit-reproducible across repartitionings
    and cluster sizes (checkpoint/resume safe). Fully duplicated rows share
    a salt; that residual imbalance is bounded by the duplication factor."""
    cols = salt_cols if salt_cols is not None else df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_exprs: Callable[[], list[Column]],
    merge_exprs: Callable[[], list[Column]],
    hot: DataFrame | None = None,
    hot_threshold: int = 100_000,
    n_salts: int = 32,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregate with per-key conditional salting.

    ``agg_exprs()`` builds the phase-1 aggregate columns (over (key, salt)),
    ``merge_exprs()`` the phase-2 re-aggregation (over key). Cold keys take
    salt=0 and pass through phase 2 as single rows, so the tail pays one
    extra (cheap) aggregation and no extra shuffle width. Salts are
    deterministic row-content hashes (see :func:`_row_salt`), so the output
    is bit-reproducible across input partitionings.

    Example — skew-safe sum:
        salted_aggregate(df, "dst",
            lambda: [F.sum("w").alias("s")],
            lambda: [F.sum("s").alias("s")])
    """
    if hot is None:
        hot = hot_keys(df, key, hot_threshold)
    hot_marked = hot.withColumn("_hot", F.lit(True))
    salt = _row_salt(df, n_salts, salt_cols)
    salted = (
        df.join(F.broadcast(hot_marked), key, "left")
        .withColumn("_salt", F.when(F.col("_hot").isNotNull(), salt).otherwise(F.lit(0)))
        .drop("_hot")
    )
    phase1 = salted.groupBy(key, "_salt").agg(*agg_exprs())
    return phase1.groupBy(key).agg(*merge_exprs())


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot: DataFrame,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: hot keys on the big side get a deterministic
    content-hash salt in [0, n_salts); the small side replicates hot rows
    across every salt. Cold keys join 1:1 on salt=0. Classic
    salt/replicate — use when AQE's skew-join split is unavailable or the
    skew is in a cached relation."""
    hot_marked = F.broadcast(hot.withColumn("_hot", F.lit(True)))
    salt = _row_salt(big, n_salts, salt_cols)
    big_s = (
        big.join(hot_marked, key, "left")
        .withColumn("_salt", F.when(F.col("_hot").isNotNull(), salt).otherwise(F.lit(0)))
        .drop("_hot")
    )
    small_s = (
        small.join(hot_marked, key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(), F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts", "_hot")
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
