"""Rich-club coefficient — do high-degree hubs preferentially link to each
other? φ(k) = 2·E_k / (n_k·(n_k−1)) over the undirected simple graph,
where n_k counts vertices of degree > k and E_k the edges among them
(Colizza et al., Nature Physics 2006). On web graphs a rising φ(k) is the
hub-interconnection signature that motivates hub-salting in the first
place.

Shape: one degree aggregate, then ONE pass over the (a<b) pair table
joined to the V-row degree frame on both endpoints, cross-joined with the
tiny broadcast threshold list and counted per k — edges are touched once
regardless of how many thresholds are requested. No per-k scans, no
driver loop over the edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rich_club(edges: DataFrame, ks: list[int]) -> DataFrame:
    """(k, n_rich, e_rich, phi) for each degree threshold in ``ks`` —
    undirected simple graph (direction and multiplicity collapsed,
    self-loops dropped). Thresholds where n_rich < 2 are omitted (φ is
    undefined there)."""
    spark = edges.sparkSession
    und = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    kdf = F.broadcast(
        spark.createDataFrame([(int(k),) for k in sorted(set(ks))], "k int")
    )
    n_rich = (
        deg.crossJoin(kdf)
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rich"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    e_rich = (
        und.join(da, "a")
        .join(db, "b")
        .crossJoin(kdf)
        .filter((F.col("deg_a") > F.col("k")) & (F.col("deg_b") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_rich"))
    )
    out = (
        n_rich.join(e_rich, "k", "left")
        .filter(F.col("n_rich") >= 2)
        .select(
            "k",
            F.col("n_rich").cast("long").alias("n_rich"),
            F.coalesce("e_rich", F.lit(0)).cast("long").alias("e_rich"),
            (
                2.0
                * F.coalesce("e_rich", F.lit(0))
                / (F.col("n_rich").cast("double") * (F.col("n_rich") - 1))
            ).alias("phi"),
        )
    )
    und.unpersist()
    deg.unpersist()
    return out
