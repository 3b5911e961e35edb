"""Truncated hitting time to a target set — absorbing-walk value iteration.

h_K(v) = the expected number of steps a uniform out-neighbor random walk
starting at v takes before first reaching the target set T, truncated at
horizon K (the standard K-step value-iteration lower bound, monotone
nondecreasing in K and exact once K exceeds the longest needed horizon):

    h_0      ≡ 0
    h_{k+1}(v) = 0                         v ∈ T
               = 1 + mean_{v→u} h_k(u)     v has out-edges
               = 1 + h_k(v)                v dangling (walk is stuck)

Link-graph use: "expected click distance to a trusted seed page" — the
absorbing-walk dual of personalized PageRank (pagerank.py), and the
standard proximity feature for spam/quality propagation from a labeled
seed set.

Scale shape: identical to a PageRank iteration — ONE equi-join of the
V-row value frame against the edge table plus one partial-aggregated
groupBy(src) per step, K steps total, lineage truncated per step. The
target set rides as a V-row boolean column (joined once up front), never
a driver-side structure.

Reference parity note: the reference (didasy/tldr) has no absorbing-walk
operator; this extends the §2.7 power-iteration skeleton to the
absorbing boundary-condition family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hitting_time(
    edges: DataFrame, targets: DataFrame, iterations: int = 15
) -> DataFrame:
    """(id, hit) — K-truncated expected hitting time from every vertex of
    the simple digraph of ``edges`` (self-loops dropped, multi-edges
    collapsed) to the target set (``targets`` must have an ``id``
    column; targets outside the graph are ignored)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    sd = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    verts = (
        sd.select(F.col("src").alias("id"))
        .union(sd.select("dst"))
        .distinct()
        .join(
            targets.select(F.col("id").cast("long")).distinct().withColumn(
                "is_t", F.lit(True)
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("is_t", F.lit(False)).alias("is_t"))
        .persist()
    )
    h = verts.select("id", "is_t", F.lit(0.0).alias("h"))
    for _ in range(iterations):
        nb = (
            h.select(F.col("id").alias("dst"), "h")
            .join(sd, "dst")
            .groupBy("src")
            .agg((F.sum("h") / F.count(F.lit(1))).alias("m"))
            .withColumnRenamed("src", "id")
        )
        h = (
            h.join(nb, "id", "left")
            .select(
                "id",
                "is_t",
                F.when(F.col("is_t"), F.lit(0.0))
                .otherwise(F.lit(1.0) + F.coalesce("m", "h"))
                .alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    sd.unpersist()
    verts.unpersist()
    return h.select("id", F.col("h").alias("hit"))
