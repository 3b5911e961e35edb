"""Multi-source weighted shortest paths (non-negative weights) —
Bellmann-Ford-style synchronous relaxation over the edge DataFrame.

Per round one shuffle pair: frontier-join on ``src`` then min-aggregate on
``dst``; the distance table merges via a full-outer min. Converges in at
most (hop diameter) rounds — small on web graphs — detected by a zero
improvement count (an aggregate, O(1) driver data per round). Duplicate
(src, dst) edges collapse to their MINIMUM weight up front, so relaxation
never re-visits a dominated parallel edge. Lineage truncated per round.

BFS (operators/bfs.py) is the unweighted special case but uses a growing
visited set + anti-join instead, which is cheaper when all weights are
equal; this operator pays the re-relaxation cost to handle real weights.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class SsspResult:
    distances: DataFrame  # (id: long, dist: double) — reachable vertices only
    rounds: int
    converged: bool


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 100,
    weight_col: str = "weight",
) -> SsspResult:
    """(id, dist) = min total weight of any src→dst path from the seed set."""
    w = F.col(weight_col).cast("double") if weight_col in edges.columns else F.lit(1.0)
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"), w.alias("w"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    e.count()

    dist = (
        seeds.select(F.col("id").cast("long"))
        .distinct()
        .select("id", F.lit(0.0).alias("dist"))
        .persist()
    )
    rounds = 0
    converged = False
    while rounds < max_rounds:
        rounds += 1
        relaxed = (
            dist.join(e, dist["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("rdist"))
        )
        merged = (
            dist.join(relaxed, "id", "full_outer")
            .select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("rdist", F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("rdist").isNotNull()
                    & (F.col("dist").isNull() | (F.col("rdist") < F.col("dist")))
                ).alias("improved"),
            )
            .localCheckpoint(eager=False)
        )
        merged = merged.persist()
        n_improved = merged.filter("improved").count()
        dist.unpersist()
        dist = merged.drop("improved")
        if n_improved == 0:
            converged = True
            rounds -= 1
            break
    e.unpersist()
    return SsspResult(dist, rounds, converged)
