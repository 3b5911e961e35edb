"""k-core: the maximal subgraph where every vertex has undirected degree
>= k — the standard graph-mining density filter (e.g. spam-farm and
community pre-filtering on web graphs).

Iterative peeling: drop vertices with degree < k, remove their incident
edges, recompute — to fixpoint (or a fixed round count, for the
driver-contract oracle which mirrors the rounds exactly). Each round is one
degree aggregate + two semi-joins on the shrinking edge set; the edge set
only ever shrinks, so wall-clock per round falls monotonically. Lineage
truncated per round via localCheckpoint, as in every other iterative
operator here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class KCoreResult:
    vertices: DataFrame  # (id: long, degree: long) — members of the k-core
    rounds: int


def k_core(edges: DataFrame, k: int, max_rounds: int = 1000) -> KCoreResult:
    """Vertices of the k-core of the undirected simple graph underlying
    (src, dst): self-loops dropped, parallel/reciprocal edges collapsed.
    ``max_rounds`` caps peeling (set it to the oracle's fixed round count
    for bit-exact cross-engine comparison; convergence is flagged by
    ``rounds < max_rounds``)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    und.count()

    rounds = 0
    prev_n = -1
    last_keep = None  # persisted frame of the n==0 early exit, if taken
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
    while rounds < max_rounds:
        keep = deg.filter(F.col("degree") >= k).persist()
        n = keep.count()
        if n == prev_n:
            keep.unpersist()
            break
        rounds += 1
        prev_n = n
        if n == 0:
            deg = keep
            last_keep = keep
            break
        ids = keep.select("id")
        new_und = (
            und.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
            .persist()
        )
        new_und.count()
        und.unpersist()
        und = new_und
        deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
        keep.unpersist()

    # checkpoint the (small) core before releasing the cached edge set —
    # no cached blocks outlive the call
    out = deg.filter(F.col("degree") >= k).localCheckpoint(eager=True)
    und.unpersist()
    if last_keep is not None:
        last_keep.unpersist()
    return KCoreResult(out, rounds)
