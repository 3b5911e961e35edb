"""Katz centrality — attenuated walk counting, x = Σ_k α^k (Aᵀ)^k · 1.

The third classic eigenvector-family ranker next to PageRank
(operators/pagerank.py) and HITS (operators/hits.py): instead of
normalizing out-weight (PageRank's random surfer), Katz counts ALL
incoming walks, damping length-k walks by α^k, so hubs pulling many long
chains score high even with huge out-degrees upstream. Converges for
α < 1/λ_max(A); callers pick a conservative α (the web-graph habit is
α ≤ 0.1 with unit weights).

Shape per iteration: ONE SpMV — ranks ⋈ edges on ``src``, sum-aggregate on
``dst`` — then x ← 1 + α·(Aᵀx), the same broadcast-or-shuffle join the
PageRank loop uses (vertex frame is V-row; at web scale the shuffle join
keyed by dst co-partitions with a dst-bucketed edge table). Fixed
``n_iter`` gives the truncated-walk semantics that is exactly
SQL-expressible for the cross-engine oracle; ``tolerance`` optionally
stops early on L1 convergence like the PageRank loop. Lineage truncated
per round with lazy localCheckpoint; no changing literals in the plan.

Reference parity note: the reference (didasy/tldr) ranks sentences only by
degree centrality and PageRank (tldr.go:403 area); Katz extends the same
§2.7 iteration skeleton with the walk-counting fixpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class KatzResult:
    scores: DataFrame  # (id: long, katz: double)
    iterations: int
    l1_delta: float


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    n_iter: int = 20,
    tolerance: float | None = None,
    weight_col: str | None = "weight",
) -> KatzResult:
    """x_{t+1}[v] = β + α · Σ_{u→v} w(u,v) · x_t[u], x_0 = β·1, run
    ``n_iter`` rounds (or until L1 change ≤ ``tolerance`` when given).
    Duplicate (src, dst) edge weights SUM, matching the PageRank prep
    contract. Returns scores for every vertex of the edge table."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col and weight_col in edges.columns
        else F.lit(1.0)
    )
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"), w.alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    e.count()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    x = verts.select("id", F.lit(float(beta)).alias("katz")).persist()
    x.count()
    it = 0
    delta = float("inf")
    while it < n_iter:
        it += 1
        contrib = (
            x.join(e, x["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("katz") * F.col("w")).alias("c"))
        )
        nx = (
            x.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(float(beta)) + F.lit(float(alpha)) * F.coalesce("c", F.lit(0.0))).alias(
                    "katz"
                ),
                F.col("katz").alias("katz_old"),
            )
            .localCheckpoint(eager=False)
            .persist()
        )
        if tolerance is not None:
            delta = float(
                nx.agg(F.sum(F.abs(F.col("katz") - F.col("katz_old")))).collect()[0][0]
            )
        else:
            # materialize each round so the lazy checkpoint actually cuts
            # lineage before the parent cache is dropped
            nx.count()
        x.unpersist()
        x = nx.drop("katz_old")
        if tolerance is not None and delta <= tolerance:
            break
    e.unpersist()
    return KatzResult(x, it, delta)
