"""HITS (Kleinberg 1999): hub/authority scores — the second classic
eigenvector pair of link analysis, same iterative-SpMV skeleton as PageRank.

    auth(v) ∝ Σ_{u→v} hub(u)        (one groupBy(dst) shuffle)
    hub(u)  ∝ Σ_{u→v} auth(v)       (one groupBy(src) shuffle)

L1 normalization each half-step (scores sum to 1) instead of Kleinberg's L2
— same fixpoint direction, but the normalizer is a plain SUM, which keeps
the SQL oracle free of sqrt() and its cross-engine last-ulp noise. The
normalizer rides in the dataflow as a broadcast 1-row aggregate (no changing
literal in the plan — same codegen-cache discipline as the PageRank loop).
Fixed iteration count (the driver-contract oracle mirrors it exactly);
lineage truncated per iteration via lazy localCheckpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class HitsResult:
    scores: DataFrame  # (id: long, hub: double, auth: double)
    iterations: int


def hits(edges: DataFrame, iterations: int = 10, broadcast_scores: bool = True) -> HitsResult:
    """(id, hub, auth) after ``iterations`` rounds on the DISTINCT directed
    edge set (HITS is unweighted)."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).distinct().persist()
    e.count()

    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        spark = edges.sparkSession
        e.unpersist()
        verts.unpersist()
        return HitsResult(spark.createDataFrame([], "id long, hub double, auth double"), 0)

    scores = verts.select("id", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")).persist()

    for _ in range(iterations):
        s = F.broadcast(scores) if broadcast_scores else scores
        raw_auth = (
            s.join(e, s["id"] == e["src"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("ra"))
        )
        auth_n = (
            scores.join(raw_auth, scores["id"] == raw_auth["dst"], "left")
            .select(scores["id"], F.coalesce(F.col("ra"), F.lit(0.0)).alias("ra"), "hub")
        )
        tot_a = auth_n.agg(F.sum("ra").alias("t"))
        auth_n = (
            auth_n.crossJoin(F.broadcast(tot_a))
            .select("id", "hub", (F.col("ra") / F.col("t")).alias("auth"))
        )
        a = F.broadcast(auth_n) if broadcast_scores else auth_n
        raw_hub = (
            a.join(e, a["id"] == e["dst"])
            .groupBy("src")
            .agg(F.sum("auth").alias("rh"))
        )
        hub_n = (
            auth_n.join(raw_hub, auth_n["id"] == raw_hub["src"], "left")
            .select(auth_n["id"], F.coalesce(F.col("rh"), F.lit(0.0)).alias("rh"), "auth")
        )
        tot_h = hub_n.agg(F.sum("rh").alias("t"))
        new_scores = (
            hub_n.crossJoin(F.broadcast(tot_h))
            .select("id", (F.col("rh") / F.col("t")).alias("hub"), "auth")
        )
        new_scores = new_scores.localCheckpoint(eager=False).persist()
        new_scores.count()
        scores.unpersist()
        scores = new_scores

    e.unpersist()
    verts.unpersist()
    return HitsResult(scores, iterations)
