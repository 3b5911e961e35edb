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

    if iterations < 1:
        scores = verts.select(
            "id", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
        ).localCheckpoint(eager=True)
        e.unpersist()
        verts.unpersist()
        return HitsResult(scores, 0)

    # SPARSE state between half-steps: a vertex with no out-edges contributes
    # nothing to the next auth aggregate (its hub enters no join row) and a
    # vertex with no in-edges likewise for hub — so only vertices that appear
    # on the contributing side are carried, and the zero-score rows are
    # materialized ONCE at the end. This removes the two per-round
    # zero-filling merge joins of the naive formulation (measured ~1.5x at
    # sf0.1) and shrinks both per-round shuffles to the active vertex sets.
    hub = verts.join(e.select(F.col("src").alias("id")).distinct(), "id", "left_semi").select(
        "id", F.lit(1.0 / n).alias("hub")
    ).persist()

    auth = None
    old_auth = None
    for _ in range(iterations):
        h = F.broadcast(hub) if broadcast_scores else hub
        ra = (
            h.join(e, h["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("ra"))
        )
        ta = ra.agg(F.sum("ra").alias("t"))
        auth = (
            ra.crossJoin(F.broadcast(ta))
            .select("id", (F.col("ra") / F.col("t")).alias("auth"))
            .localCheckpoint(eager=False)
            .persist()
        )
        a = F.broadcast(auth) if broadcast_scores else auth
        rh = (
            a.join(e, a["id"] == e["dst"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("rh"))
        )
        th = rh.agg(F.sum("rh").alias("t"))
        new_hub = (
            rh.crossJoin(F.broadcast(th))
            .select("id", (F.col("rh") / F.col("t")).alias("hub"))
            .localCheckpoint(eager=False)
            .persist()
        )
        new_hub.count()  # materializes this round's auth checkpoint too
        hub.unpersist()
        hub = new_hub
        # the previous round's auth was consumed by this round's hub step;
        # only the FINAL auth is read again (in the output join)
        if old_auth is not None:
            old_auth.unpersist()
        old_auth = auth

    # checkpoint the result, then release every intermediate (verts, the
    # final hub/auth round frames, the edge set) — a long-lived session
    # calling operators repeatedly must not accumulate cached blocks
    scores = (
        verts.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    verts.unpersist()
    hub.unpersist()
    auth.unpersist()  # old_auth is this same frame after the final round
    return HitsResult(scores, iterations)
