"""Betweenness centrality (Brandes 2001), probe-sampled — the standard
"who brokers the traffic" centrality for web/link graphs.

Exact betweenness needs all-sources shortest paths; at web scale the
standard estimator samples a probe set (Brandes & Pich 2007) and sums each
probe's dependency contributions. For every probe s and vertex v:

    δ_s(v) = Σ_{w : (v,w) on the SP-DAG}  σ_s(v)/σ_s(w) · (1 + δ_s(w))

    bc(v)  = Σ_{s in probes, v ≠ s} δ_s(v)

Distributed shape (all probes flooded simultaneously, keyed (probe, id) —
the same composite-frontier trick as bfs.labeled_bfs):

  forward:  level-synchronous BFS carrying σ (number of shortest paths);
            expanding a level SUMS σ over in-frontier predecessors — one
            join + one aggregate per level, per-level frames retained
  backward: dependency accumulation from the deepest level up the
            shortest-path DAG (edges u→v with dist(v) = dist(u)+1): one
            join + one aggregate per level

Wall-clock is O(diameter) rounds each way; per-level frames are
localCheckpoint'ed (lineage truncation) and unpersisted as soon as the
backward pass moves past them. State is |probes| × reach — a bounded probe
sample, not all-pairs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class BetweennessResult:
    scores: DataFrame  # (id: long, betweenness: double) — probe-sampled sum
    levels: int
    edge_scores: DataFrame | None = None  # (src, dst, betweenness) when requested


def betweenness_centrality(
    edges: DataFrame,
    probes: DataFrame,
    max_levels: int = 40,
    directed: bool = True,
    collect_edge_scores: bool = False,
) -> BetweennessResult:
    """(id, betweenness): δ-accumulated over the probe sample. Vertices
    never on any probe's shortest path (and never reached) score 0 and are
    absent from the result. With probes = all vertices this IS exact
    Brandes betweenness (directed; for the undirected convention halve the
    scores)."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()
    e.count()

    # ---- forward: per-level (probe, id, sigma) --------------------------
    lvl0 = (
        probes.select(F.col("id").cast("long").alias("probe"))
        .distinct()
        .select("probe", F.col("probe").alias("id"), F.lit(1.0).alias("sigma"))
        .localCheckpoint(eager=True)
    )
    levels: list[DataFrame] = [lvl0]
    visited = lvl0.select("probe", "id").persist()
    cur = lvl0
    d = 0
    while d < max_levels:
        nxt = (
            cur.join(e, cur["id"] == e["src"])
            .select("probe", F.col("dst").alias("id"), "sigma")
            .join(visited, ["probe", "id"], "left_anti")
            .groupBy("probe", "id")
            .agg(F.sum("sigma").alias("sigma"))  # σ sums over predecessors
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        d += 1
        levels.append(nxt)
        nv = visited.union(nxt.select("probe", "id")).localCheckpoint(eager=False).persist()
        nv.count()
        visited.unpersist()
        visited = nv
        cur = nxt

    # ---- backward: δ accumulation down the SP-DAG ----------------------
    # deepest level has δ = 0; walk upward. SP-DAG edges u→v connect
    # consecutive levels of the SAME probe (dist(v) = dist(u)+1 holds by
    # construction: u in level l, v in level l+1, (u,v) ∈ E).
    spark = edges.sparkSession
    acc = None  # (id, betweenness) partial sums over finished levels
    eacc = None  # (src, dst, b) per-SP-DAG-edge partial sums (opt-in)
    delta_next = None  # (probe, id, delta) of level l+1
    for lvl in range(len(levels) - 1, 0, -1):
        w = levels[lvl]  # (probe, id, sigma) at depth lvl
        if delta_next is None:
            wd = w.select("probe", "id", "sigma", F.lit(0.0).alias("delta"))
        else:
            wd = w.join(delta_next, ["probe", "id"], "left").select(
                "probe", "id", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta")
            )
        v = levels[lvl - 1]
        terms = (
            v.join(e, v["id"] == e["src"])
            .select("probe", v["id"].alias("vid"), F.col("sigma").alias("sigma_v"), F.col("dst"))
            .join(
                wd.select("probe", F.col("id").alias("dst"), F.col("sigma").alias("sigma_w"), "delta"),
                ["probe", "dst"],
            )
        )
        if collect_edge_scores:
            # Girvan-Newman edge betweenness: the same delta term, kept per
            # SP-DAG edge BEFORE the vertex aggregate (probe rows included:
            # paths out of the source traverse its edges)
            epart = (
                terms.groupBy(F.col("vid").alias("src"), "dst")
                .agg(
                    F.sum(
                        F.col("sigma_v") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta"))
                    ).alias("b")
                )
                .localCheckpoint(eager=True)
            )
            eacc = epart if eacc is None else eacc.union(epart)
        contrib = (
            terms.groupBy("probe", F.col("vid").alias("id"))
            .agg(
                F.sum(
                    F.col("sigma_v") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta"))
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )
        # δ of non-probe vertices at this level contributes to bc
        part = (
            contrib.filter(F.col("id") != F.col("probe"))
            .groupBy("id")
            .agg(F.sum("delta").alias("b"))
        )
        acc = part if acc is None else acc.union(part)
        if delta_next is not None and lvl + 1 < len(levels):
            pass  # per-level frames are localCheckpoints; GC reclaims them
        delta_next = contrib

    visited.unpersist()
    e.unpersist()
    edge_scores = None
    if collect_edge_scores:
        edge_scores = (
            (
                eacc.groupBy("src", "dst").agg(F.sum("b").alias("betweenness"))
                if eacc is not None
                else spark.createDataFrame([], "src long, dst long, betweenness double")
            )
            .localCheckpoint(eager=True)
        )
    if acc is None:
        return BetweennessResult(
            spark.createDataFrame([], "id long, betweenness double"), 0, edge_scores
        )
    scores = (
        acc.groupBy("id").agg(F.sum("b").alias("betweenness")).localCheckpoint(eager=True)
    )
    return BetweennessResult(scores, len(levels) - 1, edge_scores)
