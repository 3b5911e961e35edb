"""Exact graph diameter via iFUB (iterative Fringe Upper Bound —
Crescenzi, Grossi, Habib, Lanzi, Marino; TCS 2013): the trick that makes
EXACT diameter feasible on web-scale graphs, where all-pairs BFS (V
floods) is impossible but a handful of floods is cheap.

Undirected, on the LARGEST connected component (the deterministic
restriction that makes "the diameter" well-defined on a disconnected
crawl; ties on component size break by smallest component label).

Algorithm: root a BFS at a max-degree vertex r (hubs sit near the center,
so ecc(r) ≈ radius and the bound closes fast). Process BFS fringes
F(i) = {v : depth(v) = i} from the deepest level down; every vertex in a
fringe gets its TRUE eccentricity (one labeled-BFS flood per LEVEL — the
whole fringe floods together, not per-vertex), which only ever raises the
lower bound lb. Stop when lb ≥ 2(i−1): any vertex at depth < i has
eccentricity ≤ 2(i−1) by the triangle inequality through r, so no deeper
answer exists. On small-world graphs the loop terminates after a few
fringes (the paper's empirical result; worst case degenerates to all-V
floods on a path — not a web graph shape).

Scale shape: each step is one multi-probe labeled-BFS flood
(operators/bfs.py — one shuffle pair per level, state |fringe| × reach)
plus O(1) aggregates. No V² anything.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class DiameterResult:
    component: int  # label (= min vertex id) of the largest component
    n_vertices: int
    diameter: int
    floods: int  # BFS floods spent (1 root + 1 per processed fringe level)


def exact_diameter(edges: DataFrame, max_levels: int = 100_000) -> DiameterResult:
    """Exact diameter of the largest undirected component of the edge
    table. Raises on an empty edge set."""
    from tldr_spark.operators.bfs import bfs_distances, labeled_bfs
    from tldr_spark.operators.components import connected_components

    spark = edges.sparkSession
    cc = connected_components(edges).assignments  # (id, component=min id)
    top = (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .collect()
    )
    if not top:
        raise ValueError("empty edge set: diameter undefined")
    comp_label, n_vertices = int(top[0]["component"]), int(top[0]["n"])
    members = cc.filter(F.col("component") == comp_label).select("id").persist()
    members.count()
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .join(members.withColumnRenamed("id", "src"), "src", "left_semi")
        .persist()
    )
    e.count()

    deg = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    root = deg.orderBy(F.desc("deg"), F.asc("id")).limit(1).collect()[0]["id"]

    depths = bfs_distances(
        e, spark.createDataFrame([(int(root),)], "id long"), max_levels, directed=False
    ).distances.persist()
    ecc_root = int(depths.agg(F.max("dist")).collect()[0][0])
    floods = 1

    lb = ecc_root
    i = ecc_root
    # ecc(r) is the depth of the deepest fringe; F(ecc_root) eccs can only
    # confirm/raise lb, so start there and walk down
    while i > 0 and lb < 2 * i:
        fringe = depths.filter(F.col("dist") == i).select("id")
        eccs = (
            labeled_bfs(e, fringe, max_levels, directed=False)
            .groupBy("probe")
            .agg(F.max("dist").alias("ecc"))
        )
        mx = eccs.agg(F.coalesce(F.max("ecc"), F.lit(0))).collect()[0][0]
        floods += 1
        lb = max(lb, int(mx))
        i -= 1
    depths.unpersist()
    members.unpersist()
    e.unpersist()
    return DiameterResult(comp_label, n_vertices, lb, floods)
