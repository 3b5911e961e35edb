"""Collective Influence at radius 2 (Morone & Makse, Nature '15) — the
optimal-percolation influencer score:

    CI_2(v) = (deg(v) - 1) * sum over w at distance EXACTLY 2 of (deg(w) - 1)

over the undirected simple graph.  High-CI vertices are the ones whose
removal fragments the giant component fastest — a hub-detection signal
that beats raw degree because it looks past the immediate neighborhood
(a hub surrounded by leaves scores low).

Scale shape: symmetrize (one union + distinct), degrees (one groupBy),
the distance-2 frontier is ONE neighbor self-join keyed on the shared
middle vertex + one left_anti join removing distance-<=1 pairs + one
distinct — all plain shuffles on vertex ids, no iteration, no Python.
At web scale the self-join fan-out is sum(deg^2); hub rows dominate, so
AQE skew-split applies on the middle-vertex key — the same shape as the
triangle/wedge counters that already run at this tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def collective_influence(edges: DataFrame, top_k: int = 20) -> DataFrame:
    """(vertex, deg, ci) — top_k by CI_2 descending, ties vertex-ascending.
    Self-loops are dropped by the symmetrize; isolated vertices never
    appear (they have no edges).  deg-1 leaves score 0 * frontier = 0 but
    still appear if the frontier is nonempty — matching the published
    definition exactly."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # distance-exactly-2 pairs: neighbor-of-neighbor minus self minus direct
    nn = (
        und.select(F.col("u").alias("a"), F.col("v").alias("m"))
        .join(und.select(F.col("u").alias("m"), F.col("v").alias("w")), "m")
        .where(F.col("a") != F.col("w"))
        .select("a", "w")
        .distinct()
        .join(
            und.select(F.col("u").alias("a"), F.col("v").alias("w")),
            ["a", "w"],
            "left_anti",
        )
    )
    frontier = (
        nn.join(deg.select(F.col("u").alias("w"), F.col("deg").alias("wdeg")), "w")
        .groupBy("a")
        .agg(F.sum(F.col("wdeg") - 1).alias("fsum"))
    )
    return (
        deg.select(F.col("u").alias("vertex"), "deg")
        .join(frontier.select(F.col("a").alias("vertex"), "fsum"), "vertex")
        .select(
            "vertex",
            "deg",
            ((F.col("deg") - 1) * F.col("fsum")).cast("long").alias("ci"),
        )
        .orderBy(F.desc("ci"), F.asc("vertex"))
        .limit(top_k)
    )
