"""k-clique percolation communities for k=3 (CPM, Palla, Derenyi,
Farkas & Vicsek, Nature'05): two triangles are adjacent when they
share an edge; communities are the connected clusters of triangles,
and a vertex belongs to every community whose triangles contain it —
the classic OVERLAPPING community model (a vertex bridging two dense
regions appears in both, which disjoint-partition methods like
Louvain/LPA cannot express).

Spark shape: triangles come from the same degree-ordered wedge join as
triangles.py (out-degree O(sqrt E), hub-skew safe). Triangle adjacency
is NEVER materialized pairwise per shared edge (a hot edge in t
triangles would fan out t^2 pairs); instead each triangle links its
three edge-nodes pairwise — exactly 3 rows per triangle — and
communities are the connected components of that EDGE graph (two
triangles sharing edge e both link to e's node, so they land in one
component; transitively identical to triangle adjacency). Components
reuse operators/components.py (small-star/large-star). Edge-node ids
pack the canonically sorted endpoints as lo * 2^32 + hi — collision-
free for vertex ids < 2^32 (the repo's id space) and kept exact in
int64 — and the community label is the component's minimum edge id,
deterministic across engines.

Output is the overlapping membership relation (community, vertex): a
vertex in two percolation clusters yields two rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tldr_spark.operators.components import connected_components
from tldr_spark.operators.triangles import _oriented

_M = 1 << 32


def clique_percolation3(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """(community, vertex): overlapping k=3 clique-percolation
    memberships. Vertices in no triangle are in no community."""
    o = _oriented(edges, by_degree)
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    closer = o.select(F.col("a").alias("y"), F.col("b").alias("z")).union(
        o.select(F.col("b").alias("y"), F.col("a").alias("z"))
    )
    tris = wedges.join(closer, ["y", "z"])
    # canonical sorted triple (a < b < c); b recovered arithmetically
    srt = tris.select(
        F.least("x", "y", "z").alias("a"),
        (F.col("x") + F.col("y") + F.col("z")
         - F.least("x", "y", "z")
         - F.greatest("x", "y", "z")).alias("b"),
        F.greatest("x", "y", "z").alias("c"),
    )
    te = srt.select(
        (F.col("a") * _M + F.col("b")).alias("eab"),
        (F.col("a") * _M + F.col("c")).alias("eac"),
        (F.col("b") * _M + F.col("c")).alias("ebc"),
    )
    pairs = (
        te.select(F.col("eab").alias("src"), F.col("eac").alias("dst"))
        .union(te.select("eab", "ebc"))
        .union(te.select("eac", "ebc"))
    )
    assign = connected_components(pairs).assignments
    return (
        assign.select(
            F.col("component").alias("community"),
            # integer div, NOT a double division: eid can exceed 2^53
            F.expr(f"id div {_M}").alias("vertex"),
        )
        .union(
            assign.select(
                F.col("component").alias("community"),
                (F.col("id") % _M).alias("vertex"),
            )
        )
        .distinct()
    )
