"""Bridges (cut edges) and 2-edge-connected components.

Completes the connectivity family (components.py CC, scc.py SCC,
bowtie.py census) with the edge-cut layer: a BRIDGE is an edge whose
removal disconnects its endpoints — on a link graph these are the
single points of failure between crawl territories, and the
2-edge-connected components (2ECC) are the redundantly-linked cores
left when bridges are cut.

Algorithm (Spark-shaped, O(diameter) rounds end to end):

1. One labeled-BFS flood from every component's canonical root builds a
   BFS spanning forest: parent(v) = the MINIMUM neighbor one level
   closer to the root (deterministic on any partitioning). Depth of the
   forest ≤ graph diameter — small on web graphs, so every loop below
   is diameter-bounded.
2. Non-tree edges get two independent Lehmer-hash channel values; each
   value is XOR-tagged onto BOTH endpoints. By the standard cancellation
   argument, the XOR of tags over subtree(v) equals the XOR of channel
   values of exactly the non-tree edges with ONE endpoint inside
   subtree(v) (both-inside edges cancel, both-outside never appear) —
   i.e. the non-tree edges covering the tree edge (v, parent(v)).
3. Subtree XOR folds level-by-level from the deepest BFS layer upward
   (one join + one map-side bit_xor aggregate per level; levels ≤
   diameter). A tree edge is a bridge iff its subtree XOR is zero in
   BOTH channels: zero cover ⇒ exactly the cycle-free (cut) edges.
   Non-tree edges always sit on a cycle and are never bridges.
4. 2ECC labels = connected components after deleting the bridges.

Exactness: a bridge's covering set is empty, so true bridges ALWAYS
report zero. A non-bridge is misreported only if a non-empty covering
set XORs to zero in both 31-bit channels simultaneously (~2^-62 per
tree edge) — the standard whp guarantee of XOR connectivity sketches
(Ahn-Guha-McGregor style); the DuckDB oracle is EXACT (per-edge
removal closure), so any collision at test scale would fail the driver
gate loudly. Determinism: hashes, parents, and fold order are all
data-defined, so the output is stable across partitionings and reruns.

Reference parity note: the reference (didasy/tldr) has no cut-edge
operator; this extends the §2.7 iteration skeleton along the
connectivity axis.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from tldr_spark.operators.matching import edge_priority

_C2 = 1_000_003  # channel-2 offset: an independent Lehmer mix


@dataclass
class BridgeResult:
    bridges: DataFrame  # (a: long, b: long), a < b — the cut edges
    levels: int         # BFS-forest depth = fold rounds executed


def _canonical(edges: DataFrame) -> DataFrame:
    s, d = F.col("src").cast("long"), F.col("dst").cast("long")
    return (
        edges.select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def bridges(edges: DataFrame, max_levels: int = 100_000) -> BridgeResult:
    """All bridges of the undirected simple graph of ``edges``
    (direction/multiplicity ignored, self-loops dropped)."""
    from tldr_spark.operators.bfs import labeled_bfs
    from tldr_spark.operators.components import connected_components

    spark = edges.sparkSession
    ce = _canonical(edges).persist()
    empty = spark.createDataFrame([], "a long, b long")
    if ce.isEmpty():
        ce.unpersist()
        return BridgeResult(empty, 0)

    cc = connected_components(edges).assignments  # (id, component=min vertex)
    roots = cc.select(F.col("component").alias("id")).distinct()
    # components partition V ⇒ flood state is V rows total
    dist = (
        labeled_bfs(edges, roots, max_levels=max_levels, directed=False)
        .select("id", "dist")
        .persist()
    )

    und = ce.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        ce.select(F.col("b"), F.col("a"))
    )
    du = dist.select(F.col("id").alias("u"), F.col("dist").alias("du"))
    dv = dist.select(F.col("id").alias("v"), F.col("dist").alias("dv"))
    tree = (
        und.join(du, "u")
        .join(dv, "v")
        .filter(F.col("du") == F.col("dv") - 1)
        .groupBy("v")
        .agg(F.min("u").alias("parent"), F.first("dv").alias("depth"))
        .persist()
    )  # (v, parent, depth) — every non-root vertex, depth ≥ 1
    tree_c = tree.select(
        F.least("v", "parent").alias("a"), F.greatest("v", "parent").alias("b")
    )
    nontree = ce.join(tree_c, ["a", "b"], "left_anti")
    tagged = nontree.select(
        "a",
        "b",
        edge_priority(F.col("a"), F.col("b")).alias("h1"),
        edge_priority(F.col("a") + F.lit(_C2), F.col("b") + F.lit(_C2)).alias("h2"),
    )
    tags = (
        tagged.select(F.col("a").alias("v"), "h1", "h2")
        .union(tagged.select(F.col("b"), "h1", "h2"))
        .groupBy("v")
        .agg(F.expr("bit_xor(h1)").alias("x1"), F.expr("bit_xor(h2)").alias("x2"))
    )
    # acc(v) starts as v's own tag; deeper levels fold their subtree XOR in
    acc = (
        tree.select("v", "parent", "depth")
        .join(tags, "v", "left")
        .select(
            "v",
            "parent",
            "depth",
            F.coalesce("x1", F.lit(0)).alias("x1"),
            F.coalesce("x2", F.lit(0)).alias("x2"),
        )
        .persist()
    )
    # roots also absorb pushes but never emit a tree edge — they need no row
    levels = acc.agg(F.max("depth")).first()[0] or 0
    found = empty
    for d in range(levels, 0, -1):
        lvl = acc.filter(F.col("depth") == d)  # acc here is FINAL subtree XOR
        found = found.union(
            lvl.filter((F.col("x1") == 0) & (F.col("x2") == 0)).select(
                F.least("v", "parent").alias("a"),
                F.greatest("v", "parent").alias("b"),
            )
        ).localCheckpoint(eager=True)
        push = lvl.groupBy(F.col("parent").alias("v")).agg(
            F.expr("bit_xor(x1)").alias("p1"), F.expr("bit_xor(x2)").alias("p2")
        )
        rest = acc.filter(F.col("depth") < d)
        nxt = (
            rest.join(push, "v", "left")
            .select(
                "v",
                "parent",
                "depth",
                (F.col("x1").bitwiseXOR(F.coalesce("p1", F.lit(0)))).alias("x1"),
                (F.col("x2").bitwiseXOR(F.coalesce("p2", F.lit(0)))).alias("x2"),
            )
            .localCheckpoint(eager=True)
        )
        acc.unpersist()
        acc = nxt.persist()
    acc.unpersist()
    tree.unpersist()
    dist.unpersist()
    ce.unpersist()
    return BridgeResult(found, levels)


def two_edge_components(edges: DataFrame, max_levels: int = 100_000) -> DataFrame:
    """(id, label) — 2-edge-connected component labels (label = minimum
    member vertex): connected components of the simple graph with its
    bridges deleted. Vertices whose every incident edge is a bridge
    become singletons labeled by themselves."""
    from tldr_spark.operators.components import connected_components

    ce = _canonical(edges).persist()
    br = bridges(edges, max_levels=max_levels).bridges
    keep = ce.join(br, ["a", "b"], "left_anti")
    verts = ce.select(F.col("a").alias("id")).union(ce.select("b")).distinct()
    asg = connected_components(
        keep.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).assignments  # (id, component=min member)
    out = verts.join(asg, "id", "left").select(
        "id", F.coalesce("component", "id").alias("label")
    )
    ce.unpersist()
    return out


def articulation_probes(edges: DataFrame, n_hubs: int = 3) -> DataFrame:
    """(hub, deg, n_comp_base, n_comp_removed, is_articulation) for the
    top ``n_hubs`` vertices by (undirected degree DESC, id ASC): is the
    hub a CUT VERTEX — does deleting it split its component?

    The vertex-cut complement of :func:`bridges`: exact global
    articulation detection needs a DFS tree (Tarjan-Vishkin), which is
    hostile to bounded-round dataflow, but the question that matters on
    a web graph — "is this HUB a single point of failure?" — only needs
    the top-degree probes, each answered by one CC run over the graph
    minus the hub (vertices that lose their last edge stay, as
    singleton components, so the count compares like for like).

    Cost per probe: one broadcast anti-join of a 1-row hub against the
    canonical edge set + one CC pass (star-contraction + bounded
    finisher — the same machinery as attack_tolerance, which removes
    budgeted hub SETS where this reports per-hub cut status).
    """
    from tldr_spark.operators.components import connected_components

    ce = _canonical(edges).persist()
    deg = (
        ce.select(F.col("a").alias("id"))
        .union(ce.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    base = int(
        connected_components(
            ce.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        .assignments.select("component")
        .distinct()
        .count()
    )
    spark = edges.sparkSession
    hubs = deg.orderBy(F.desc("deg"), F.asc("id")).limit(int(n_hubs)).collect()
    rows = []
    for r in hubs:
        h = int(r["id"])
        surv = ce.filter((F.col("a") != h) & (F.col("b") != h))
        verts = deg.select("id").filter(F.col("id") != h)
        n_removed = int(
            connected_components(
                surv.select(F.col("a").alias("src"), F.col("b").alias("dst")),
                vertices=verts,
            )
            .assignments.select("component")
            .distinct()
            .count()
        )
        rows.append((h, int(r["deg"]), base, n_removed, n_removed > base))
    ce.unpersist()
    deg.unpersist()
    return spark.createDataFrame(
        rows,
        "hub long, deg long, n_comp_base long, n_comp_removed long,"
        " is_articulation boolean",
    )
