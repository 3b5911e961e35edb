"""Community validation & contraction over a vertex partition (labels from
label propagation, connected components, or any (id, label) frame):

  community_stats       per-community size / internal edges / cut edges /
                        volume / conductance — the standard quality check
                        before trusting communities downstream
  contract_communities  the Louvain phase-2 supergraph: one vertex per
                        community, weighted edges between communities —
                        composes labelprop → contract → pagerank for
                        multilevel analysis at a fraction of the scale

Modularity itself lives in operators/stats.py:partition_modularity.

Shape: the assignment table joins onto the edge list twice (broadcast-able
when communities fit in memory, shuffle-join otherwise) and everything else
is per-community aggregates — degree mass collapses community-side, so no
per-pair or all-pairs term exists and the dataflow survives web scale.
Generalizes the reference's single-machine ranking pipeline
(/root/reference/tldr.go) to partition-aware analytics it has no analog for.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


def _labeled_undirected(edges: DataFrame, assignments: DataFrame):
    """Distinct undirected simple edges (a<b) with both endpoint labels."""
    label_col = [c for c in assignments.columns if c != "id"][0]
    asg = assignments.select(F.col("id").cast("long"), F.col(label_col).alias("_c"))
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .join(asg.withColumnRenamed("id", "a").withColumnRenamed("_c", "ca"), "a")
        .join(asg.withColumnRenamed("id", "b").withColumnRenamed("_c", "cb"), "b")
    )
    return e, asg


def community_stats(edges: DataFrame, assignments: DataFrame) -> DataFrame:
    """(community, n_vertices, internal_edges, cut_edges, volume,
    conductance) per community, over the undirected simple graph.

    volume = sum of member degrees = 2*internal_edges + cut_edges;
    conductance = cut / min(volume, 2m - volume) — the probability a
    one-step walk from the community leaves it (Kannan-Vempala-Vetta);
    0.0 for communities with no cut (including whole-graph and
    edge-less ones, where the min is 0).
    """
    e, asg = _labeled_undirected(edges, assignments)
    e = e.persist()
    m = e.count()
    n_v = asg.groupBy(F.col("_c").alias("community")).agg(
        F.count(F.lit(1)).alias("n_vertices")
    )
    internal = (
        e.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    cut = (
        e.filter(F.col("ca") != F.col("cb"))
        .select(F.explode(F.array("ca", "cb")).alias("community"))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    out = (
        n_v.join(internal, "community", "left")
        .join(cut, "community", "left")
        .select(
            "community",
            "n_vertices",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
        )
        .withColumn(
            "volume", 2 * F.col("internal_edges") + F.col("cut_edges")
        )
        .withColumn(
            "conductance",
            F.when(F.col("cut_edges") == 0, F.lit(0.0)).otherwise(
                F.col("cut_edges")
                / F.least(F.col("volume"), F.lit(2 * m) - F.col("volume"))
            ),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    return out


@dataclass
class ContractResult:
    nodes: DataFrame  # (community, n_vertices)
    edges: DataFrame  # (src, dst, weight) — directed supergraph, self-loops = intra


def contract_communities(edges: DataFrame, assignments: DataFrame) -> ContractResult:
    """Louvain phase-2 contraction: map each vertex to its community and
    re-aggregate the DIRECTED simple edge list onto community ids.
    Supergraph edge weight = number of underlying simple directed edges
    between the two communities; intra-community mass is kept as weighted
    self-loops (required for modularity-preserving multilevel passes).
    """
    label_col = [c for c in assignments.columns if c != "id"][0]
    asg = assignments.select(F.col("id").cast("long"), F.col(label_col).alias("_c"))
    nodes = asg.groupBy(F.col("_c").alias("community")).agg(
        F.count(F.lit(1)).alias("n_vertices")
    )
    sedges = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .join(asg.withColumnRenamed("id", "src").withColumnRenamed("_c", "cs"), "src")
        .join(asg.withColumnRenamed("id", "dst").withColumnRenamed("_c", "cd"), "dst")
        .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return ContractResult(nodes=nodes, edges=sedges)
