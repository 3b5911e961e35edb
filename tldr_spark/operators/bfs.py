"""Multi-source BFS: minimum hop distance from a seed set over the directed
edge table — the reachability/radius primitive of the link-graph engine.

Shape per level (classic frontier iteration, cf. Pregel):

    frontier ⋈ edges → new ids → anti-join visited → next frontier

One shuffle per level (the join on src); the visited set grows monotonically
and stays partitioned by id. Lineage is truncated per level with
localCheckpoint, same discipline as the PageRank loop — without it the plan
doubles per level. Wall-clock is O(diameter) rounds; web graphs have small
diameter, so the driver loop is short even at 10^12 edges.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class BfsResult:
    distances: DataFrame  # (id: long, dist: int) — reachable vertices only
    levels: int


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_levels: int = 50,
    directed: bool = True,
) -> BfsResult:
    """(id, dist) = min #hops from any seed, following src→dst edges
    (both directions when ``directed=False``). Seeds: a DataFrame with an
    ``id`` column. Unreachable vertices are absent from the result."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()
    e.count()

    visited = seeds.select(F.col("id").cast("long")).distinct().select(
        "id", F.lit(0).alias("dist")
    ).persist()
    frontier = visited
    level = 0
    while level < max_levels:
        level += 1
        nxt = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(level).alias("dist"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            level -= 1
            break
        new_visited = visited.union(nxt).localCheckpoint(eager=False).persist()
        new_visited.count()
        visited.unpersist()
        visited = new_visited
        frontier = nxt
    e.unpersist()
    return BfsResult(visited.withColumn("dist", F.col("dist").cast("int")), level)


def labeled_bfs(
    edges: DataFrame,
    probes: DataFrame,
    max_levels: int = 50,
    directed: bool = True,
) -> DataFrame:
    """(probe, id, dist) — PER-PROBE hop distances, all probes flooded in
    one pass with a composite (probe, id) frontier key (multi-source
    :func:`bfs_distances` collapses seeds into one wave; this keeps them
    apart). State size is |probes| × reach — meant for bounded probe sets
    (centrality sampling), not all-pairs."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()
    e.count()

    visited = (
        probes.select(F.col("id").cast("long").alias("probe"))
        .distinct()
        .select("probe", F.col("probe").alias("id"), F.lit(0).alias("dist"))
        .persist()
    )
    frontier = visited
    level = 0
    while level < max_levels:
        level += 1
        nxt = (
            frontier.join(e, frontier["id"] == e["src"])
            .select("probe", F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("probe", "id"), ["probe", "id"], "left_anti")
            .select("probe", "id", F.lit(level).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        nv = visited.union(nxt).localCheckpoint(eager=False).persist()
        nv.count()
        visited.unpersist()
        visited = nv
        frontier = nxt
    e.unpersist()
    return visited.withColumn("dist", F.col("dist").cast("int"))


def harmonic_centrality(
    edges: DataFrame,
    probes: DataFrame,
    max_levels: int = 50,
    directed: bool = True,
) -> DataFrame:
    """(probe, harmonic) — Σ_{v reachable, v≠probe} 1/dist(probe, v), the
    centrality that stays finite on disconnected graphs (Boldi & Vigna
    2014). Probes reaching nothing score 0.0."""
    d = labeled_bfs(edges, probes, max_levels, directed)
    return (
        d.groupBy("probe")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("dist") > 0, 1.0 / F.col("dist"))), F.lit(0.0)
            ).alias("harmonic")
        )
    )


def closeness_centrality(
    edges: DataFrame,
    probes: DataFrame,
    max_levels: int = 50,
    directed: bool = True,
) -> DataFrame:
    """(probe, n_reached, closeness) — Bavelas closeness restricted to the
    reachable set: (n_reached − 1) / Σ dist (0.0 when nothing is reached).
    Same one-flood labeled BFS as :func:`harmonic_centrality`."""
    d = labeled_bfs(edges, probes, max_levels, directed)
    agg = d.groupBy("probe").agg(
        (F.count(F.lit(1)) - 1).alias("n_reached"),
        F.sum("dist").alias("sd"),
    )
    return agg.select(
        "probe",
        F.col("n_reached").cast("long").alias("n_reached"),
        F.when(F.col("sd") > 0, F.col("n_reached") / F.col("sd"))
        .otherwise(0.0)
        .alias("closeness"),
    )


def eccentricity(
    edges: DataFrame,
    probes: DataFrame,
    max_levels: int = 50,
    directed: bool = True,
) -> DataFrame:
    """(probe, eccentricity, n_reached) — max hop distance over the
    probe's reachable set (the radius/diameter probe estimator: max over a
    probe sample lower-bounds the diameter, min upper-bounds the radius).
    Same one-flood labeled BFS as :func:`harmonic_centrality`."""
    d = labeled_bfs(edges, probes, max_levels, directed)
    return d.groupBy("probe").agg(
        F.max("dist").cast("int").alias("eccentricity"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
    )


def ego_subgraph(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    directed: bool = True,
) -> DataFrame:
    """The k-hop ego network: edges of the original graph whose BOTH
    endpoints lie within ``k`` hops of the seed set — the neighborhood
    extraction primitive (crawl frontier scoping, sampled training
    subgraphs). Two semi-joins against the (small) reachable set; the big
    edge table is scanned once."""
    reach = bfs_distances(edges, seeds, max_levels=k, directed=directed).distances
    ids = reach.select("id")
    return (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select(*edges.columns)
    )
