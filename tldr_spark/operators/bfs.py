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


def _bfs_local(
    edge_rows: list[tuple[int, int]], seed_ids: list[int], max_levels: int
) -> tuple[list[tuple[int, int]], int]:
    """Deque BFS over a collected edge list. Driver-side FINISHER only —
    callers bound the input before collecting. Returns (rows, levels)
    mirroring the distributed semantics exactly (levels = deepest level
    actually REACHED, capped at max_levels)."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for s, d in edge_rows:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seed_ids}
    dq = deque(seed_ids)
    levels = 0
    while dq:
        u = dq.popleft()
        du = dist[u]
        if du >= max_levels:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = du + 1
                levels = max(levels, du + 1)
                dq.append(v)
    return sorted(dist.items()), levels


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_levels: int = 50,
    directed: bool = True,
    local_finish_edges: int = 1_000_000,
) -> BfsResult:
    """(id, dist) = min #hops from any seed, following src→dst edges
    (both directions when ``directed=False``). Seeds: a DataFrame with an
    ``id`` column. Unreachable vertices are absent from the result.

    LOCAL FINISH (round-3, same bounded-driver-work contract as scc.py /
    components.py): a small edge set means the frontier rounds cost
    barriers + codegen, not shuffle, so when the deduped edge set fits
    ``local_finish_edges`` collected rows the whole BFS runs as a deque
    walk on the driver. Driver cost at the default 1M-row bound: ~16 MB
    of raw longs but a few hundred MB of transient driver-Python heap
    once Rows + adjacency dicts materialize (ADVICE r3) — bounded and
    freed; size the bound to the driver. ``local_finish_edges=0`` forces
    the distributed frontier path; both stay differential-tested."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()
    e.count()

    if local_finish_edges > 0:
        probe = e.take(local_finish_edges + 1)
        if len(probe) <= local_finish_edges:
            # seeds are bounded too (≤ V ≤ 2·|E|, but a caller could pass
            # an unrelated huge table — cap with take and fall through)
            seed_cap = 2 * local_finish_edges + 1
            seed_rows = seeds.select(F.col("id").cast("long")).distinct().take(seed_cap)
            if len(seed_rows) < seed_cap:
                rows, levels = _bfs_local(
                    [(r["src"], r["dst"]) for r in probe],
                    [r["id"] for r in seed_rows],
                    max_levels,
                )
                e.unpersist()
                spark = edges.sparkSession
                out = (
                    spark.createDataFrame(rows, "id long, dist int")
                    if rows
                    else spark.createDataFrame([], "id long, dist int")
                )
                return BfsResult(out, levels)

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
    local_finish_edges: int = 500_000,
) -> DataFrame:
    """(probe, id, dist) — PER-PROBE hop distances, all probes flooded in
    one pass with a composite (probe, id) frontier key (multi-source
    :func:`bfs_distances` collapses seeds into one wave; this keeps them
    apart). State size is |probes| × reach — meant for bounded probe sets
    (centrality sampling), not all-pairs.

    LOCAL FINISH: same bounded contract as :func:`bfs_distances`, one
    driver deque walk per probe (probes are bounded by design here;
    the probe set is additionally capped at 4096 for the local path —
    beyond that the |probes| × reach output is distributed-sized anyway).
    ``local_finish_edges=0`` forces the distributed path."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()
    e.count()

    if local_finish_edges > 0:
        eprobe = e.take(local_finish_edges + 1)
        if len(eprobe) <= local_finish_edges:
            probe_rows = (
                probes.select(F.col("id").cast("long")).distinct().take(4097)
            )
            if len(probe_rows) <= 4096:
                rows: list[tuple[int, int, int]] = []
                edge_list = [(r["src"], r["dst"]) for r in eprobe]
                for pr in probe_rows:
                    dd, _ = _bfs_local(edge_list, [pr["id"]], max_levels)
                    rows.extend((pr["id"], v, d) for v, d in dd)
                e.unpersist()
                spark = edges.sparkSession
                return (
                    spark.createDataFrame(rows, "probe long, id long, dist int")
                    if rows
                    else spark.createDataFrame([], "probe long, id long, dist int")
                )

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


def global_efficiency(
    edges: DataFrame,
    probes: DataFrame,
    max_levels: int = 50,
    directed: bool = True,
) -> DataFrame:
    """One-row graph-level distance summary estimated from a probe sample
    (the sampled-source estimator of Wiener index / average shortest-path
    length / global efficiency — Latora & Marchiori 2001): BFS from each
    probe, then

      pairs_reached = #{(p, v) : v reachable from p, v != p}
      wiener_sum    = Σ dist(p, v)            (sampled Wiener index)
      avg_dist      = wiener_sum / pairs_reached
      efficiency    = Σ 1/dist(p, v) / (|probes| * (|V| - 1))

    Efficiency divides by ALL possible ordered pairs, so unreachable pairs
    drag it toward 0 — the standard disconnected-graph-safe form. Returns
    (n_probes, n_vertices, pairs_reached, wiener_sum, avg_dist, efficiency);
    avg_dist/efficiency are 0.0 when nothing is reached. One labeled-BFS
    flood + one global aggregate."""
    d = labeled_bfs(edges, probes, max_levels, directed)
    n_probes = probes.select(F.col("id").cast("long")).distinct().count()
    n_vertices = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    agg = d.filter(F.col("dist") > 0).agg(
        F.count(F.lit(1)).alias("pairs_reached"),
        F.coalesce(F.sum("dist"), F.lit(0)).cast("long").alias("wiener_sum"),
        F.coalesce(F.sum(1.0 / F.col("dist")), F.lit(0.0)).alias("inv_sum"),
    )
    denom = float(n_probes * max(n_vertices - 1, 1))
    return agg.select(
        F.lit(n_probes).cast("long").alias("n_probes"),
        F.lit(n_vertices).cast("long").alias("n_vertices"),
        F.col("pairs_reached").cast("long").alias("pairs_reached"),
        "wiener_sum",
        F.when(
            F.col("pairs_reached") > 0,
            F.col("wiener_sum").cast("double") / F.col("pairs_reached"),
        )
        .otherwise(0.0)
        .alias("avg_dist"),
        (F.col("inv_sum") / F.lit(denom)).alias("efficiency"),
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
