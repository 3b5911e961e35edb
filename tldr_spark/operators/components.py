"""Connected components via alternating small-star / large-star rounds.

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — the engine's generalization of the reference's
iterate-to-fixpoint skeleton (/root/reference/tldr.go:222-256, SURVEY.md §2
"North-rule generalization operators"). Converges in O(log n) rounds on any
graph, each round two shuffles (a min-aggregate and a join), which is what
makes it viable at web scale versus O(diameter) min-label flooding.

  large-star: for every vertex u, connect all STRICTLY LARGER neighbors to
              m(u) = min(Γ(u) ∪ {u})
  small-star: orient edges large→small; connect all neighbors (all ≤ u) and
              u itself to m(u), dropping (m,m) self-loops

Fixpoint: the edge set is a union of stars rooted at component minima.
Convergence is detected with a (count, xxhash64-sum) checksum — O(1) driver
data per round — with an exact guard round. Lineage truncated per round via
localCheckpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class ComponentsResult:
    assignments: DataFrame  # (id: long, component: long)  component = min id
    rounds: int


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    sym = _symmetrize(e)
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))  # all v <= u, so m = min(Γ∪{u})
    nbrs = (
        d.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfe = mins.select(F.col("u"), F.col("m").alias("v")).filter(F.col("u") != F.col("v"))
    return nbrs.union(selfe).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    # bit_xor is order-insensitive and cannot overflow (ANSI-safe), unlike sum
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _union_find_local(edge_rows: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """(id, component=min member id) by path-halving union-find over a
    collected edge list. Driver-side FINISHER only — callers bound the
    input before collecting."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for u, v in edge_rows:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # second pass: full compression, then min-id per root (roots were
    # union-by-min so the root IS the min member)
    return [(x, find(x)) for x in parent]


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_rounds: int = 50,
    checkpoint=None,
    checkpoint_every: int = 5,
    local_finish_edges: int = 1_000_000,
) -> ComponentsResult:
    """(id, component) with component = smallest vertex id in the component.

    ``edges``: (src, dst) in any orientation; self-loops/duplicates fine.
    ``vertices``: optional (id) — isolated vertices become their own
    singleton components (they never appear in the edge set, mirroring
    §2.7's linked-nodes-only rule unless the caller supplies them).
    ``checkpoint``: an :class:`tldr_spark.plans.checkpoint.IterativeCheckpoint`
    — every ``checkpoint_every``-th round durably snapshots the star-set
    with its convergence checksum, and a restarted call resumes from the
    newest committed round (the star-contraction state is exactly the edge
    set, so resume is a parquet read; same protocol as the PageRank loop).
    """
    raw = edges.select(
        F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
    )
    # vertex set BEFORE self-loop removal: a vertex linked only to itself is
    # still linked (§2.7 linked-nodes-only applies to truly absent vertices)
    linked = raw.select(F.col("u").alias("id")).union(raw.select(F.col("v").alias("id"))).distinct()

    rounds = 0
    resumed = checkpoint.latest() if checkpoint else None
    if resumed:
        rounds, e, last_m = resumed
        e = e.localCheckpoint(eager=True)
        prev = (int(last_m["n"]), int(last_m["h"]))
    else:
        e = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
        prev = None
    # LOCAL FINISH (round-3, same regime as scc.py's Tarjan finisher): on a
    # small edge set the star-contraction rounds cost barriers + per-round
    # codegen, not shuffle — a bounded collect + union-find is the right
    # plan. Driver cost at the default 1M-row bound: the raw (u, v) longs
    # are ~16 MB, but materialized pyspark Rows + the finisher's dict state
    # run to a few hundred MB of transient driver-Python heap — bounded
    # and freed, but size local_finish_edges to the driver, not to the
    # serialized bytes (ADVICE r3). Disabled when checkpointing (the
    # caller asked for durable round snapshots) or local_finish_edges=0;
    # the distributed path stays differential-tested both ways. Probed
    # BEFORE the convergence checksum — when the finisher fires (the
    # common small-graph case) the full-scan checksum would be pure
    # wasted work (ADVICE r3).
    if checkpoint is None and local_finish_edges > 0:
        probe = e.take(local_finish_edges + 1)
        if len(probe) <= local_finish_edges:
            spark = edges.sparkSession
            pairs = _union_find_local([(r["u"], r["v"]) for r in probe])
            assign = (
                spark.createDataFrame(pairs, "id long, component long")
                if pairs
                else spark.createDataFrame([], "id long, component long")
            )
            vs = linked
            if vertices is not None:
                vs = vs.union(
                    vertices.select(F.col(vertices.columns[0]).cast("long").alias("id"))
                ).distinct()
            assign = vs.join(assign, "id", "left").select(
                "id", F.coalesce("component", "id").alias("component")
            )
            return ComponentsResult(assign, 0)
    if prev is None:
        prev = _checksum(e)
    while rounds < max_rounds:
        rounds += 1
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e2)
        e = e2
        converged = cur == prev
        if checkpoint and (rounds % checkpoint_every == 0 or converged):
            e = checkpoint.save(rounds, e, {"n": cur[0], "h": cur[1]})
        if converged:
            break
        prev = cur

    # at fixpoint every edge is (child, root); roots point to themselves
    assign = (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("id"), F.col("v").alias("component")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    vs = linked
    if vertices is not None:
        vs = vs.union(
            vertices.select(F.col(vertices.columns[0]).cast("long").alias("id"))
        ).distinct()
    assign = vs.join(assign, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )
    return ComponentsResult(assign, rounds)
