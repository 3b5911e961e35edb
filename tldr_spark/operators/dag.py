"""DAG longest-path levels (topological layering) — the tier analysis that
runs on the SCC condensation of a crawl graph.

``level(v)`` = length of the longest directed path ending at ``v`` (sources
are level 0). On the condensation DAG this is the "crawl tier" of each
component: level-0 components are pure link sources (the IN side of the
Broder bow-tie), the maximum level is the condensation's longest chain.

Shape: synchronous max-relaxation (Bellman-Ford with max instead of min,
valid because the input is acyclic so no positive cycle can diverge). Per
round one shuffle pair — frontier ⋈ edges on ``src``, then max-aggregate on
``dst`` — exactly the SSSP discipline (operators/sssp.py) with the frontier
restricted to vertices whose level rose last round, so late rounds touch
only the deep tail of the DAG, not all V. Rounds = DAG depth; a web
condensation is shallow (the bow-tie has O(10) tiers), so the driver loop
is short even at 10^12 pages. Cycles are DETECTED, not looped on: a true
DAG converges in < |V| rounds, so exhausting ``max_rounds`` without an
empty frontier raises instead of returning a wrong fixpoint.

LOCAL FINISH: same bounded contract as operators/bfs.py — a condensation
that fits ``local_finish_edges`` collected rows runs Kahn's algorithm on
the driver (which also detects cycles exactly). ``local_finish_edges=0``
forces the distributed path; both stay differential-tested.

Reference parity note: the reference (didasy/tldr) has no graph-tier
operator — this generalizes its LexRank connectivity analysis (tldr.go:
pageRank over the sentence graph) to the condensation-DAG layering a
link-graph engine needs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class DagLevelsResult:
    levels: DataFrame  # (id: long, level: int)
    depth: int  # max level = longest path length
    rounds: int


class CycleError(ValueError):
    """The input graph is not acyclic."""


def _levels_local(edge_rows: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Kahn's algorithm on a collected edge list. Driver-side FINISHER only
    — callers bound the input before collecting. Raises CycleError when a
    cycle prevents a complete topological order."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    indeg: dict[int, int] = {}
    for s, d in edge_rows:
        adj.setdefault(s, []).append(d)
        indeg[d] = indeg.get(d, 0) + 1
        indeg.setdefault(s, 0)
    level = {v: 0 for v, k in indeg.items() if k == 0}
    dq = deque(level)
    done = 0
    while dq:
        u = dq.popleft()
        done += 1
        for v in adj.get(u, ()):
            level[v] = max(level.get(v, 0), level[u] + 1)
            indeg[v] -= 1
            if indeg[v] == 0:
                dq.append(v)
    if done < len(indeg):
        raise CycleError(f"input graph has a cycle ({len(indeg) - done} vertices unresolved)")
    return sorted(level.items())


def dag_levels(
    edges: DataFrame,
    max_rounds: int = 200,
    local_finish_edges: int = 1_000_000,
) -> DagLevelsResult:
    """(id, level) over a DAG; level = longest-path length ending at id.

    Raises :class:`CycleError` on cyclic input (self-loops immediately;
    longer cycles when relaxation fails to converge within ``max_rounds``
    — a DAG always converges in depth < |V| rounds, so size ``max_rounds``
    to the deepest layering you accept as legitimate)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .persist()
    )
    n_self = e.filter(F.col("src") == F.col("dst")).count()
    if n_self:
        e.unpersist()
        raise CycleError(f"{n_self} self-loop(s) in input")

    if local_finish_edges > 0:
        probe = e.take(local_finish_edges + 1)
        if len(probe) <= local_finish_edges:
            e.unpersist()
            rows = _levels_local([(r["src"], r["dst"]) for r in probe])
            spark = edges.sparkSession
            out = (
                spark.createDataFrame(rows, "id long, level int")
                if rows
                else spark.createDataFrame([], "id long, level int")
            )
            depth = max((lvl for _, lvl in rows), default=0)
            return DagLevelsResult(out, depth, 0)

    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    level = verts.select("id", F.lit(0).alias("level")).persist()
    level.count()
    frontier = level  # every vertex starts as a candidate source of relaxation
    rounds = 0
    converged = False
    while rounds < max_rounds:
        rounds += 1
        cand = (
            frontier.join(e, frontier["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg((F.max("level") + 1).alias("clevel"))
        )
        merged = (
            level.join(cand, "id", "left")
            .select(
                "id",
                F.greatest("level", F.coalesce("clevel", F.lit(0))).alias("level"),
                (F.col("clevel") > F.col("level")).alias("improved"),
            )
            .localCheckpoint(eager=False)
            .persist()
        )
        nxt = merged.filter("improved").select("id", "level").localCheckpoint(eager=True)
        n_improved = nxt.count()
        level.unpersist()
        level = merged.drop("improved")
        frontier = nxt
        if n_improved == 0:
            rounds -= 1
            converged = True
            break
    e.unpersist()
    if not converged:
        level.unpersist()
        raise CycleError(
            f"no convergence in {max_rounds} rounds — cycle, or depth > max_rounds"
        )
    depth_row = level.agg(F.coalesce(F.max("level"), F.lit(0))).collect()
    return DagLevelsResult(
        level.withColumn("level", F.col("level").cast("int")),
        int(depth_row[0][0]),
        rounds,
    )


def condensation_levels(edges: DataFrame, **kwargs) -> DataFrame:
    """(component, level) — the crawl-tier layering: SCC-condense the edge
    table (operators/scc.py:condensation — acyclic by construction, so
    :func:`dag_levels` cannot raise), then longest-path levels. Components
    with no cross-component edge are isolated condensation vertices at
    level 0; they are restored from the SCC assignment after the relaxation
    (the condensation edge list drops them)."""
    from tldr_spark.operators.scc import condensation, strongly_connected_components

    assignments = strongly_connected_components(edges).assignments
    cond = condensation(edges, assignments)
    lv = dag_levels(
        cond.select(
            F.col("src_component").alias("src"), F.col("dst_component").alias("dst")
        ),
        **kwargs,
    ).levels
    comps = assignments.select(F.col("component").alias("id")).distinct()
    return comps.join(lv, "id", "left").select(
        F.col("id").alias("component"),
        F.coalesce("level", F.lit(0)).cast("int").alias("level"),
    )
