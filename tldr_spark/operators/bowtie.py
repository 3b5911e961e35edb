"""Bow-tie decomposition of a directed web graph (Broder, Kumar, Maghoul,
Raghavan, Rajagopalan, Stata, Tomkins, Wiener — "Graph structure in the
Web", WWW 2000): every vertex is classified relative to the largest
strongly connected component.

  CORE          the largest SCC (ties broken by smallest component id)
  IN            reaches CORE, not in CORE
  OUT           reachable from CORE, not in CORE
  TUBE          on an IN→OUT path that avoids CORE
  TENDRIL_IN    reachable from IN but cannot reach OUT (hangs off IN)
  TENDRIL_OUT   reaches OUT but not reachable from IN (hangs into OUT)
  DISCONNECTED  everything else (other weak components)

This is THE canonical structural census of a crawl graph — on the 2000
AltaVista crawl the six regions split roughly a quarter each for
CORE/IN/OUT with the rest in tendrils+disconnected, and every serious
web-graph paper since reports this table.

Scale shape (the 100-TB story): one SCC run (the dominant cost — reuse an
existing labeling via ``assignments=``), then FOUR multi-source BFS sweeps
(forward/backward from CORE, forward from IN, backward from OUT), each a
frontier iteration whose per-round work is one edge semi-join — no
transitive closure is ever materialized (the DuckDB oracle does build the
closure, which is exactly why the oracle is verification-scale only). The
final region label is pure V-row set algebra: two left-anti membership
flags per vertex, no shuffle wider than V.

Set identities used (F = fwd-reach(CORE) incl. CORE, B = bwd-reach(CORE)):
  CORE = F ∩ B           (a vertex both reachable-from and reaching CORE
                          is mutually reachable with it → same SCC)
  OUT  = F \\ B            IN = B \\ F
  FI   = fwd-reach(IN)  \\ (F ∪ B)     candidate tendril-in mass
  BO   = bwd-reach(OUT) \\ (F ∪ B)     candidate tendril-out mass
  TUBE = FI ∩ BO;  TENDRIL_IN = FI \\ BO;  TENDRIL_OUT = BO \\ FI
(paths from IN that pass through CORE surface inside F and are excluded,
so FI/BO need no core-removed subgraph — the subtraction is equivalent.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from tldr_spark.operators.bfs import bfs_distances
from tldr_spark.operators.scc import strongly_connected_components

REGIONS = (
    "CORE",
    "IN",
    "OUT",
    "TUBE",
    "TENDRIL_IN",
    "TENDRIL_OUT",
    "DISCONNECTED",
)


@dataclass
class BowTieResult:
    assignments: DataFrame  # (id: long, region: string)
    core_component: int     # SCC label of the core (min vertex id in it)
    core_size: int


def _reach(e: DataFrame, seeds: DataFrame, reverse: bool) -> DataFrame:
    """Vertex ids reachable from ``seeds`` following src→dst (or dst→src
    when ``reverse``), seeds included. Frontier BFS — never a closure."""
    edges = e.select(F.col("dst").alias("src"), F.col("src").alias("dst")) if reverse else e
    return bfs_distances(edges, seeds, max_levels=10**6, directed=True).distances.select("id")


def bow_tie(edges: DataFrame, assignments: DataFrame | None = None) -> BowTieResult:
    """Classify every vertex of the directed graph into its Broder bow-tie
    region. ``assignments`` reuses an existing SCC labeling (id, component)
    — the expensive part; omitted, SCC is computed here. Isolated self-loop
    vertices are dropped with the self-loops (consistent with
    :func:`strongly_connected_components`)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    e.count()
    if assignments is None:
        assignments = strongly_connected_components(e).assignments
    assignments = assignments.persist()

    sizes = assignments.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    top = sizes.orderBy(F.desc("n"), F.asc("component")).first()
    if top is None:  # empty graph
        e.unpersist()
        assignments.unpersist()
        spark = edges.sparkSession
        return BowTieResult(
            spark.createDataFrame([], "id long, region string"), -1, 0
        )
    core_component, core_size = int(top["component"]), int(top["n"])

    core = assignments.filter(F.col("component") == core_component).select("id")
    core = core.localCheckpoint(eager=True)

    fwd = _reach(e, core, reverse=False).persist()   # F: CORE ∪ OUT
    bwd = _reach(e, core, reverse=True).persist()    # B: CORE ∪ IN
    fwd.count(); bwd.count()

    out_ = fwd.join(bwd, "id", "left_anti").localCheckpoint(eager=True)
    in_ = bwd.join(fwd, "id", "left_anti").localCheckpoint(eager=True)
    fb = fwd.union(bwd).distinct().localCheckpoint(eager=True)

    fi = _reach(e, in_, reverse=False).join(fb, "id", "left_anti").persist()
    bo = _reach(e, out_, reverse=True).join(fb, "id", "left_anti").persist()
    fi.count(); bo.count()

    tube = fi.join(bo, "id", "left_semi")
    tin = fi.join(bo, "id", "left_anti")
    tout = bo.join(fi, "id", "left_anti")

    def _lab(frame: DataFrame, region: str) -> DataFrame:
        return frame.select("id", F.lit(region).alias("region"))

    labeled = (
        _lab(core, "CORE")
        .union(_lab(in_, "IN"))
        .union(_lab(out_, "OUT"))
        .union(_lab(tube, "TUBE"))
        .union(_lab(tin, "TENDRIL_IN"))
        .union(_lab(tout, "TENDRIL_OUT"))
    )
    disconnected = (
        assignments.select("id")
        .join(labeled.select("id"), "id", "left_anti")
        .select("id", F.lit("DISCONNECTED").alias("region"))
    )
    result = labeled.union(disconnected).localCheckpoint(eager=True)

    for frame in (fwd, bwd, fi, bo, assignments, e):
        frame.unpersist()
    return BowTieResult(result, core_component, core_size)


def bow_tie_census(edges: DataFrame, assignments: DataFrame | None = None) -> DataFrame:
    """(region, n_vertices) — the headline table of Broder et al. Regions
    with zero mass are still emitted (n_vertices = 0) so the census schema
    is stable across graphs."""
    res = bow_tie(edges, assignments)
    spark = edges.sparkSession
    all_regions = spark.createDataFrame([(r,) for r in REGIONS], "region string")
    counts = res.assignments.groupBy("region").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        all_regions.join(counts, "region", "left")
        .select("region", F.coalesce("n", F.lit(0)).cast("long").alias("n_vertices"))
    )
