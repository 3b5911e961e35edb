"""Balanced graph partition refinement — restreaming-LDG-style.

The operator that makes the engine's partitioning story first-class
instead of implicit: starting from the uniform hash assignment
(vertex % P — what every hash shuffle does), each synchronous round
every vertex moves to the partition holding the PLURALITY of its
neighbors, with load used as the tie-break (prefer the currently
smaller partition, then the smaller partition id). This is the
deterministic synchronous variant of restreamed Linear Deterministic
Greedy partitioning (Stanton-Kliot KDD'12; Nishimura-Ugander KDD'13
restreaming), the standard cheap edge-cut reducer before co-partitioned
join pipelines: fewer cut edges ⇒ less cross-partition shuffle traffic
for every downstream edge join.

Update rule (all-integer, engine-exact):

    p_{k+1}(v) = argmax_p ( count of v's neighbors in p,
                            -size_k(p),      -- load tie-break
                            -p )             -- determinism tie-break

Scale shape per round: ONE edge join against the V-row assignment frame
+ one (vertex, partition) partial count + one P-row size aggregate that
rides as a broadcast — the same shape as an LPA round. Rounds are fixed
and small. Deterministic on any partitioning: integer counts, integer
sizes, total tie-break.

:func:`edge_cut` prices an assignment: the fraction of edges whose
endpoints land in different partitions — the direct proxy for shuffle
volume saved.

Reference parity note: the reference (didasy/tldr) is single-process
and has no partitioning concept; this operator exists for the
cluster-scale axis the north rule adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _und(edges: DataFrame) -> DataFrame:
    e = (
        edges.select(
            F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()


def balanced_partition(
    edges: DataFrame, n_parts: int = 8, rounds: int = 4
) -> DataFrame:
    """(id, part) — refined balanced assignment of the undirected simple
    graph of ``edges`` into ``n_parts`` partitions, ``rounds`` synchronous
    plurality moves from the ``id % n_parts`` hash start."""
    if n_parts < 1 or rounds < 0:
        raise ValueError("n_parts must be >= 1 and rounds >= 0")
    sym = _und(edges).persist()
    p = sym.select(F.col("u").alias("id")).distinct().select(
        "id", F.pmod(F.col("id"), F.lit(n_parts)).alias("part")
    )
    for _ in range(rounds):
        sz = p.groupBy("part").agg(F.count(F.lit(1)).alias("s"))
        cnt = (
            sym.join(p.select(F.col("id").alias("v"), "part"), "v")
            .groupBy("u", "part")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        p = (
            cnt.join(F.broadcast(sz), "part")
            .groupBy("u")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("s")).alias("ns"), (-F.col("part")).alias("np")
                    )
                ).alias("best")
            )
            .select(F.col("u").alias("id"), (-F.col("best.np")).alias("part"))
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return p


def edge_cut(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """One row (n_cut, n_edges): canonical undirected edges whose
    endpoints sit in different partitions of ``assignment`` (id, part)."""
    ce = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("a"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    pa = assignment.select(F.col("id").alias("a"), F.col("part").alias("p_a"))
    pb = assignment.select(F.col("id").alias("b"), F.col("part").alias("p_b"))
    return (
        ce.join(pa, "a")
        .join(pb, "b")
        .agg(
            F.sum((F.col("p_a") != F.col("p_b")).cast("long")).alias("n_cut"),
            F.count(F.lit(1)).alias("n_edges"),
        )
    )
