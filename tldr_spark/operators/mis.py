"""Maximal independent set — Luby's algorithm (Luby 1986), the classic
O(log n)-round distributed symmetry-breaking primitive (used downstream for
scheduling, graph coloring seeds, landmark selection).

Deterministic variant: a vertex's per-round priority is the first 8 hex
chars of md5("<id>-<round>") (the same cross-engine-reproducible hash
discipline as operators/walks.py), tie-broken by vertex id. Each round,
every undecided vertex that beats ALL its undecided neighbors joins the
set; winners' neighbors are knocked out. Expected rounds O(log n) — each
round kills a constant fraction of remaining edges in expectation over the
hash, and the loop raises past ``max_rounds`` rather than returning a
non-maximal set.

All DataFrame algebra: per round 1 aggregate for neighbor-max (shuffle on
the undirected adjacency, hub-skew absorbed by map-side partial max) and
2 anti-joins to shrink the frontier; 2 counting actions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class MisResult:
    members: DataFrame  # (id: long) — the maximal independent set
    rounds: int


def _priority(round_no: int):
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("-", F.col("id"), F.lit(round_no))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def maximal_independent_set(edges: DataFrame, max_rounds: int = 100) -> MisResult:
    """(id) rows forming a maximal independent set of the undirected simple
    graph; isolated vertices of the input edge list never appear (the edge
    table defines the vertex set — endpoints only)."""
    spark = edges.sparkSession
    und = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    und = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    undecided = und.select(F.col("u").alias("id")).distinct().persist()
    n = undecided.count()

    member_frames: list[DataFrame] = []
    rounds = 0
    while n > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"Luby MIS did not finish within max_rounds={max_rounds} "
                f"({n} vertices undecided)."
            )
        pri = undecided.select("id", _priority(rounds).alias("p"))
        # live adjacency: both endpoints still undecided
        live = (
            und.join(undecided.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(undecided.withColumnRenamed("id", "v"), "v", "left_semi")
        )
        # neighbor-best as an orderable struct: (p, id) lexicographic
        nb = (
            live.join(
                pri.select(F.col("id").alias("v"), F.col("p").alias("vp")), "v"
            )
            .groupBy("u")
            .agg(F.max(F.struct(F.col("vp").alias("p"), F.col("v").alias("id"))).alias("best"))
            .withColumnRenamed("u", "id")
        )
        winners = (
            pri.join(nb, "id", "left")
            .filter(
                F.col("best").isNull()
                | (F.struct(F.col("p"), F.col("id")) > F.col("best"))
            )
            .select("id")
            .localCheckpoint(eager=True)
        )
        member_frames.append(winners)
        # knock out winners and their neighbors
        knocked = winners.union(
            live.join(winners.withColumnRenamed("id", "u"), "u", "left_semi")
            .select(F.col("v").alias("id"))
        ).distinct()
        new_undecided = (
            undecided.join(knocked, "id", "left_anti")
            .localCheckpoint(eager=False)
            .persist()
        )
        n = new_undecided.count()
        undecided.unpersist()
        undecided = new_undecided

    if member_frames:
        from functools import reduce

        members = reduce(DataFrame.union, member_frames).localCheckpoint(eager=True)
    else:
        members = spark.createDataFrame([], "id long")
    und.unpersist()
    undecided.unpersist()
    return MisResult(members, rounds)
