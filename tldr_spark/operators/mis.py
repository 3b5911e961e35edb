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


@dataclass
class ColoringResult:
    colors: DataFrame  # (id: long, color: int)
    n_colors: int


def greedy_coloring(edges: DataFrame, max_colors: int = 64) -> ColoringResult:
    """Distributed greedy graph coloring by iterated MIS (the Jones-
    Plassmann strategy): color class c = a maximal independent set of the
    subgraph induced by still-uncolored vertices (plus every uncolored
    vertex whose neighbors are all colored — isolated in the residual).
    Deterministic via the md5 priorities of
    :func:`maximal_independent_set`. Uses at most degeneracy+1-ish colors
    in practice; raises past ``max_colors`` rather than looping."""
    und = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    und = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    uncolored = und.select(F.col("u").alias("id")).distinct().persist()
    n = uncolored.count()
    spark = edges.sparkSession

    colored_frames: list[DataFrame] = []
    color = 0
    while n > 0:
        if color >= max_colors:
            raise RuntimeError(
                f"greedy coloring exceeded max_colors={max_colors} "
                f"({n} vertices uncolored)."
            )
        live = (
            und.join(uncolored.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(uncolored.withColumnRenamed("id", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        # uncolored vertices isolated in the residual take this color too
        isolated = uncolored.join(
            live.select(F.col("u").alias("id")), "id", "left_anti"
        )
        mis = maximal_independent_set(
            live.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        ).members
        cls = (
            mis.union(isolated)
            .select("id", F.lit(color).alias("color"))
            .localCheckpoint(eager=True)
        )
        colored_frames.append(cls)
        new_uncolored = (
            uncolored.join(cls.select("id"), "id", "left_anti")
            .localCheckpoint(eager=False)
            .persist()
        )
        n = new_uncolored.count()
        uncolored.unpersist()
        uncolored = new_uncolored
        color += 1

    if colored_frames:
        from functools import reduce

        out = reduce(DataFrame.union, colored_frames).localCheckpoint(eager=True)
    else:
        out = spark.createDataFrame([], "id long, color int")
    und.unpersist()
    uncolored.unpersist()
    return ColoringResult(out, color)
