"""Distributed maximal matching — locally-minimal-edge elimination.

The third symmetry-breaking primitive next to Luby MIS (operators/mis.py)
and Jones-Plassmann coloring (operators/coloring.py): each round, an
alive edge joins the matching iff its priority is the strict minimum
among ALL alive edges touching either endpoint (the local-max/local-min
rule of Preis' parallel matching, STACS'99; round complexity of the
greedy family analyzed by Blelloch-Fineman-Shun, SPAA'12 — O(log m)
rounds in practice). Matched endpoints drop out; repeat until no edge
survives. The result is a maximal matching: no two picked edges share a
vertex, and every dropped edge lost an endpoint to a picked one.
Link-graph use: one-to-one page pairing for dedup canonicalization and
A/B content splits where each page may appear at most once.

DETERMINISM is the whole design: priorities are the same Lehmer/MINSTD
integer hash the sampling operators use (bounded arithmetic, < 2^48
intermediates — no engine hash function), ties broken lexicographically
by (a, b), so Spark, the pure-python test mirror, and the unrolled
DuckDB oracle pick bit-identical matchings, and the output is stable
across partitionings and reruns.

Shape per round: ONE incident-list aggregate (per-vertex min of the
(p, a, b) struct — partial-aggregated map-side) + one self-equi-join of
the alive edges against the V-row winner frame + two anti-joins to drop
matched endpoints. No all-pairs term anywhere; state is the shrinking
alive edge set, lineage truncated per round with localCheckpoint.

Reference parity note: the reference (didasy/tldr) has no matching
operator; this extends the §2.7 iteration skeleton to the
symmetry-breaking family the north rule's cluster-scale scope implies.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

_M = 2_147_483_647  # 2^31 − 1, MINSTD modulus (same constants as sampling.py)
_A = 48271


def edge_priority(a, b):
    """Column expr: Lehmer-mix of the canonical pair — every intermediate
    < 2^48; pmod keeps negative vertex ids lawful (python-% semantics,
    matching the test mirror)."""
    h1 = F.pmod(F.pmod(a.cast("long"), F.lit(_M)) * F.lit(_A), F.lit(_M))
    h2 = F.pmod(h1 + F.pmod(b.cast("long"), F.lit(_M)), F.lit(_M))
    return F.pmod(h2 * F.lit(_A), F.lit(_M))


def priority_sql(a_expr: str, b_expr: str) -> str:
    """The identical priority as a SQL fragment (nonnegative ids — the
    oracle's doc-id graph; the operator itself also handles negatives)."""
    return (
        f"((((({a_expr}) % {_M}) * {_A}) % {_M} + ({b_expr}) % {_M})"
        f" % {_M} * {_A}) % {_M}"
    )


@dataclass
class MatchingResult:
    pairs: DataFrame  # (a: long, b: long, matched_round: int), a < b
    rounds: int       # elimination rounds executed


def vertex_cover_2approx(result: "MatchingResult") -> DataFrame:
    """Gavril/Yannakakis 2-approximate minimum vertex cover: the endpoints
    of a maximal matching. Every edge of the graph touches a matched vertex
    (maximality), and any cover must pick ≥1 endpoint per matched edge, so
    |cover| = 2|M| ≤ 2·OPT. ``matched_round`` carries provenance — the
    elimination round whose matched edge put the vertex into the cover
    (each vertex is matched at most once, so the MIN is exact)."""
    p = result.pairs
    return (
        p.select(F.col("a").alias("v"), "matched_round")
        .union(p.select(F.col("b").alias("v"), "matched_round"))
        .groupBy("v")
        .agg(F.min("matched_round").alias("matched_round"))
    )


def maximal_matching(edges: DataFrame, max_rounds: int = 64) -> MatchingResult:
    """Greedy parallel maximal matching over the undirected simple graph
    of ``edges`` (direction and multiplicity ignored; self-loops dropped).
    Deterministic: same edge set ⇒ same matching, any partitioning."""
    s, d = F.col("src").cast("long"), F.col("dst").cast("long")
    alive = (
        edges.select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .withColumn("p", edge_priority(F.col("a"), F.col("b")))
        .persist()
    )
    spark = edges.sparkSession
    matched = spark.createDataFrame([], "a long, b long, matched_round int")
    rounds = 0
    while not alive.isEmpty():
        if rounds >= max_rounds:
            raise RuntimeError(f"matching did not finish in {max_rounds} rounds")
        rounds += 1
        k = F.struct("p", "a", "b").alias("k")
        inc = alive.select(F.col("a").alias("v"), k).union(
            alive.select(F.col("b").alias("v"), k)
        )
        vmin = inc.groupBy("v").agg(F.min("k").alias("k"))
        # winner ⇔ the edge IS both endpoints' minimum incident edge
        win = (
            alive.join(
                vmin.select(F.col("v").alias("a"), F.col("k").alias("ka")), "a"
            )
            .join(vmin.select(F.col("v").alias("b"), F.col("k").alias("kb")), "b")
            .filter(
                (F.struct("p", "a", "b") == F.col("ka"))
                & (F.struct("p", "a", "b") == F.col("kb"))
            )
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        matched = matched.union(
            win.select("a", "b", F.lit(rounds).cast("int").alias("matched_round"))
        ).localCheckpoint(eager=True)
        mv = win.select(F.col("a").alias("v")).union(win.select("b")).distinct()
        nxt = (
            alive.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b", "p")
            .localCheckpoint(eager=True)
        )
        alive.unpersist()
        alive = nxt.persist()
    alive.unpersist()
    return MatchingResult(matched, rounds)
