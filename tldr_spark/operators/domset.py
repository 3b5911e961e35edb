"""Parallel greedy dominating set — local-max coverage elimination.

Crawl-seed selection as an operator: pick a small vertex set whose
closed neighborhoods cover the whole graph (every page is a seed or
links-adjacent to one). Each synchronous round, every vertex scores its
COVERAGE c(v) = |closed neighborhood ∩ still-uncovered|, and v enters
the dominating set iff (c(v), −v) is the strict lexicographic maximum
over its own closed neighborhood — the same local-winner rule family as
Preis matching (operators/matching.py, local-min edge) and Luby MIS
(operators/mis.py), pointed at coverage instead of priority. Winners'
closed neighborhoods leave the uncovered pool; repeat until it is
empty. The global coverage maximum is always a local maximum, so every
round makes progress; in practice rounds are few (coverage collapses
geometrically, the classic greedy ln-n regime).

Determinism: coverage counts are integers and the tie-break (−v) makes
the local order total, so the set and each member's ``round_added`` are
partition-independent and shared exactly with the unrolled DuckDB
oracle and the python test mirror.

Per-round shape at scale: ONE edge join against the V-row uncovered
frame + a per-vertex count (coverage), one neighborhood max-struct
aggregate (local-max test), and one semi/anti-join pair to shrink the
uncovered pool. All equi-joins; state only ever shrinks.

Reference parity note: the reference (didasy/tldr) has no covering
operator; this rounds out the symmetry-breaking family (MIS, coloring,
matching) with the coverage-greedy member.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class DomSetResult:
    members: DataFrame  # (id: long, round_added: int)
    rounds: int


def dominating_set(edges: DataFrame, max_rounds: int = 64) -> DomSetResult:
    """Greedy dominating set of the undirected simple graph of ``edges``
    (direction/multiplicity ignored, self-loops dropped; isolated
    vertices — none here, vertices exist only via edges — would dominate
    themselves)."""
    e = (
        edges.select(
            F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    verts = sym.select(F.col("u").alias("id")).distinct()
    # closed neighborhood as an edge list: N[v] = {v} ∪ N(v)
    closed = sym.select(F.col("u").alias("id"), F.col("v").alias("nb")).union(
        verts.select("id", F.col("id").alias("nb"))
    ).persist()
    spark = edges.sparkSession
    members = spark.createDataFrame([], "id long, round_added int")
    unc = verts.localCheckpoint(eager=True)  # (id) — still uncovered
    rounds = 0
    while not unc.isEmpty():
        if rounds >= max_rounds:
            raise RuntimeError(f"dominating_set did not finish in {max_rounds} rounds")
        rounds += 1
        cov = (
            closed.join(unc.withColumnRenamed("id", "nb"), "nb")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("c"))
        )  # only vertices still covering something appear
        key = F.struct(F.col("c"), (-F.col("id")).alias("nid"))
        # local-max over the closed neighborhood, among scoring vertices
        nbest = (
            closed.join(cov.withColumnRenamed("id", "nb").withColumnRenamed("c", "cn"), "nb")
            .groupBy("id")
            .agg(F.max(F.struct(F.col("cn").alias("c"), (-F.col("nb")).alias("nid"))).alias("bk"))
        )
        win = (
            cov.join(nbest, "id")
            .filter(key == F.col("bk"))
            .select("id")
            .localCheckpoint(eager=True)
        )
        members = members.union(
            win.select("id", F.lit(rounds).cast("int").alias("round_added"))
        ).localCheckpoint(eager=True)
        covered = (
            closed.join(win, "id").select(F.col("nb").alias("id")).distinct()
        )
        unc = unc.join(covered, "id", "left_anti").localCheckpoint(eager=True)
    closed.unpersist()
    return DomSetResult(members, rounds)
