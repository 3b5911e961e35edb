"""Densest subgraph: the Bahmani-Kumar-Vassilvitskii iterative peel
(VLDB'12), the MapReduce-native 2(1+eps)-approximation of Charikar's
greedy.

Web use: the densest subgraph of a link graph is its tightest link
community — the canonical link-farm / mutual-admiration-society
detector (far denser than any organic topic cluster), and the seed for
spam-mass style demotion.

Algorithm (undirected simple graph, density rho = |E|/|V| of the
induced subgraph): each round removes EVERY vertex whose degree is at
most 2(1+eps)*rho of the current survivor graph, recording the round's
(|V|, |E|); the answer is the round with the best density. Survivors
that lose all their edges are dropped immediately (an isolated vertex
can never belong to a densest subgraph; dropping it only raises the
round's density). Since vertices above the threshold number fewer than
2E/(2(1+eps)rho) = V/(1+eps), each round removes at least an
eps/(1+eps) fraction — O(log V) rounds — and the best round is a
2(1+eps)-approximation (the paper's Theorem 1 argument is unaffected
by the isolated-vertex drop). Default eps = 1/4: threshold
2(1+eps)rho = (5/2)E/V, factor 2.5, ~48 rounds at 10^10 vertices.

Cross-engine exactness: the peel test is 2*deg*V <= 5*E and the
best-round argmax compares E_a * V_b > E_b * V_a — ALL integer
cross-multiplication, no float densities anywhere; ties go to the
earliest (largest) round. The DuckDB oracle replays the identical peel
in a recursive CTE and checks EVERY round's (|V|, |E|).

Scale shape per round: one degree aggregate over surviving edges + two
semi-joins to drop removed endpoints — the same E-sized hash-shuffle
envelope as a k-core wave (kcore.py), O(log V) times; per-round state
is the edge set itself, lineage cut by localCheckpoint. The (V, E)
scalars are the only driver traffic.

Reference semantics scope: didasy/tldr has no subgraph-mining surface;
this extends the link-graph layer (k-core, k-truss, communities).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class DensestResult:
    vertices: DataFrame  # (vertex) — the best-density round's vertex set
    rounds: list  # [(round, n_vertices, n_edges)] incl. round 0
    best_round: int


def _endpoints(e: DataFrame) -> DataFrame:
    return e.select(F.col("a").alias("v")).union(e.select(F.col("b").alias("v")))


def densest_subgraph(
    edges: DataFrame,
    thr_num: int = 5,
    thr_den: int = 2,
    max_rounds: int = 64,
) -> DensestResult:
    """Peel with survivor rule ``thr_den * deg * V > thr_num * E``
    (default 5/2 = 2(1+eps) at eps=1/4) until the graph is empty."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur, it = und, 0
    n_e = cur.count()
    n_v = _endpoints(cur).distinct().count()
    rounds = [(0, n_v, n_e)]
    best = (cur, n_v, n_e, 0)
    while n_v > 0 and it < max_rounds:
        it += 1
        deg = _endpoints(cur).groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(
            F.lit(thr_den) * F.col("deg") * F.lit(n_v) > F.lit(thr_num * n_e)
        ).select("v")
        cur = (
            cur.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_e = cur.count()
        n_v = _endpoints(cur).distinct().count()
        if n_v == 0:
            break
        rounds.append((it, n_v, n_e))
        # strictly better only: ties keep the EARLIER (larger) round
        if n_e * best[1] > best[2] * n_v:
            best = (cur, n_v, n_e, it)
    b_edges, _, _, b_it = best
    return DensestResult(
        vertices=_endpoints(b_edges).distinct().select(F.col("v").alias("vertex")),
        rounds=rounds,
        best_round=b_it,
    )
