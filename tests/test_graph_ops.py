"""CC / LPA / triangle operators vs brute-force Python oracles."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from tldr_spark.operators.components import connected_components
from tldr_spark.operators.labelprop import label_propagation
from tldr_spark.operators.triangles import triangle_count


def _edges_df(spark, edges):
    return spark.createDataFrame([(int(a), int(b)) for a, b in edges], "src long, dst long")


def _cc_oracle(edges, vertices=None):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    for v in vertices or []:
        find(v)
    return {v: find(v) for v in parent}


def _tri_oracle(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({v for e in und for v in e})
    adj = {v: set() for v in verts}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return sum(
        1 for a, b, c in itertools.combinations(verts, 3) if b in adj[a] and c in adj[a] and c in adj[b]
    )


GRAPHS = {
    "two_cliques_k3": [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)],
    "bridged_cliques": [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)],
    "path": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "star_hub": [(0, i) for i in range(1, 30)],
    "self_loops_dups": [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)],
}


def _random_graph(seed, n=40, m=80):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_matches_union_find(spark, name):
    edges = GRAPHS[name]
    # both paths: default (bounded union-find finisher) and the
    # distributed star-contraction (local_finish_edges=0 disables)
    for lf in (1_000_000, 0):
        res = connected_components(_edges_df(spark, edges), local_finish_edges=lf)
        got = {r["id"]: r["component"] for r in res.assignments.collect()}
        assert got == _cc_oracle(edges), lf


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_random_graphs(spark, seed):
    edges = _random_graph(seed)
    for lf in (1_000_000, 0):
        res = connected_components(_edges_df(spark, edges), local_finish_edges=lf)
        got = {r["id"]: r["component"] for r in res.assignments.collect()}
        assert got == _cc_oracle([e for e in edges if e[0] != e[1]]), lf


def test_cc_isolated_vertices_with_vertex_table(spark):
    edges = [(0, 1)]
    verts = spark.createDataFrame([(0,), (1,), (5,)], "id long")
    res = connected_components(_edges_df(spark, edges), vertices=verts)
    got = {r["id"]: r["component"] for r in res.assignments.collect()}
    assert got == {0: 0, 1: 0, 5: 5}


def test_cc_log_rounds_on_long_path(spark):
    n = 64
    edges = [(i, i + 1) for i in range(n)]
    res = connected_components(_edges_df(spark, edges))
    got = {r["id"]: r["component"] for r in res.assignments.collect()}
    assert set(got.values()) == {0} and len(got) == n + 1
    # small/large-star converges in O(log n), far below diameter
    assert res.rounds <= 12


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_triangles_match_bruteforce(spark, name):
    edges = GRAPHS[name]
    res = triangle_count(_edges_df(spark, edges))
    assert res.total == _tri_oracle(edges)


@pytest.mark.parametrize("seed", [7, 8])
def test_triangles_random_and_orientations_agree(spark, seed):
    edges = _random_graph(seed, n=25, m=90)
    by_deg = triangle_count(_edges_df(spark, edges), by_degree=True)
    by_id = triangle_count(_edges_df(spark, edges), by_degree=False)
    assert by_deg.total == by_id.total == _tri_oracle(edges)


def test_triangles_per_vertex(spark):
    res = triangle_count(_edges_df(spark, GRAPHS["bridged_cliques"]))
    per_v = {r["id"]: r["triangles"] for r in res.per_vertex.collect()}
    assert per_v == {0: 1, 1: 1, 2: 1, 10: 1, 11: 1, 12: 1}


def test_lpa_two_cliques(spark):
    res = label_propagation(_edges_df(spark, GRAPHS["two_cliques_k3"]), max_rounds=10)
    labels = {r["id"]: r["label"] for r in res.labels.collect()}
    # deterministic min-label tie-break: each K3 collapses to its min id
    assert len({labels[0], labels[1], labels[2]}) == 1
    assert len({labels[10], labels[11], labels[12]}) == 1
    assert labels[0] != labels[10]


def test_lpa_deterministic(spark):
    e = _edges_df(spark, _random_graph(5, n=30, m=60))
    l1 = {r["id"]: r["label"] for r in label_propagation(e, max_rounds=5).labels.collect()}
    l2 = {r["id"]: r["label"] for r in label_propagation(e, max_rounds=5).labels.collect()}
    assert l1 == l2
