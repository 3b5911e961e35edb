"""Forman-Ricci edge curvature vs a brute mirror + sign semantics."""

from __future__ import annotations

from collections import defaultdict

from tldr_spark.operators.linksim import forman_curvature


def _py(edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for a, b in und:
        t = len(adj[a] & adj[b])
        out[(a, b)] = (t, 4 - len(adj[a]) - len(adj[b]) + 3 * t)
    return out


def test_matches_brute_and_signs(spark):
    cl = lambda vs: [(x, y) for x in vs for y in vs if x < y]  # noqa: E731
    edges = cl(range(5)) + cl(range(10, 15)) + [(0, 10)]  # barbell
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    got = {(r["a"], r["b"]): (r["support"], r["curvature"])
           for r in forman_curvature(df).collect()}
    assert got == _py(edges)
    # the bridge is the most negative edge; intra-clique edges the most positive
    bridge = got[(0, 10)][1]
    assert bridge == min(c for _, c in got.values())
    assert got[(1, 2)][1] == max(c for _, c in got.values())
