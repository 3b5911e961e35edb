"""Weighted multi-source shortest paths vs a Dijkstra oracle."""

from __future__ import annotations

import heapq

import numpy as np


def _dijkstra(edges, seeds):
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, {})
        cur = adj[s].get(d)
        if cur is None or w < cur:
            adj[s][d] = w
    dist = {s: 0.0 for s in seeds}
    pq = [(0.0, s) for s in seeds]
    heapq.heapify(pq)
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, {}).items():
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_matches_dijkstra(spark):
    from tldr_spark.operators.sssp import sssp

    rng = np.random.default_rng(41)
    edges = [
        (int(a), int(b), float(w))
        for a, b, w in zip(
            rng.integers(0, 35, 120), rng.integers(0, 35, 120), rng.integers(1, 9, 120)
        )
        if a != b
    ]
    edges.append((0, 1, 3.0))
    edges.append((0, 1, 1.0))  # parallel edge: min weight must win
    seeds = [0, 20]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    res = sssp(e, s)
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    assert res.converged
    assert got == _dijkstra(edges, seeds)


def test_sssp_shorter_path_through_more_hops(spark):
    from tldr_spark.operators.sssp import sssp

    # direct edge cost 10 vs 3-hop path cost 3: relaxation must keep going
    edges = [(0, 9, 10.0), (0, 1, 1.0), (1, 2, 1.0), (2, 9, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    s = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in sssp(e, s).distances.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 9: 3.0}
