"""Probe-sampled Brandes betweenness vs a pure-Python Brandes oracle."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import pytest

from tldr_spark.operators.betweenness import betweenness_centrality


def _brandes(edges, sources):
    adj = defaultdict(list)
    verts = set()
    for u, v in edges:
        adj[u].append(v)
        verts.update((u, v))
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: bc[v] for v in verts}


def _rand_edges(seed, n, m):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def test_exact_betweenness_all_probes(spark):
    """Probes = every vertex -> the sampled estimator IS exact Brandes."""
    for seed in (3, 17):
        edges = [(u, v) for u, v in _rand_edges(seed, 14, 40) if u != v]
        verts = sorted({x for p in edges for x in p})
        e = spark.createDataFrame(edges, "src long, dst long")
        probes = spark.createDataFrame([(v,) for v in verts], "id long")
        res = betweenness_centrality(e, probes)
        got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
        want = _brandes(edges, verts)
        for v in verts:
            assert got.get(v, 0.0) == pytest.approx(want[v], abs=1e-9), (seed, v)


def test_sampled_betweenness_matches_oracle_on_sample(spark):
    edges = [(u, v) for u, v in _rand_edges(29, 20, 70) if u != v]
    sources = [0, 3, 7, 11]
    e = spark.createDataFrame(edges, "src long, dst long")
    probes = spark.createDataFrame([(s,) for s in sources], "id long")
    res = betweenness_centrality(e, probes)
    got = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    want = _brandes(edges, [s for s in sources if any(s in p for p in edges)])
    for v, x in want.items():
        assert got.get(v, 0.0) == pytest.approx(x, abs=1e-9), v


def test_betweenness_path_graph(spark):
    # directed path 0->1->2->3: interior vertices broker everything
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    probes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    got = {r["id"]: r["betweenness"] for r in betweenness_centrality(e, probes).scores.collect()}
    # s=0: δ(1)=2 (brokers 2 and 3), δ(2)=1; s=1: δ(2)=1 -> bc = {1:2, 2:2}
    assert got == {1: 2.0, 2: 2.0}
