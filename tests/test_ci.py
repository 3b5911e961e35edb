"""Collective Influence CI_2 pinned against a pure-python BFS oracle
(exact distance-2 frontier over the undirected simple graph), plus the
closed-form star and hub-of-leaves cases that motivate the metric."""

from __future__ import annotations

from tldr_spark.operators.ci import collective_influence


def _ci2_py(edges):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for v, nbrs in adj.items():
        d2 = set()
        for m in nbrs:
            d2 |= adj[m]
        d2 -= nbrs | {v}
        if d2:
            out[v] = (len(nbrs), (len(nbrs) - 1) * sum(len(adj[w]) - 1 for w in d2))
    return out


def _check(spark, edges, top_k=50):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [(r["vertex"], r["deg"], r["ci"]) for r in
           collective_influence(df, top_k=top_k).collect()]
    want = sorted(
        ((v, d, c) for v, (d, c) in _ci2_py(edges).items()),
        key=lambda t: (-t[2], t[0]),
    )[:top_k]
    assert got == want


def test_matches_python_oracle(spark):
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 1),   # 5-cycle
        (1, 6), (6, 7), (7, 8),                   # tail
        (3, 9), (9, 10), (9, 11), (9, 12),        # broom
        (2, 2),                                   # self-loop dropped
        (4, 3),                                   # reverse duplicate
    ]
    _check(spark, edges)


def test_hub_of_leaves_scores_zero_frontier(spark):
    # pure star: every distance-2 frontier member (leaf-to-leaf) has deg 1
    # -> fsum = 0 for leaves' hub view; the hub itself has NO distance-2
    # vertices so it does not appear at all
    star = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(star, "src long, dst long")
    rows = collective_influence(df, top_k=10).collect()
    assert all(r["ci"] == 0 for r in rows)       # leaves: (1-1)*fsum = 0
    assert 0 not in {r["vertex"] for r in rows}  # hub absent (empty frontier)


def test_two_hub_bridge_beats_degree(spark):
    # two stars joined by a bridge: bridge endpoints see the OTHER hub's
    # leaves at distance 2 -> CI ranks them above what raw degree says
    edges = [(0, i) for i in range(1, 6)] + [(10, i) for i in range(11, 16)] + [(0, 10)]
    _check(spark, edges)
