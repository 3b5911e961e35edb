"""Densest-subgraph peel — python oracle + planted-core recovery."""

from __future__ import annotations

from itertools import combinations

from tldr_spark.operators.densest import densest_subgraph


def _peel_py(pairs, thr_num=5, thr_den=2):
    cur = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    rounds, it = [], 0
    best = None
    while cur:
        verts = {v for e in cur for v in e}
        V, E = len(verts), len(cur)
        rounds.append((it, V, E))
        if best is None or E * best[1] > best[2] * V:
            best = (it, V, E, verts)
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v in verts if thr_den * deg[v] * V > thr_num * E}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        it += 1
    return rounds, best


def _run(spark, pairs):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )
    res = densest_subgraph(df)
    return res.rounds, res.best_round, {r.vertex for r in res.vertices.collect()}


def test_planted_clique_recovered(spark):
    # 12-clique (rho = 5.5) + a long sparse path hanging off it (rho ~ 1)
    clique = list(combinations(range(12), 2))
    path = [(11 + i, 12 + i) for i in range(60)]
    rounds, best_it, verts = _run(spark, clique + path)
    py_rounds, py_best = _peel_py(clique + path)
    assert rounds == py_rounds
    assert best_it == py_best[0]
    assert verts == py_best[3]
    assert verts == set(range(12))  # exactly the planted clique


def test_uniform_graph_best_is_round_zero(spark):
    ring = [(i, (i + 1) % 30) for i in range(30)]
    rounds, best_it, verts = _run(spark, ring)
    assert best_it == 0 and verts == set(range(30))
    assert rounds == _peel_py(ring)[0]


def test_multi_edge_and_direction_collapse(spark):
    # duplicates and reversed edges must collapse to one undirected edge
    pairs = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0)]
    rounds, _, verts = _run(spark, pairs)
    assert rounds[0] == (0, 3, 3)
    assert verts == {0, 1, 2}


def test_random_graph_full_trajectory_differential(spark):
    pairs = [(v, (v * 37 + 11) % 80) for v in range(80)]
    pairs += [(v, (v * 13 + 5) % 80) for v in range(80)]
    pairs += list(combinations(range(70, 78), 2))  # moderately dense pocket
    pairs = [p for p in pairs if p[0] != p[1]]
    rounds, best_it, verts = _run(spark, pairs)
    py_rounds, py_best = _peel_py(pairs)
    assert rounds == py_rounds
    assert (best_it, verts) == (py_best[0], py_best[3])
