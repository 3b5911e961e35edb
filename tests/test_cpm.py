"""k=3 clique percolation: brute-force python oracle (triangle
adjacency by shared edge, union-find), shared-edge merge vs
shared-vertex split, overlapping membership, triangle-free silence,
label determinism (min packed edge id)."""

from __future__ import annotations

import itertools

from tldr_spark.operators.cpm import clique_percolation3

M = 1 << 32


def _py_cpm(edge_list):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = [
        (a, b, c)
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    ]
    # union-find over the 3 packed edge ids of each triangle
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b, c in tris:
        eab, eac, ebc = a * M + b, a * M + c, b * M + c
        union(eab, eac)
        union(eab, ebc)
    out = set()
    for a, b, c in tris:
        comp = find(a * M + b)
        out |= {(comp, a), (comp, b), (comp, c)}
    # normalize roots fully
    return {(find(comp), v) for comp, v in out}


def _got(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {(r.community, r.vertex) for r in clique_percolation3(df).collect()}


def test_two_triangles_sharing_edge_merge(spark):
    edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]
    got = _got(spark, edges)
    assert got == _py_cpm(edges)
    assert len({c for c, _ in got}) == 1
    assert {v for _, v in got} == {1, 2, 3, 4}


def test_shared_vertex_stays_split_and_overlaps(spark):
    # two triangles meeting only at vertex 3: distinct communities,
    # vertex 3 is a member of BOTH (the overlapping-membership point)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    got = _got(spark, edges)
    assert got == _py_cpm(edges)
    comms = {c for c, _ in got}
    assert len(comms) == 2
    assert sum(1 for c, v in got if v == 3) == 2


def test_triangle_free_graph_empty(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]  # 4-cycle, no triangles
    assert _got(spark, edges) == set()


def test_chain_of_triangles_percolates(spark):
    # triangle fan: (1,2,3),(2,3,4),(3,4,5) chained by shared edges
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
    got = _got(spark, edges)
    assert got == _py_cpm(edges)
    assert len({c for c, _ in got}) == 1


def test_label_is_min_packed_edge_id(spark):
    edges = [(7, 9), (9, 11), (7, 11)]
    got = _got(spark, edges)
    assert got == {(7 * M + 9, 7), (7 * M + 9, 9), (7 * M + 9, 11)}


def test_random_differential(spark):
    import random

    rng = random.Random(47)
    edges = list({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    edges = [e for e in edges if e[0] != e[1]]
    assert _got(spark, edges) == _py_cpm(edges)
