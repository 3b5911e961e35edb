"""Link-prediction dataset builder vs a pure-Python mirror."""

from __future__ import annotations

from collections import defaultdict

from tldr_spark.operators.linkpred import _M1, _M2, link_prediction_dataset


def _py_dataset(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    verts = sorted({v for e in und for v in e})
    pos = {v: i + 1 for i, v in enumerate(verts)}  # rank by id asc
    by_pos = {i + 1: v for i, v in enumerate(verts)}
    n = len(verts)
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    cand = set()
    for v in verts:
        for j in range(1, k + 1):
            nb = by_pos[((pos[v] - 1) * _M1 + j * _M2) % n + 1]
            if nb != v:
                p = (min(v, nb), max(v, nb))
                if p not in und:
                    cand.add(p)
    out = {}
    for (a, b) in und | cand:
        out[(a, b)] = (
            1 if (a, b) in und else 0,
            len(adj[a] & adj[b]),
            len(adj[a]),
            len(adj[b]),
        )
    return out


def test_matches_python(spark):
    edges = []
    for s in range(40):
        for t in range(1 + (s * s) % 4):
            edges.append((s, (s * 17 + t * 7 + 1) % 40))
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["label"], r["cn"], r["deg_a"], r["deg_b"])
        for r in link_prediction_dataset(df, neg_per_vertex=2).collect()
    }
    want = _py_dataset(edges, 2)
    assert got == want
    labels = [v[0] for v in got.values()]
    assert 0 in labels and 1 in labels


def test_negatives_are_true_non_edges(spark):
    edges = [(a, b) for a in range(8) for b in range(8) if a < b]  # K8: no non-edges
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    rows = link_prediction_dataset(df, neg_per_vertex=3).collect()
    assert all(r["label"] == 1 for r in rows)  # complete graph: zero negatives
    assert len(rows) == len(edges)
