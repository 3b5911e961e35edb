"""Property-based parity: random graphs → distributed operators must match
pure-Python/NumPy oracles exactly (integers) or to 1e-9 (scores).

The reference has no randomized testing (SURVEY.md §5.1); these close the
gap where fixed fixtures can't — degenerate shapes (empty, self-loops,
multi-edges, disconnected pieces) arrive by generation, not enumeration.
Example counts are small: each example drives real Spark jobs.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, edges):
    from tldr_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df).assignments.collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent[find(s)] = find(d)
    # component label = min vertex id in the component
    groups: dict[int, list[int]] = {}
    for v in parent:
        groups.setdefault(find(v), []).append(v)
    exp = {v: min(vs) for vs in groups.values() for v in vs}
    assert got == exp


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_triangles_match_brute(spark, edges):
    from itertools import combinations

    from tldr_spark.operators.triangles import triangle_count

    df = spark.createDataFrame(edges, "src long, dst long")
    res = triangle_count(df)
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    verts = sorted({v for p in und for v in p})
    exp = sum(
        1
        for a, b, c in combinations(verts, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    assert res.total == exp


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10), st.integers(1, 4)),
        min_size=1,
        max_size=40,
    )
)
def test_pagerank_matches_numpy(spark, edges):
    from tldr_spark.operators.pagerank import pagerank

    ed = [(s, d, float(w)) for s, d, w in edges if s != d]
    if not ed:
        return
    df = spark.createDataFrame(ed, "src long, dst long, weight double")
    res = pagerank(df, tolerance=-1.0, max_iter=15)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}

    # §2.7 oracle: duplicate edges sum, normalize, dangling mass, teleport
    w: dict[tuple[int, int], float] = {}
    for s, d, wt in ed:
        w[(s, d)] = w.get((s, d), 0.0) + wt
    verts = sorted({v for e in w for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    M = np.zeros((n, n))
    for (s, d), wt in w.items():
        M[idx[s], idx[d]] = wt
    out = M.sum(axis=1)
    dangling = out == 0
    Mn = np.zeros_like(M)
    np.divide(M, out[:, None], out=Mn, where=out[:, None] > 0)
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        leak = r[dangling].sum()
        r = 0.85 * (Mn.T @ r) + (0.15 + 0.85 * leak) / n
    assert set(got) == set(verts)
    for v in verts:
        assert abs(got[v] - r[idx[v]]) < 1e-9
