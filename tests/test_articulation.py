"""Cut-vertex probe tests against hand-computed and brute-force oracles."""

from __future__ import annotations

import random

import pytest

from tldr_spark.operators.bridges import articulation_probes


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _got(spark, edges, n_hubs=3):
    return {
        r["hub"]: (r["deg"], r["n_comp_base"], r["n_comp_removed"], r["is_articulation"])
        for r in articulation_probes(_df(spark, edges), n_hubs=n_hubs).collect()
    }


def _brute(edges, n_hubs):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def n_comp(skip=None):
        verts = [v for v in adj if v != skip]
        seen, n = set(), 0
        for v in verts:
            if v in seen:
                continue
            n += 1
            stack = [v]
            seen.add(v)
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y != skip and y not in seen:
                        seen.add(y)
                        stack.append(y)
        return n

    base = n_comp()
    hubs = sorted(adj, key=lambda v: (-len(adj[v]), v))[:n_hubs]
    return {
        h: (len(adj[h]), base, n_comp(h), n_comp(h) > base) for h in hubs
    }


def test_star_center_is_articulation(spark):
    edges = [(0, i) for i in range(1, 6)]
    got = _got(spark, edges)
    assert got == _brute(edges, 3)
    assert got[0][3] is True  # center splits the star
    assert got[1][3] is False and got[2][3] is False  # leaves do not


def test_cycle_has_no_articulation(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _got(spark, edges)
    assert got == _brute(edges, 3)
    assert not any(v[3] for v in got.values())


def test_barbell_bridge_vertex(spark):
    # two triangles joined through vertex 10: 10 is the cut vertex
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 10), (10, 3)]
    got = _got(spark, edges, n_hubs=7)
    assert got == _brute(edges, 7)
    assert got[10][3] is True  # the bridge vertex splits the barbell
    assert got[0][3] is True  # so does each triangle's attachment vertex
    assert got[1][3] is False  # plain triangle members do not


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_bruteforce(spark, seed):
    rnd = random.Random(seed)
    edges = [(rnd.randrange(25), rnd.randrange(25)) for _ in range(35)]
    edges = [e for e in edges if e[0] != e[1]]
    assert _got(spark, edges, n_hubs=4) == _brute(edges, 4)
