"""Butterfly/caterpillar counts vs a brute-force Python mirror."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from tldr_spark.operators.butterfly import butterfly_stats


def _py_stats(edges):
    es = set(edges)
    items = defaultdict(set)
    users = defaultdict(set)
    for u, i in es:
        items[i].add(u)
        users[u].add(i)
    bf = 0
    for u1, u2 in combinations(sorted(users), 2):
        c = len(users[u1] & users[u2])
        bf += c * (c - 1) // 2
    cat = sum(
        (len(users[u]) - 1) * (len(items[i]) - 1) for u, i in es
    )
    return len(es), bf, cat


def test_matches_brute(spark):
    edges = []
    for u in range(20):
        for k in range(1 + (u * u) % 4):
            edges.append((u, (u * 7 + k * 3 + 1) % 12))
    edges += edges[:9]  # duplicates collapse
    df = spark.createDataFrame(edges, "u long, i long")
    got = butterfly_stats(df).collect()[0]
    n, bf, cat = _py_stats(edges)
    assert (got["n_edges"], got["butterflies"], got["caterpillars"]) == (n, bf, cat)
    if cat:
        assert abs(got["bcc"] - 4.0 * bf / cat) < 1e-12


def test_single_biclique(spark):
    # K_{2,2} = exactly one butterfly; caterpillars = 4 edges * 1 * 1
    df = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0), (1, 1)], "u long, i long"
    )
    got = butterfly_stats(df).collect()[0]
    assert (got["butterflies"], got["caterpillars"]) == (1, 4)
    assert got["bcc"] == 1.0


def test_hub_prune_reports(spark):
    star = [(u, 99) for u in range(10)] + [(0, 1), (1, 1)]
    df = spark.createDataFrame(star, "u long, i long")
    got = butterfly_stats(df, max_degree=5).collect()[0]
    assert got["n_pruned_hubs"] == 1  # item 99 excluded from wedges
    # remaining wedge source: item 1 shared by users 0,1 -> co=1 -> 0 bf
    assert got["butterflies"] == 0
