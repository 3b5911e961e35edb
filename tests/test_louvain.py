"""Louvain phase-1 local moves + multilevel composition, pinned by a
brute-force max-modularity oracle on small graphs (every partition of the
vertex set enumerated in NumPy) and by direct modularity-gain checks."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from tldr_spark.operators.community import louvain, louvain_move_pass


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in edges],
        "src long, dst long, weight double",
    )


def _modularity(edges, labels):
    """Weighted Newman Q over the undirected reading (both orientations
    summed), same bookkeeping as the operator: m2 = 2m = sum of symmetrized
    weights, k_u its row sums."""
    sym = {}
    for s, d, w in edges:
        if s == d:
            continue
        sym[(s, d)] = sym.get((s, d), 0.0) + w
        sym[(d, s)] = sym.get((d, s), 0.0) + w
    m2 = sum(sym.values())
    k = {}
    for (u, v), w in sym.items():
        k[u] = k.get(u, 0.0) + w
    q = 0.0
    for (u, v), w in sym.items():
        if labels[u] == labels[v]:
            q += w / m2
    # (d_c/2m)^2 term per community
    comms = set(labels[u] for u in k)
    for c in comms:
        d_c = sum(k[u] for u in k if labels[u] == c)
        q -= (d_c / m2) ** 2
    return q


def _partitions(items):
    """All set partitions (Bell-number enumeration)."""
    if not items:
        yield []
        return
    first, rest = items[0], items[1:]
    for part in _partitions(rest):
        for i, block in enumerate(part):
            yield part[:i] + [block + [first]] + part[i + 1 :]
        yield part + [[first]]


def _best_q(edges, verts):
    best = -2.0
    for part in _partitions(list(verts)):
        labels = {}
        for i, block in enumerate(part):
            for v in block:
                labels[v] = i
        best = max(best, _modularity(edges, labels))
    return best


TWO_CLIQUES_BRIDGE = [
    (a, b, 1.0) for a, b in itertools.combinations(range(4), 2)
] + [
    (a, b, 1.0) for a, b in itertools.combinations(range(4, 8), 2)
] + [(3, 4, 1.0)]


def test_two_cliques_bridge_reaches_bruteforce_max_q(spark):
    res = louvain(_df(spark, TWO_CLIQUES_BRIDGE))
    labels = {r["id"]: r["community"] for r in res.labels.collect()}
    assert set(labels) == set(range(8))
    got_q = _modularity(TWO_CLIQUES_BRIDGE, labels)
    best = _best_q(TWO_CLIQUES_BRIDGE, range(8))
    assert got_q == pytest.approx(best, abs=1e-12)
    # and the partition is the two cliques
    assert len({labels[v] for v in range(4)}) == 1
    assert len({labels[v] for v in range(4, 8)}) == 1
    assert labels[0] != labels[7]


def test_improves_over_lpa_on_bridged_cliques(spark):
    """VERDICT r2 done-criterion: the modularity-optimizing pass beats the
    LPA labels on the two-clique + bridge graph."""
    from tldr_spark.operators.labelprop import label_propagation

    df = _df(spark, TWO_CLIQUES_BRIDGE)
    lpa = {
        r["id"]: r["label"]
        for r in label_propagation(df, max_rounds=4).labels.collect()
    }
    lv = {r["id"]: r["community"] for r in louvain(df).labels.collect()}
    assert _modularity(TWO_CLIQUES_BRIDGE, lv) >= _modularity(
        TWO_CLIQUES_BRIDGE, lpa
    ) - 1e-12


def test_single_move_follows_max_gain(spark):
    """Vertex 9 sits between community A {0,1} (edge weight 1 each) and
    community B {5,6} (weight 3 each): the weighted gain rule must pull it
    into B."""
    edges = [
        (0, 1, 10.0),
        (5, 6, 10.0),
        (9, 0, 1.0),
        (9, 1, 1.0),
        (9, 5, 3.0),
        (9, 6, 3.0),
    ]
    res = louvain(_df(spark, edges))
    labels = {r["id"]: r["community"] for r in res.labels.collect()}
    assert labels[9] == labels[5] == labels[6]
    assert labels[0] == labels[1] != labels[9]


def test_ring_of_cliques_multilevel(spark):
    """4 cliques of 5 joined in a ring — the canonical multilevel case:
    phase-1 collapses the cliques, the contracted pass keeps them apart."""
    edges = []
    for c in range(4):
        base = c * 5
        edges += [
            (base + a, base + b, 1.0)
            for a, b in itertools.combinations(range(5), 2)
        ]
        edges.append((base + 4, ((c + 1) % 4) * 5, 1.0))
    res = louvain(_df(spark, edges))
    labels = {r["id"]: r["community"] for r in res.labels.collect()}
    comms = {frozenset(v for v in labels if labels[v] == c) for c in set(labels.values())}
    want = {frozenset(range(c * 5, c * 5 + 5)) for c in range(4)}
    assert comms == want
    # labels normalize to the min member id
    assert set(labels.values()) == {0, 5, 10, 15}


def test_deterministic_across_runs_and_layouts(spark):
    df = _df(spark, TWO_CLIQUES_BRIDGE)
    a = sorted(map(tuple, louvain(df).labels.collect()))
    b = sorted(map(tuple, louvain(df.repartition(7)).labels.collect()))
    assert a == b


def test_move_pass_respects_given_assignments(spark):
    """Seeding the move pass with the final partition is a fixpoint: zero
    moves in either half-round of the first full parity cycle."""
    df = _df(spark, TWO_CLIQUES_BRIDGE)
    final = louvain(df).labels.select("id", F.col("community").alias("label"))
    res = louvain_move_pass(df, assignments=final)
    assert res.moved_last_round == 0 and res.rounds == 2
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    want = {r["id"]: r["label"] for r in final.collect()}
    assert got == want


def test_empty_and_loop_only_graphs(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    assert louvain(empty).labels.count() == 0
    loops = _df(spark, [(1, 1, 2.0), (2, 2, 1.0)])
    assert louvain(loops).labels.count() == 0  # no linked vertices
