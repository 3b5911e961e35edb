"""Bow-tie decomposition (Broder WWW 2000) — correctness pins.

Oracle: an independent pure-Python implementation built from Kosaraju SCC
plus set-based reachability, following the paper's region definitions
directly (not the engine's F/B set identities), so a definitional slip in
either side breaks the differential test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tldr_spark.operators.bowtie import REGIONS, bow_tie, bow_tie_census


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges], "src long, dst long, weight double"
    )


def _rand_edges(seed: int, n: int, m: int):
    edges = set()
    x = seed
    while len(edges) < m:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        s, d = (x >> 8) % n, (x >> 40) % n
        if s != d:
            edges.add((int(s), int(d)))
    return sorted(edges)


def _bowtie_py(edges):
    """Region per vertex by the paper's definitions, via brute reachability."""
    edges = {(s, d) for s, d in edges if s != d}
    verts = sorted({v for e in edges for v in e})
    if not verts:
        return {}
    fwd_adj: dict[int, set[int]] = {v: set() for v in verts}
    bwd_adj: dict[int, set[int]] = {v: set() for v in verts}
    for s, d in edges:
        fwd_adj[s].add(d)
        bwd_adj[d].add(s)

    def reach(seeds, adj):
        seen, stack = set(seeds), list(seeds)
        while stack:
            v = stack.pop()
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        return seen

    # SCCs: mutual reachability (brute force is fine at test scale)
    fwd_sets = {v: reach({v}, fwd_adj) for v in verts}
    comp = {}
    for v in verts:
        comp[v] = min(u for u in fwd_sets[v] if v in fwd_sets[u])
    sizes: dict[int, int] = {}
    for v in verts:
        sizes[comp[v]] = sizes.get(comp[v], 0) + 1
    core_id = max(sizes, key=lambda c: (sizes[c], -c))
    core = {v for v in verts if comp[v] == core_id}

    f = reach(core, fwd_adj)
    b = reach(core, bwd_adj)
    out_, in_ = f - b, b - f
    fi = reach(in_, fwd_adj) - (f | b) if in_ else set()
    bo = reach(out_, bwd_adj) - (f | b) if out_ else set()
    regions = {}
    for v in verts:
        if v in core:
            regions[v] = "CORE"
        elif v in in_:
            regions[v] = "IN"
        elif v in out_:
            regions[v] = "OUT"
        elif v in fi and v in bo:
            regions[v] = "TUBE"
        elif v in fi:
            regions[v] = "TENDRIL_IN"
        elif v in bo:
            regions[v] = "TENDRIL_OUT"
        else:
            regions[v] = "DISCONNECTED"
    return regions


TEXTBOOK = [
    (1, 2), (2, 3), (3, 1),          # CORE cycle {1,2,3}
    (0, 1),                          # IN: 0
    (3, 4),                          # OUT: 4
    (0, 5),                          # TENDRIL_IN: 5
    (6, 4),                          # TENDRIL_OUT: 6
    (0, 7), (7, 4),                  # TUBE: 7
    (8, 9),                          # DISCONNECTED: 8, 9
]


def test_textbook_regions(spark):
    res = bow_tie(_df(spark, TEXTBOOK))
    got = {r["id"]: r["region"] for r in res.assignments.collect()}
    assert got == {
        0: "IN", 1: "CORE", 2: "CORE", 3: "CORE", 4: "OUT",
        5: "TENDRIL_IN", 6: "TENDRIL_OUT", 7: "TUBE",
        8: "DISCONNECTED", 9: "DISCONNECTED",
    }
    assert res.core_component == 1
    assert res.core_size == 3
    assert got == _bowtie_py(TEXTBOOK)


def test_census_stable_schema(spark):
    rows = bow_tie_census(_df(spark, TEXTBOOK)).collect()
    got = {r["region"]: r["n_vertices"] for r in rows}
    assert set(got) == set(REGIONS)
    assert got["CORE"] == 3 and got["TUBE"] == 1 and got["DISCONNECTED"] == 2
    assert sum(got.values()) == 10


def test_random_differential(spark):
    for seed, n, m in [(7, 20, 40), (11, 30, 45), (23, 40, 60), (41, 25, 90)]:
        edges = _rand_edges(seed, n, m)
        got = {
            r["id"]: r["region"]
            for r in bow_tie(_df(spark, edges)).assignments.collect()
        }
        assert got == _bowtie_py(edges), f"seed={seed}"


def test_reuses_assignments(spark):
    from tldr_spark.operators.scc import strongly_connected_components

    df = _df(spark, TEXTBOOK)
    lab = strongly_connected_components(df).assignments
    res = bow_tie(df, assignments=lab)
    assert res.core_size == 3
    assert res.assignments.count() == 10


def test_all_core(spark):
    res = bow_tie(_df(spark, [(0, 1), (1, 2), (2, 0)]))
    assert {r["region"] for r in res.assignments.collect()} == {"CORE"}


def test_empty_graph(spark):
    res = bow_tie(_df(spark, []))
    assert res.assignments.count() == 0
    assert res.core_size == 0
    census = bow_tie_census(_df(spark, []))
    assert census.count() == len(REGIONS)
    assert census.agg(F.sum("n_vertices")).first()[0] == 0
