"""Bond-percolation profile pinned against a pure-python union-find oracle
running the IDENTICAL deterministic keep selector, plus the structural
invariants that make the output a percolation curve (nested kept sets)."""

from __future__ import annotations

from tldr_spark.operators.percolation import bond_keep, bond_percolation_profile

_M, _A, _B = 100003, 31, 17


def _keep(s: int, d: int, p: int) -> bool:
    return ((s % _M) * _A + (d % _M) * _B) % 100 < p


def _profile_py(edges, p):
    kept = [(s, d) for s, d in edges if _keep(s, d, p)]
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in kept:
        for v in (s, d):
            parent.setdefault(v, v)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    sizes: dict[int, int] = {}
    for v in parent:
        r = find(v)
        sizes[r] = sizes.get(r, 0) + 1
    return (
        len(parent),
        len(sizes),
        max(sizes.values()) if sizes else 0,
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


def test_profile_matches_union_find_oracle(spark):
    edges = _rand_edges(7, 40, 120)
    df = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    got = {
        r["keep_pct"]: (r["n_vertices"], r["n_components"], r["giant_size"])
        for r in bond_percolation_profile(df, (20, 50, 80, 100)).collect()
    }
    for p in (20, 50, 80, 100):
        assert got[p] == _profile_py(edges, p), f"p={p}"


def test_levels_are_nested_and_p100_is_identity(spark):
    edges = _rand_edges(11, 60, 200)
    df = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    # nested kept sets: every edge kept at p is kept at p' > p
    for s, d in edges:
        for lo, hi in ((10, 40), (40, 70), (70, 100)):
            if _keep(s, d, lo):
                assert _keep(s, d, hi)
    prof = {
        r["keep_pct"]: r for r in bond_percolation_profile(df, (10, 55, 100)).collect()
    }
    # monotone vertex coverage, and p=100 keeps the whole graph
    assert prof[10]["n_vertices"] <= prof[55]["n_vertices"] <= prof[100]["n_vertices"]
    verts = {v for e in edges for v in e}
    assert prof[100]["n_vertices"] == len(verts)
    assert prof[100][ "giant_size"] <= len(verts)


def test_zero_keep_level_yields_empty_row(spark):
    df = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    (row,) = bond_percolation_profile(df, (0,)).collect()
    assert (row["n_vertices"], row["n_components"], row["giant_size"]) == (0, 0, 0)


def test_bond_keep_is_pushable_predicate(spark):
    # the selector is a deterministic column expression — no UDF in the plan
    df = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    plan = df.filter(bond_keep(50))._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
