"""SCAN structural clustering vs a pure-Python mirror + role semantics."""

from __future__ import annotations

from collections import defaultdict

from tldr_spark.operators.scan import scan_clusters


def _py_scan(edges, e_num=7, e_den=10, mu=3):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}

    def eps_sim(a, b):
        cn = len(adj[a] & adj[b])
        return (cn + 2) ** 2 * e_den**2 >= e_num**2 * (len(adj[a]) + 1) * (
            len(adj[b]) + 1
        )

    eps = {e for e in und if eps_sim(*e)}
    eps_adj = defaultdict(set)
    for a, b in eps:
        eps_adj[a].add(b)
        eps_adj[b].add(a)
    cores = {v for v in adj if len(eps_adj[v]) + 1 >= mu}
    # clusters = CC over core-core eps edges, min-id labels
    cluster = {}
    for c in sorted(cores):
        if c in cluster:
            continue
        comp, stack = [], [c]
        seen = {c}
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in eps_adj[v]:
                if u in cores and u not in seen:
                    seen.add(u)
                    stack.append(u)
        m = min(comp)
        for v in comp:
            cluster[v] = m
    roles = {}
    for v in adj:
        if v in cores:
            roles[v] = ("core", cluster[v])
    for v in adj:
        if v in roles:
            continue
        adj_cores = [cluster[u] for u in eps_adj[v] if u in cores]
        if adj_cores:
            roles[v] = ("border", min(adj_cores))
    for v in adj:
        if v in roles:
            continue
        touched = {roles[u][1] for u in adj[v] if u in roles}
        roles[v] = ("hub" if len(touched) >= 2 else "outlier", None)
    return roles


def _graph():
    cl = lambda vs: [(a, b) for a in vs for b in vs if a < b]  # noqa: E731
    edges = cl(range(5)) + cl(range(10, 15))
    edges += [(20, 0), (20, 10)]   # broker between the two cliques
    edges += [(30, 31)]            # isolated pair
    return edges


def test_matches_python(spark):
    edges = _graph()
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    got = {r["vertex"]: (r["role"], r["cluster"]) for r in scan_clusters(df).collect()}
    want = _py_scan(edges)
    assert got == want


def test_roles_on_broker_graph(spark):
    edges = _graph()
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    got = {r["vertex"]: (r["role"], r["cluster"]) for r in scan_clusters(df).collect()}
    # the two cliques are distinct clusters of cores
    assert got[1] == ("core", 0) and got[11] == ("core", 10)
    # the broker touches both clusters but is similar to neither -> hub
    assert got[20] == ("hub", None)
    # the isolated pair is epsilon-similar but below mu -> outliers
    assert got[30][0] == "outlier" and got[31][0] == "outlier"
