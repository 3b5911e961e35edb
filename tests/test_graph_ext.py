"""Extended link-graph operators: BFS distances, personalized PageRank,
HITS, k-core — each vs a brute-force / NumPy oracle on deterministic
synthetic graphs."""

from __future__ import annotations

import numpy as np


def _rand_graph(seed: int, n: int, m: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    return [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    ]


# --- BFS ----------------------------------------------------------------

def _bfs_oracle(edges, seeds, directed=True):
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        if not directed:
            adj[d].add(s)
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


def test_bfs_matches_oracle(spark):
    from tldr_spark.operators.bfs import bfs_distances

    edges = _rand_graph(5, 40, 120)
    seeds = [0, 7]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    # both paths: default (bounded driver deque finisher) and the
    # distributed frontier iteration (local_finish_edges=0 disables)
    for lf in (1_000_000, 0):
        for directed in (True, False):
            got = {
                r["id"]: r["dist"]
                for r in bfs_distances(
                    e, s, directed=directed, local_finish_edges=lf
                ).distances.collect()
            }
            assert got == _bfs_oracle(edges, seeds, directed), (lf, directed)


def test_bfs_unreachable_absent(spark):
    from tldr_spark.operators.bfs import bfs_distances

    e = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    s = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(e, s).distances.collect()}
    assert got == {0: 0, 1: 1}


# --- personalized PageRank ----------------------------------------------

def _ppr_oracle(edges, seeds, damping, n_iter):
    # dense power iteration mirroring operators/pagerank.py semantics:
    # duplicate edges sum, out-weight normalize, dangling mass -> teleport
    # vector, init at p
    w = {}
    for s, d, wt in edges:
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
    p = np.zeros(n)
    sv = [v for v in seeds if v in idx]
    for v in sv:
        p[idx[v]] = 1.0 / len(sv)
    r = p.copy()
    for _ in range(n_iter):
        leak = r[dangling].sum()
        r = damping * (Mn.T @ r) + ((1 - damping) + damping * leak) * p
    return {v: r[idx[v]] for v in verts}


def test_personalized_pagerank_matches_numpy(spark):
    from tldr_spark.operators.pagerank import personalized_pagerank

    edges = [(s, d, 1.0 + (s + d) % 3) for s, d in _rand_graph(9, 30, 90)]
    edges += [(1, 2, 5.0), (1, 2, 1.0)]  # duplicate edge: weights must sum
    seeds = [0, 3, 11]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    res = personalized_pagerank(e, s, tolerance=-1.0, max_iter=25)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    exp = _ppr_oracle(edges, seeds, 0.85, 25)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_converges_and_localizes(spark):
    from tldr_spark.operators.pagerank import personalized_pagerank

    # two disjoint cliques; seeds in clique A -> clique B gets rank 0
    a = [(i, j, 1.0) for i in range(4) for j in range(4) if i != j]
    b = [(i, j, 1.0) for i in range(10, 14) for j in range(10, 14) if i != j]
    e = spark.createDataFrame(a + b, "src long, dst long, weight double")
    s = spark.createDataFrame([(0,)], "id long")
    res = personalized_pagerank(e, s, tolerance=1e-10)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    assert res.l1_delta <= 1e-10
    assert all(got[v] == 0.0 for v in range(10, 14))
    assert abs(sum(got.values()) - 1.0) < 1e-9


# --- HITS ---------------------------------------------------------------

def _hits_oracle(edges, n_iter):
    es = sorted(set(edges))
    verts = sorted({v for e in es for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for s, d in es:
        A[idx[s], idx[d]] = 1.0
    hub = np.full(n, 1.0 / n)
    auth = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        auth = A.T @ hub
        auth = auth / auth.sum()
        hub = A @ auth
        hub = hub / hub.sum()
    return {v: (hub[idx[v]], auth[idx[v]]) for v in verts}


def test_hits_matches_numpy(spark):
    from tldr_spark.operators.hits import hits

    edges = _rand_graph(3, 25, 80)
    e = spark.createDataFrame(edges, "src long, dst long")
    res = hits(e, iterations=10)
    got = {r["id"]: (r["hub"], r["auth"]) for r in res.scores.collect()}
    exp = _hits_oracle(edges, 10)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v][0] - exp[v][0]) < 1e-9
        assert abs(got[v][1] - exp[v][1]) < 1e-9


def test_hits_star(spark):
    from tldr_spark.operators.hits import hits

    # star: 1..4 -> 0; 0 is the sole authority, spokes are the hubs
    e = spark.createDataFrame([(i, 0) for i in range(1, 5)], "src long, dst long")
    got = {r["id"]: r for r in hits(e, iterations=5).scores.collect()}
    assert got[0]["auth"] == 1.0 and got[0]["hub"] == 0.0
    for i in range(1, 5):
        assert abs(got[i]["hub"] - 0.25) < 1e-12 and got[i]["auth"] == 0.0


# --- k-core -------------------------------------------------------------

def _kcore_oracle(edges, k):
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = set(adj)
    changed = True
    while changed:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        changed = bool(drop)
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


def test_kcore_matches_oracle(spark):
    from tldr_spark.operators.kcore import k_core

    edges = _rand_graph(17, 30, 140) + [(0, 0)]  # self-loop must be ignored
    e = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 3, 4):
        res = k_core(e, k)
        got = {r["id"]: r["degree"] for r in res.vertices.collect()}
        assert got == _kcore_oracle(edges, k), k


def test_kcore_clique_plus_tail(spark):
    from tldr_spark.operators.kcore import k_core

    clique = [(i, j) for i in range(4) for j in range(4) if i < j]
    tail = [(3, 9), (9, 10)]
    e = spark.createDataFrame(clique + tail, "src long, dst long")
    got = {r["id"] for r in k_core(e, 3).vertices.collect()}
    assert got == {0, 1, 2, 3}


# --- link-structure similarity ------------------------------------------

def test_clustering_coefficient_matches_brute(spark):
    from itertools import combinations

    from tldr_spark.operators.linksim import clustering_coefficient

    edges = _rand_graph(21, 20, 70)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    exp = {}
    for v, ns in adj.items():
        if len(ns) < 2:
            continue
        t = sum(1 for a, b in combinations(sorted(ns), 2) if b in adj.get(a, ()))
        exp[v] = (len(ns), t, 2.0 * t / (len(ns) * (len(ns) - 1)))
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: (r["degree"], r["triangles"], r["coeff"])
        for r in clustering_coefficient(e).collect()
    }
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v][0] == exp[v][0] and got[v][1] == exp[v][1], v
        assert abs(got[v][2] - exp[v][2]) < 1e-12


def test_cocitation_and_coupling(spark):
    from tldr_spark.operators.linksim import bibliographic_coupling, cocitation

    # sources 0,1 both cite 10 and 11; source 2 cites 10 only
    edges = [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10), (0, 10)]  # dup edge
    e = spark.createDataFrame(edges, "src long, dst long")
    cc = {(r["id_a"], r["id_b"]): r["n_common_sources"] for r in cocitation(e).collect()}
    assert cc == {(10, 11): 2}
    bc = {
        (r["id_a"], r["id_b"]): r["n_common_targets"]
        for r in bibliographic_coupling(e).collect()
    }
    assert bc == {(0, 1): 2}


def test_common_neighbor_jaccard(spark):
    from itertools import combinations

    from tldr_spark.operators.linksim import common_neighbor_jaccard

    edges = _rand_graph(31, 18, 60)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    exp = {}
    for a, b in combinations(sorted(adj), 2):
        i = len(adj[a] & adj[b])
        if i:
            exp[(a, b)] = i / len(adj[a] | adj[b])
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in common_neighbor_jaccard(e).collect()
    }
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-12


# --- graph summary stats ------------------------------------------------

def test_graph_summary_matches_brute(spark):
    from itertools import combinations

    from tldr_spark.operators.stats import graph_summary

    edges = _rand_graph(47, 22, 90)
    e = spark.createDataFrame(edges, "src long, dst long")
    row = graph_summary(e).collect()[0]

    sd = {(s, d) for s, d in edges}
    verts = {v for p in sd for v in p}
    und = {(min(a, b), max(a, b)) for a, b in sd}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if c > b
    )
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    recip = sum(1 for s, d in sd if (d, s) in sd)

    assert row["n_vertices"] == len(verts)
    assert row["n_edges"] == len(sd)
    assert row["n_reciprocal"] == recip
    assert row["n_und_edges"] == len(und)
    assert row["triangles"] == tri
    assert row["wedges"] == wedges
    assert abs(row["reciprocity"] - recip / len(sd)) < 1e-12
    assert abs(row["transitivity"] - 3.0 * tri / wedges) < 1e-12
    assert abs(row["density"] - len(sd) / (len(verts) * (len(verts) - 1))) < 1e-12


# --- deterministic random walks -----------------------------------------

def _walks_oracle(edges, walk_length, walks_per_vertex):
    import hashlib

    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, [])
        if d not in adj[s]:
            adj[s].append(d)
    for s in adj:
        adj[s].sort()
    rows = []
    for start in sorted(adj):
        for k in range(walks_per_vertex):
            cur = start
            rows.append((start, k, 0, cur))
            for t in range(walk_length):
                if cur not in adj:
                    break
                h = int(hashlib.md5(f"{start}-{k}-{t}".encode()).hexdigest()[:8], 16)
                cur = adj[cur][h % len(adj[cur])]
                rows.append((start, k, t + 1, cur))
    return sorted(rows)


def test_random_walks_deterministic_and_match_oracle(spark):
    from tldr_spark.operators.walks import random_walks

    edges = _rand_graph(53, 25, 80)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["start"], r["walk"], r["step"], r["vertex"])
        for r in random_walks(e, walk_length=6, walks_per_vertex=2).collect()
    )
    assert got == _walks_oracle(edges, 6, 2)
    # bit-determinism: a second run is identical
    got2 = sorted(
        (r["start"], r["walk"], r["step"], r["vertex"])
        for r in random_walks(e, walk_length=6, walks_per_vertex=2).collect()
    )
    assert got2 == got


def test_random_walks_stop_at_dangling(spark):
    from tldr_spark.operators.walks import random_walks

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")  # 2 dangles
    got = sorted(
        (r["start"], r["walk"], r["step"], r["vertex"])
        for r in random_walks(e, walk_length=5, walks_per_vertex=1).collect()
    )
    assert got == [(0, 0, 0, 0), (0, 0, 1, 1), (0, 0, 2, 2), (1, 0, 0, 1), (1, 0, 1, 2)]


def test_ego_subgraph(spark):
    from tldr_spark.operators.bfs import ego_subgraph

    edges = _rand_graph(61, 30, 90)
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "id long")
    got = {(r["src"], r["dst"]) for r in ego_subgraph(e, s, k=2).collect()}
    reach = {v for v, d in _bfs_oracle(edges, [0]).items() if d <= 2}
    exp = {(a, b) for a, b in edges if a in reach and b in reach}
    assert got == exp


# --- strongly connected components --------------------------------------

def _scc_oracle(edges):
    verts = sorted({v for p in edges for v in p if p[0] != p[1]})
    adj = {v: set() for v in verts}
    for s, d in edges:
        if s != d:
            adj[s].add(d)

    def reach(s):
        seen, stack = {s}, [s]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen

    fw = {v: reach(v) for v in verts}
    return {
        v: min(u for u in fw[v] if v in fw[u])
        for v in verts
    }


def test_scc_matches_brute(spark):
    from tldr_spark.operators.scc import strongly_connected_components

    for seed in (7, 19, 33):
        edges = _rand_graph(seed, 18, 45)
        e = spark.createDataFrame(edges, "src long, dst long")
        oracle = _scc_oracle(edges)
        # BOTH paths against the oracle: the default (small core → driver
        # Tarjan finisher) and the distributed coloring fixpoint
        # (local_finish_vertices=0 disables the finisher)
        for lf in (50_000, 0):
            res = strongly_connected_components(e, local_finish_vertices=lf)
            got = {r["id"]: r["component"] for r in res.assignments.collect()}
            assert got == oracle, (seed, lf)


def test_scc_two_cycles_and_bridge(spark):
    from tldr_spark.operators.scc import strongly_connected_components

    # cycle A (0,1,2), bridge 2->10, cycle B (10,11), dangler 11->20
    edges = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 10), (11, 20)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in strongly_connected_components(e).assignments.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20}


def test_scc_negative_vertex_ids(spark):
    """Hashed 64-bit ids can be negative; the max-propagation must treat a
    missing in-neighbor aggregate as a no-op, not clamp colors to a -1
    sentinel (which corrupts any all-negative color class)."""
    from tldr_spark.operators.scc import strongly_connected_components

    # all-negative cycle + all-negative dangler + mixed-sign cycle
    edges = [(-5, -3), (-3, -5), (-3, -9), (-20, 4), (4, -20)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in strongly_connected_components(e).assignments.collect()}
    assert got == {-5: -5, -3: -5, -9: -9, -20: -20, 4: -20}

    for seed in (3, 11):
        edges = [(a - 9, b - 9) for a, b in _rand_graph(seed, 18, 45)]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {r["id"]: r["component"] for r in strongly_connected_components(e).assignments.collect()}
        assert got == _scc_oracle(edges), seed


def test_scc_raises_when_pass_budget_exhausted(spark):
    import pytest

    from tldr_spark.operators.scc import strongly_connected_components

    # descending chain peels exactly one root per pass when trim is off
    # (with trim on, a chain is peeled from both ends by degree checks —
    # disable it to exercise the coloring pass budget)
    chain = [(i + 1, i) for i in range(6)]
    e = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="max_passes"):
        strongly_connected_components(
            e, max_passes=3, trim_rounds=0, local_finish_vertices=0
        )
    got = {r["id"]: r["component"] for r in
           strongly_connected_components(
               e, max_passes=10, trim_rounds=0, local_finish_vertices=0
           ).assignments.collect()}
    assert got == {i: i for i in range(7)}


def test_scc_trim_settles_dag_and_matches_untrimmed(spark):
    """A DAG has only singleton SCCs — trim alone must settle it (no
    coloring pass budget consumed beyond the trim pass), and trimmed vs
    untrimmed results must be identical on cyclic graphs."""
    from tldr_spark.operators.scc import strongly_connected_components

    # layered DAG: 3 layers of 3, edges only forward
    dag = [(a, b) for a in range(3) for b in range(3, 6)] + [
        (a, b) for a in range(3, 6) for b in range(6, 9)
    ]
    e = spark.createDataFrame(dag, "src long, dst long")
    res = strongly_connected_components(e, max_passes=2)
    got = {r["id"]: r["component"] for r in res.assignments.collect()}
    assert got == {i: i for i in range(9)}

    for seed in (7, 33):
        edges = _rand_graph(seed, 18, 45)
        e = spark.createDataFrame(edges, "src long, dst long")
        with_trim = {r["id"]: r["component"] for r in
                     strongly_connected_components(e).assignments.collect()}
        no_trim = {r["id"]: r["component"] for r in
                   strongly_connected_components(e, trim_rounds=0).assignments.collect()}
        assert with_trim == no_trim == _scc_oracle(edges), seed


def test_weighted_lpa_matches_brute(spark):
    from tldr_spark.operators.labelprop import label_propagation

    rng = np.random.default_rng(71)
    edges = [
        (int(a), int(b), float(w))
        for a, b, w in zip(
            rng.integers(0, 15, 50), rng.integers(0, 15, 50), rng.integers(1, 6, 50)
        )
        if a != b
    ]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    res = label_propagation(e, max_rounds=4, weight_col="weight")
    got = {r["id"]: r["label"] for r in res.labels.collect()}

    # brute force: symmetrized summed weights; argmax weight, min-label tie
    wsum = {}
    for s, d, w in edges:
        wsum[(s, d)] = wsum.get((s, d), 0.0) + w
        wsum[(d, s)] = wsum.get((d, s), 0.0) + w
    verts = sorted({v for p in wsum for v in p})
    labels = {v: v for v in verts}
    for _ in range(4):
        new = {}
        for u in verts:
            acc = {}
            for (a, b), w in wsum.items():
                if a == u:
                    acc[labels[b]] = acc.get(labels[b], 0.0) + w
            if acc:
                best = max(acc.items(), key=lambda kv: (kv[1], -kv[0]))
                new[u] = best[0]
            else:
                new[u] = labels[u]
        if new == labels:
            break
        labels = new
    assert got == labels


def test_degree_assortativity_matches_numpy(spark):
    from tldr_spark.operators.stats import degree_assortativity

    edges = _rand_graph(83, 20, 80)
    sd = sorted({(s, d) for s, d in edges})
    outd, ind = {}, {}
    for s, d in sd:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    xs = np.array([outd[s] for s, d in sd], dtype=float)
    ys = np.array([ind[d] for s, d in sd], dtype=float)
    exp = np.corrcoef(xs, ys)[0, 1]
    e = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(e).collect()[0]
    assert row["m"] == len(sd)
    assert abs(row["assortativity"] - exp) < 1e-9


def test_harmonic_centrality_matches_brute(spark):
    from tldr_spark.operators.bfs import harmonic_centrality, labeled_bfs

    edges = _rand_graph(91, 25, 70)
    probes = [0, 3, 24]
    e = spark.createDataFrame(edges, "src long, dst long")
    p = spark.createDataFrame([(x,) for x in probes], "id long")
    exp_d = {}
    for pr in probes:
        for v, d in _bfs_oracle(edges, [pr]).items():
            exp_d[(pr, v)] = d
    # both paths: driver per-probe deque finisher and distributed flood
    for lf in (500_000, 0):
        got_d = {
            (r["probe"], r["id"]): r["dist"]
            for r in labeled_bfs(e, p, local_finish_edges=lf).collect()
        }
        assert got_d == exp_d, lf

    got_h = {r["probe"]: r["harmonic"] for r in harmonic_centrality(e, p).collect()}
    for pr in probes:
        exp = sum(1.0 / d for (q, v), d in exp_d.items() if q == pr and d > 0)
        assert abs(got_h[pr] - exp) < 1e-9, pr


def test_closeness_centrality_matches_brute(spark):
    from tldr_spark.operators.bfs import closeness_centrality

    edges = _rand_graph(97, 25, 70)
    probes = [0, 7]
    e = spark.createDataFrame(edges, "src long, dst long")
    p = spark.createDataFrame([(x,) for x in probes], "id long")
    got = {r["probe"]: (r["n_reached"], r["closeness"])
           for r in closeness_centrality(e, p).collect()}
    for pr in probes:
        d = _bfs_oracle(edges, [pr])
        n = len(d) - 1
        sd = sum(d.values())
        exp = n / sd if sd > 0 else 0.0
        assert got[pr][0] == n
        assert abs(got[pr][1] - exp) < 1e-12


def test_eccentricity_matches_brute(spark):
    from tldr_spark.operators.bfs import eccentricity

    edges = _rand_graph(13, 16, 40)
    verts = sorted({v for p in edges for v in p})
    probes = verts[::3]
    e = spark.createDataFrame(edges, "src long, dst long")
    p = spark.createDataFrame([(v,) for v in probes], "id long")
    got = {r["probe"]: (r["eccentricity"], r["n_reached"])
           for r in eccentricity(e, p).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    for s in probes:
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            frontier = nxt
        assert got[s] == (max(dist.values()), len(dist) - 1), s


def test_adamic_adar_and_resource_allocation(spark):
    import math
    from itertools import combinations

    from tldr_spark.operators.linksim import adamic_adar, resource_allocation

    edges = _rand_graph(37, 18, 60)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    exp_aa, exp_ra = {}, {}
    for a, b in combinations(sorted(adj), 2):
        common = adj[a] & adj[b]
        if common:
            exp_aa[(a, b)] = sum(1.0 / math.log(len(adj[z])) for z in common)
            exp_ra[(a, b)] = sum(1.0 / len(adj[z]) for z in common)
    e = spark.createDataFrame(edges, "src long, dst long")
    got_aa = {(r["id_a"], r["id_b"]): r["score"] for r in adamic_adar(e).collect()}
    got_ra = {(r["id_a"], r["id_b"]): r["score"] for r in resource_allocation(e).collect()}
    assert got_aa.keys() == exp_aa.keys()
    assert got_ra.keys() == exp_ra.keys()
    for k in exp_aa:
        assert abs(got_aa[k] - exp_aa[k]) < 1e-9
        assert abs(got_ra[k] - exp_ra[k]) < 1e-12


def test_partition_modularity_matches_brute(spark):
    from tldr_spark.operators.labelprop import label_propagation
    from tldr_spark.operators.stats import partition_modularity

    edges = _rand_graph(41, 24, 70)
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = label_propagation(e).labels
    lab = {r["id"]: r["label"] for r in labels.collect()}

    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    m = len(und)
    deg, within, dc = {}, {}, {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        if lab[a] == lab[b]:
            within[lab[a]] = within.get(lab[a], 0) + 1
    for v, d in deg.items():
        dc[lab[v]] = dc.get(lab[v], 0) + d
    exp = sum(
        within.get(c, 0) / m - (dc[c] / (2.0 * m)) ** 2 for c in dc
    )
    row = partition_modularity(e, labels).collect()[0]
    assert row["m"] == m
    assert abs(row["modularity"] - exp) < 1e-12
    # a perfect two-clique partition has high Q; one-community has Q ~ 0
    clique = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    ce = spark.createDataFrame(clique, "src long, dst long")
    asg = spark.createDataFrame(
        [(i, 0) for i in (0, 1, 2)] + [(i, 1) for i in (10, 11, 12)],
        "id long, label long",
    )
    q2 = partition_modularity(ce, asg).collect()[0]["modularity"]
    assert abs(q2 - 0.5) < 1e-12
    one = spark.createDataFrame([(i, 0) for i in (0, 1, 2, 10, 11, 12)], "id long, label long")
    q1 = partition_modularity(ce, one).collect()[0]["modularity"]
    assert abs(q1) < 1e-12


def test_k_truss_matches_brute(spark):
    from tldr_spark.operators.triangles import k_truss

    def oracle(edges, k):
        und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
        while True:
            adj = {}
            for a, b in und:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {(a, b) for (a, b) in und if len(adj[a] & adj[b]) < k - 2}
            if not drop:
                return und
            und -= drop

    for seed in (13, 29):
        edges = _rand_graph(seed, 16, 55)
        e = spark.createDataFrame(edges, "src long, dst long")
        for k in (2, 3, 4):
            got = {(r["a"], r["b"]) for r in k_truss(e, k).edges.collect()}
            assert got == oracle(edges, k), (seed, k)

    # K5 with a pendant path: the 4-truss (and 5-truss) is exactly the K5
    k5 = [(i, j) for i in range(5) for j in range(5) if i < j]
    tail = [(4, 10), (10, 11)]
    e = spark.createDataFrame(k5 + tail, "src long, dst long")
    got5 = {(r["a"], r["b"]) for r in k_truss(e, 5).edges.collect()}
    assert got5 == set(k5)
    got2 = {(r["a"], r["b"]) for r in k_truss(e, 2).edges.collect()}
    assert got2 == set(k5) | set(tail)


def test_luby_mis_deterministic_and_correct(spark):
    import hashlib

    from tldr_spark.operators.mis import maximal_independent_set

    def oracle(edges, max_rounds=100):
        und = {}
        for s, d in edges:
            if s != d:
                und.setdefault(s, set()).add(d)
                und.setdefault(d, set()).add(s)
        undecided = set(und)
        members = set()
        r = 0
        while undecided:
            r += 1
            assert r <= max_rounds
            pri = {
                v: (int(hashlib.md5(f"{v}-{r}".encode()).hexdigest()[:8], 16), v)
                for v in undecided
            }
            winners = {
                v
                for v in undecided
                if all(pri[v] > pri[u] for u in und[v] if u in undecided)
            }
            members |= winners
            undecided -= winners | {u for v in winners for u in und[v]}
        return members

    for seed in (11, 23, 47):
        edges = _rand_graph(seed, 22, 60)
        e = spark.createDataFrame(edges, "src long, dst long")
        res = maximal_independent_set(e)
        got = {r["id"] for r in res.members.collect()}
        exp = oracle(edges)
        assert got == exp, seed
        # independence + maximality invariants, independent of the oracle
        und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
        assert not any(a in got and b in got for a, b in und)
        verts = {v for p in und for v in p}
        adj = {v: set() for v in verts}
        for a, b in und:
            adj[a].add(b)
            adj[b].add(a)
        assert all(v in got or (adj[v] & got) for v in verts)


def test_spam_mass_separates_farm_from_trust_core(spark):
    from tldr_spark.operators.pagerank import spam_mass

    # trusted clique {0,1,2} linking around; spam farm {10,11,12} boosting
    # target 13, unreachable from the trusted side
    good = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 1)]
    farm = [(10, 13), (11, 13), (12, 13), (13, 10), (13, 11), (13, 12)]
    e = spark.createDataFrame(good + farm, "src long, dst long")
    t = spark.createDataFrame([(0,), (1,)], "id long")
    rows = {r["id"]: r for r in spam_mass(e, t, tolerance=1e-10).collect()}
    # farm vertices get zero trust -> spam mass ~1
    for v in (10, 11, 12, 13):
        assert rows[v]["trust"] == 0.0
        assert rows[v]["spam_mass"] > 0.999, v
    # the trust core's rank is mostly trust-explained
    for v in (0, 1, 2):
        assert rows[v]["trust"] > 0.0
        assert rows[v]["spam_mass"] < 0.5, v
    assert abs(sum(r["rank"] for r in rows.values()) - 1.0) < 1e-9


def test_eigenvector_centrality_matches_numpy(spark):
    from tldr_spark.operators.hits import eigenvector_centrality

    def oracle(edges, n_iter, weights=None):
        es = {}
        for idx, (s, d) in enumerate(edges):
            w = 1.0 if weights is None else weights[idx]
            es[(s, d)] = es.get((s, d), 0.0) + w
        verts = sorted({v for p in es for v in p})
        ix = {v: i for i, v in enumerate(verts)}
        A = np.zeros((len(verts), len(verts)))
        for (s, d), w in es.items():
            A[ix[s], ix[d]] = w
        x = np.full(len(verts), 1.0 / len(verts))
        for _ in range(n_iter):
            x = A.T @ x
            x = x / x.sum()
        return {v: x[ix[v]] for v in verts}

    # random graph plus a guaranteed cycle so mass never dies out
    edges = _rand_graph(9, 30, 90) + [(0, 1), (1, 2), (2, 0)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["score"] for r in eigenvector_centrality(e, 20).collect()}
    exp = oracle(edges, 20)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # weighted: duplicate edges must sum, weights must matter
    wedges = [(0, 1, 2.0), (0, 1, 1.0), (1, 0, 1.0), (2, 0, 5.0), (0, 2, 1.0)]
    we = spark.createDataFrame(wedges, "src long, dst long, weight double")
    gw = {r["id"]: r["score"] for r in
          eigenvector_centrality(we, 12, weight_col="weight").collect()}
    ew = oracle([(s, d) for s, d, _ in wedges], 12, [w for _, _, w in wedges])
    for v in ew:
        assert abs(gw[v] - ew[v]) < 1e-9, v


def test_greedy_coloring_proper_and_deterministic(spark):
    from tldr_spark.operators.mis import greedy_coloring

    for seed in (19, 41):
        edges = _rand_graph(seed, 20, 55)
        e = spark.createDataFrame(edges, "src long, dst long")
        r1 = greedy_coloring(e)
        got = {r["id"]: r["color"] for r in r1.colors.collect()}
        und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
        verts = {v for p in und for v in p}
        # total, proper, and bounded
        assert set(got) == verts
        assert all(got[a] != got[b] for a, b in und), seed
        assert r1.n_colors <= max(
            sum(1 for p in und if v in p) for v in verts
        ) + 1
        # deterministic: a second run colors identically
        r2 = greedy_coloring(e)
        assert {r["id"]: r["color"] for r in r2.colors.collect()} == got


def test_salsa_matches_numpy_and_indegree_fixpoint(spark):
    from tldr_spark.operators.hits import salsa

    def oracle(edges, n_iter):
        es = sorted(set(edges))
        verts = sorted({v for p in es for v in p})
        ix = {v: i for i, v in enumerate(verts)}
        n = len(verts)
        A = np.zeros((n, n))
        for s, d in es:
            A[ix[s], ix[d]] = 1.0
        od = A.sum(axis=1)
        idg = A.sum(axis=0)
        Wa = np.divide(A, od[:, None], out=np.zeros_like(A), where=od[:, None] > 0)
        Wh = np.divide(A, idg[None, :], out=np.zeros_like(A), where=idg[None, :] > 0)
        hub = np.where(od > 0, 1.0 / n, 0.0)
        auth = np.zeros(n)
        for _ in range(n_iter):
            auth = Wa.T @ hub
            hub = Wh @ auth
        return {v: (hub[ix[v]], auth[ix[v]]) for v in verts}

    edges = _rand_graph(27, 25, 75)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: (r["hub"], r["auth"]) for r in salsa(e, 10).scores.collect()}
    exp = oracle(edges, 10)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v][0] - exp[v][0]) < 1e-12, v
        assert abs(got[v][1] - exp[v][1]) < 1e-12, v

    # known SALSA fixpoint: authority ~ in-degree within a connected
    # authority component (two spokes vs one in a shared-hub star)
    star = [(1, 10), (2, 10), (3, 10), (3, 11)]
    gs = {r["id"]: r["auth"] for r in salsa(
        spark.createDataFrame(star, "src long, dst long"), 40).scores.collect()}
    assert abs(gs[10] / gs[11] - 3.0) < 1e-6


# --- neighborhood MinHash-LSH similarity --------------------------------

def test_neighbor_minhash_signatures_match_md5_oracle(spark):
    import hashlib

    from tldr_spark.operators.linksim import neighbor_minhash_signatures

    edges = _rand_graph(53, 20, 70)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    exp = {}
    for v, nbs in adj.items():
        hexes = [hashlib.md5(str(n).encode()).hexdigest() for n in nbs]
        exp[v] = tuple(min(h[8 * i:8 * i + 8] for h in hexes) for i in range(4))
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
        for r in neighbor_minhash_signatures(e, 4).collect()
    }
    assert got == exp


def test_neighbor_minhash_jaccard_exact_on_candidates(spark):
    from itertools import combinations

    from tldr_spark.operators.linksim import (
        neighbor_minhash_candidates,
        neighbor_minhash_jaccard,
    )

    edges = _rand_graph(59, 16, 55)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    exact = {}
    for a, b in combinations(sorted(adj), 2):
        i = len(adj[a] & adj[b])
        if i:
            exact[(a, b)] = i / len(adj[a] | adj[b])
    e = spark.createDataFrame(edges, "src long, dst long")

    cand = {
        (r["id_a"], r["id_b"])
        for r in neighbor_minhash_candidates(e, 4).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in neighbor_minhash_jaccard(e, threshold=0.2, num_hashes=4).collect()
    }
    # precision 1.0: every emitted pair is a candidate AND carries the
    # exact jaccard of the full operator
    for k, j in got.items():
        assert k in cand
        assert k in exact and abs(j - exact[k]) < 1e-12, k
    # identical minhash signatures imply candidacy, so any pair with
    # jaccard 1.0 (identical neighbor sets) must be recalled
    for k, j in exact.items():
        if j == 1.0:
            assert k in got, k


# --- community stats & contraction --------------------------------------

def test_community_stats_matches_brute(spark):
    from tldr_spark.operators.community import community_stats

    edges = _rand_graph(61, 18, 60)
    und = {(min(a, b), max(a, b)) for a, b in edges}
    verts = sorted({v for e in und for v in e})
    lab = {v: v % 4 for v in verts}
    m = len(und)
    exp = {}
    for c in sorted({v % 4 for v in verts}):
        members = {v for v in verts if lab[v] == c}
        internal = sum(1 for a, b in und if a in members and b in members)
        cut = sum(1 for a, b in und if (a in members) != (b in members))
        vol = 2 * internal + cut
        cond = 0.0 if cut == 0 else cut / min(vol, 2 * m - vol)
        exp[c] = (len(members), internal, cut, vol, cond)

    e = spark.createDataFrame(edges, "src long, dst long")
    asg = spark.createDataFrame([(v, lab[v]) for v in verts], "id long, label long")
    got = {
        r["community"]: (
            r["n_vertices"], r["internal_edges"], r["cut_edges"],
            r["volume"], r["conductance"],
        )
        for r in community_stats(e, asg).collect()
    }
    assert set(got) == set(exp)
    for c in exp:
        assert got[c][:4] == exp[c][:4], c
        assert abs(got[c][4] - exp[c][4]) < 1e-12, c


def test_contract_communities_matches_brute_and_conserves_mass(spark):
    from tldr_spark.operators.community import contract_communities

    edges = _rand_graph(67, 20, 70)
    sd = {(a, b) for a, b in edges}
    verts = sorted({v for e in sd for v in e})
    lab = {v: v % 3 for v in verts}
    exp_edges = {}
    for a, b in sd:
        k = (lab[a], lab[b])
        exp_edges[k] = exp_edges.get(k, 0) + 1

    e = spark.createDataFrame(edges, "src long, dst long")
    asg = spark.createDataFrame([(v, lab[v]) for v in verts], "id long, label long")
    res = contract_communities(e, asg)
    got_edges = {
        (r["src"], r["dst"]): r["weight"] for r in res.edges.collect()
    }
    assert got_edges == exp_edges
    got_nodes = {r["community"]: r["n_vertices"] for r in res.nodes.collect()}
    from collections import Counter
    assert got_nodes == dict(Counter(lab.values()))
    # mass conservation: supergraph weight == simple directed edge count
    assert sum(got_edges.values()) == len(sd)


def test_labelprop_contract_pagerank_composes(spark):
    """Multilevel composition: labelprop communities -> contracted
    supergraph -> PageRank on the supergraph runs end to end and the
    supergraph is strictly smaller."""
    from tldr_spark.operators.community import contract_communities
    from tldr_spark.operators.labelprop import label_propagation
    from tldr_spark.operators.pagerank import pagerank

    edges = _rand_graph(71, 30, 90)
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = label_propagation(e, max_rounds=5).labels
    res = contract_communities(e, labels)
    n_super = res.nodes.count()
    n_orig = labels.count()
    assert 0 < n_super <= n_orig
    pr = pagerank(res.edges.filter("src != dst"), max_iter=10)
    assert pr.ranks.count() == res.edges.filter("src != dst").selectExpr(
        "explode(array(src, dst)) v").select("v").distinct().count()


# --- neighborhood function / effective diameter -------------------------

def _nf_oracle(edges, max_h, directed=True):
    from collections import deque

    adj = {}
    verts = set()
    for s, d in {(a, b) for a, b in edges if a != b}:
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
        if not directed:
            adj.setdefault(d, set()).add(s)
    counts = [0] * (max_h + 1)
    for root in verts:
        dist = {root: 0}
        dq = deque([root])
        while dq:
            u = dq.popleft()
            if dist[u] >= max_h:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        for d in dist.values():
            for h in range(d, max_h + 1):
                counts[h] += 1
    return {h: counts[h] for h in range(max_h + 1)}


def test_neighborhood_function_exact_matches_bfs_oracle(spark):
    from tldr_spark.operators.anf import neighborhood_function

    edges = _rand_graph(73, 24, 70)
    e = spark.createDataFrame(edges, "src long, dst long")
    for lf in (500_000, 0):
        for directed in (True, False):
            exp = _nf_oracle(edges, 6, directed)
            got = {
                r["h"]: r["n_pairs"]
                for r in neighborhood_function(
                    e, max_h=6, directed=directed, local_finish_edges=lf
                ).collect()
            }
            assert got == exp, (lf, directed)


def test_hyper_anf_tracks_exact_within_hll_error(spark):
    from tldr_spark.operators.anf import hyper_anf

    edges = _rand_graph(79, 60, 200)
    e = spark.createDataFrame(edges, "src long, dst long")
    exp = _nf_oracle(edges, 5)
    got = {
        r["h"]: r["n_pairs_est"] for r in hyper_anf(e, max_h=5, lg_k=12).collect()
    }
    assert set(got) == set(exp)
    for h in exp:
        assert abs(got[h] - exp[h]) / exp[h] < 0.05, (h, got[h], exp[h])


def test_effective_diameter_chain(spark):
    from tldr_spark.operators.anf import effective_diameter, neighborhood_function

    # directed 11-vertex chain: N(h) = sum_{i=0..10} min(h+1, 11-i)
    chain = [(i, i + 1) for i in range(10)]
    e = spark.createDataFrame(chain, "src long, dst long")
    nf = neighborhood_function(e, max_h=10)
    got = {r["h"]: r["n_pairs"] for r in nf.collect()}
    exp = {h: sum(min(h + 1, 11 - i) for i in range(11)) for h in range(11)}
    assert got == exp
    d = effective_diameter(nf, quantile=0.9)
    # cumulative pairs hit 0.9*66 = 59.4 between h=6 (n=56) and h=7 (n=60)
    assert 6.0 < d < 7.0


# --- link recommendations -----------------------------------------------

def test_link_recommendations_match_brute(spark):
    from itertools import combinations

    from tldr_spark.operators.linksim import link_recommendations

    edges = _rand_graph(83, 22, 66)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    scores = {}  # directed (id, rec) -> quantized RA score
    for a, b in combinations(sorted(adj), 2):
        common = adj[a] & adj[b]
        if not common or b in adj[a]:
            continue
        q = round(sum(1.0 / len(adj[z]) for z in common) * 1048576)
        scores[(a, b)] = q
        scores[(b, a)] = q
    exp = {}
    for (i, r), q in scores.items():
        exp.setdefault(i, []).append((-q, r))
    k = 3
    exp_top = {
        i: [(r, -nq, rk + 1) for rk, (nq, r) in enumerate(sorted(v)[:k])]
        for i, v in exp.items()
    }
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {}
    for row in link_recommendations(e, k=3).collect():
        got.setdefault(row["id"], []).append((row["rec"], row["score_q"], row["rk"]))
    got = {i: sorted(v, key=lambda t: t[2]) for i, v in got.items()}
    assert got == exp_top
