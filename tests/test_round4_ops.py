"""Round-4 operator wave: DAG longest-path levels (condensation tiers),
dyad + full directed triad census, landmark distance sketches.

Correctness pins: pure-Python oracles (Kahn layering, itertools brute-force
triad classification over ALL C(n,3) triples, per-pair BFS for landmark
bounds) plus differential tests between the local-finish and distributed
paths where the operator has both.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from tldr_spark.operators.dag import CycleError, condensation_levels, dag_levels
from tldr_spark.operators.landmarks import (
    choose_landmarks,
    landmark_distance_estimates,
    landmark_sketch,
)
from tldr_spark.operators.triads import LOOKUP, _type_of, dyad_census, triad_census


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


# ---------------------------------------------------------------------------
# DAG levels
# ---------------------------------------------------------------------------

def _levels_py(edges):
    """Longest-path level by relaxation over a topological order."""
    verts = sorted({v for e in edges for v in e})
    adj = {}
    indeg = {v: 0 for v in verts}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        indeg[d] += 1
    order, stack = [], sorted([v for v in verts if indeg[v] == 0])
    indeg = dict(indeg)
    while stack:
        u = stack.pop()
        order.append(u)
        for v in adj.get(u, ()):
            indeg[v] -= 1
            if indeg[v] == 0:
                stack.append(v)
    assert len(order) == len(verts), "oracle input must be a DAG"
    lvl = {v: 0 for v in verts}
    for u in order:
        for v in adj.get(u, ()):
            lvl[v] = max(lvl[v], lvl[u] + 1)
    return lvl


def _random_dag(seed: int, n: int, m: int):
    """Random DAG: random directed pairs oriented low→high."""
    return sorted({(min(s, d), max(s, d)) for s, d in _rand_edges(seed, n, m)})


@pytest.mark.parametrize("local_finish", [1_000_000, 0])
def test_dag_levels_matches_python(spark, local_finish):
    edges = _random_dag(11, 40, 120)
    res = dag_levels(_df(spark, edges), local_finish_edges=local_finish)
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    want = _levels_py(edges)
    assert got == want
    assert res.depth == max(want.values())


@pytest.mark.parametrize("local_finish", [1_000_000, 0])
def test_dag_levels_detects_cycle(spark, local_finish):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    with pytest.raises(CycleError):
        dag_levels(_df(spark, edges), max_rounds=20, local_finish_edges=local_finish)


def test_dag_levels_rejects_self_loop(spark):
    with pytest.raises(CycleError):
        dag_levels(_df(spark, [(0, 0), (0, 1)]))


def test_condensation_levels(spark):
    # two 2-cycles chained, plus an isolated cross edge and a singleton sink:
    #   {0,1} -> {2,3} -> 4 ;  5 -> 4
    edges = [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2), (3, 4), (5, 4)]
    got = {
        r["component"]: r["level"]
        for r in condensation_levels(_df(spark, edges)).collect()
    }
    assert got == {0: 0, 2: 1, 4: 2, 5: 0}


# ---------------------------------------------------------------------------
# dyad + triad census
# ---------------------------------------------------------------------------

def _census_py(edges):
    """Brute-force census over ALL C(n,3) triples."""
    verts = sorted({v for e in edges for v in e})
    arcs = {(s, d) for s, d in edges if s != d}
    counts: dict[str, int] = {}
    for a, b, c in itertools.combinations(verts, 3):
        local = set()
        idx = {a: 0, b: 1, c: 2}
        for x, y in itertools.permutations((a, b, c), 2):
            if (x, y) in arcs:
                local.add((idx[x], idx[y]))
        t = _type_of(local)
        counts[t] = counts.get(t, 0) + 1
    return counts


def test_triad_census_matches_bruteforce(spark):
    edges = _rand_edges(7, 18, 60)
    got = {
        r["triad_type"]: r["n_triads"]
        for r in triad_census(_df(spark, edges)).collect()
    }
    want = _census_py(edges)
    assert sum(got.values()) == 18 * 17 * 16 // 6
    for t in got:
        assert got[t] == want.get(t, 0), t


def test_triad_census_lookup_is_permutation_invariant():
    # the classifier must not depend on which vertex got which label
    for c12 in range(4):
        for c13 in range(4):
            for c23 in range(4):
                arcs = set()
                for code, (x, y) in zip((c12, c13, c23), [(0, 1), (0, 2), (1, 2)]):
                    if code in (1, 3):
                        arcs.add((x, y))
                    if code in (2, 3):
                        arcs.add((y, x))
                base = LOOKUP[(c12, c13, c23)]
                for perm in itertools.permutations(range(3)):
                    relabeled = {(perm[x], perm[y]) for x, y in arcs}
                    assert _type_of(relabeled) == base


def test_dyad_census_small(spark):
    # 4 vertices: mutual (0,1); asym (1,2), (2,3) → C(4,2)=6 pairs, 3 null
    edges = [(0, 1), (1, 0), (1, 2), (2, 3)]
    row = dyad_census(_df(spark, edges)).collect()[0]
    assert (row["mutual"], row["asym"], row["null_pairs"]) == (1, 2, 3)


# ---------------------------------------------------------------------------
# landmarks
# ---------------------------------------------------------------------------

def _bfs_py(edges, src, reverse=False):
    from collections import deque

    adj = {}
    for s, d in edges:
        if reverse:
            s, d = d, s
        adj.setdefault(s, []).append(d)
    dist = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


def test_landmark_sketch_matches_bfs(spark):
    edges = _rand_edges(23, 30, 70)
    df = _df(spark, edges)
    lms = [r["id"] for r in choose_landmarks(df, 4).collect()]
    assert len(lms) == 4
    rows = landmark_sketch(df, n_landmarks=4).collect()
    got_from = {(r["landmark"], r["id"]): r["d_from"] for r in rows if r["d_from"] is not None}
    got_to = {(r["landmark"], r["id"]): r["d_to"] for r in rows if r["d_to"] is not None}
    want_from = {(l, v): d for l in lms for v, d in _bfs_py(edges, l).items()}
    want_to = {(l, v): d for l in lms for v, d in _bfs_py(edges, l, reverse=True).items()}
    assert got_from == want_from
    assert got_to == want_to


def test_katz_matches_python(spark):
    from tldr_spark.operators.katz import katz_centrality

    edges = _rand_edges(41, 25, 60)
    alpha, n_iter = 1.0 / 64.0, 15
    res = katz_centrality(_df(spark, edges), alpha=alpha, n_iter=n_iter)
    got = {r["id"]: r["katz"] for r in res.scores.collect()}
    # pure-python truncated-walk iteration (weights 1.0 from _df)
    verts = sorted({v for e in edges for v in e})
    x = {v: 1.0 for v in verts}
    for _ in range(n_iter):
        nx = {}
        for v in verts:
            s = sum(x[u] for u, d in edges if d == v)
            nx[v] = 1.0 + alpha * s
        x = nx
    assert set(got) == set(x)
    for v in verts:
        assert got[v] == pytest.approx(x[v], rel=1e-12)


def test_katz_tolerance_stops_early(spark):
    from tldr_spark.operators.katz import katz_centrality

    edges = _rand_edges(41, 25, 60)
    res = katz_centrality(_df(spark, edges), alpha=1.0 / 64.0, n_iter=100, tolerance=1e-9)
    assert res.iterations < 100
    assert res.l1_delta <= 1e-9


def _bipartite_py(edges):
    """2-coloring oracle: component (by min vertex) → is_bipartite."""
    from collections import deque

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    color, out = {}, {}
    for start in sorted(adj):
        if start in color:
            continue
        comp, ok = [start], True
        color[start] = 0
        dq = deque([start])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in color:
                    color[w] = 1 - color[u]
                    comp.append(w)
                    dq.append(w)
                elif color[w] == color[u]:
                    ok = False
        out[min(comp)] = (len(comp), ok)
    return out


def test_bipartite_components(spark):
    from tldr_spark.operators.bipartite import bipartite_components

    # even cycle (bipartite) + triangle (odd) + path (bipartite), disjoint
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12), (12, 10), (20, 21), (21, 22)]
    got = {
        r["component"]: (r["n_vertices"], r["is_bipartite"])
        for r in bipartite_components(_df(spark, edges)).collect()
    }
    assert got == {0: (4, True), 10: (3, False), 20: (3, True)}


def test_bipartite_random_differential(spark):
    from tldr_spark.operators.bipartite import bipartite_components

    edges = _rand_edges(53, 30, 45)
    got = {
        r["component"]: (r["n_vertices"], r["is_bipartite"])
        for r in bipartite_components(_df(spark, edges)).collect()
    }
    assert got == _bipartite_py(edges)


def test_stratified_sample_deterministic_and_stratified(spark):
    from tldr_spark.operators.sampling import hash_sample, stratified_sample

    rows = [(i, "en" if i % 3 == 0 else "de") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = stratified_sample(df, "lang", {"en": 0.5}, "doc_id", default_rate=0.1, salt=3)
    got1 = sorted(r["doc_id"] for r in s1.collect())
    # rerun (and repartition) ⇒ identical sample
    s2 = stratified_sample(
        df.repartition(7), "lang", {"en": 0.5}, "doc_id", default_rate=0.1, salt=3
    )
    assert sorted(r["doc_id"] for r in s2.collect()) == got1
    by_lang = {"en": 0, "de": 0}
    for r in s1.collect():
        by_lang[r["lang"]] += 1
    assert by_lang["en"] == pytest.approx(1000 * 0.5, rel=0.15)
    assert by_lang["de"] == pytest.approx(2000 * 0.1, rel=0.3)
    # python mirror of the hash: exact membership, not just counts
    M, A = 2_147_483_647, 48271
    want = [
        i for i, lang in rows
        if (((i + 3) % M) * A) % M % 1_000_000 < (500_000 if lang == "en" else 100_000)
    ]
    assert got1 == want
    # different salts give (near-)independent streams
    h0 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2, salt=0).collect()}
    h9 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2, salt=999).collect()}
    assert h0 != h9


def test_reservoir_per_key(spark):
    from tldr_spark.operators.sampling import reservoir_per_key

    rows = [(i, "en" if i % 3 == 0 else "de") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = reservoir_per_key(df, ["lang"], 4, "doc_id", salt=2).collect()
    by_lang: dict[str, list[int]] = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 4, "de": 4}
    # exact membership: bottom-4 by the Lehmer hash, tie by id
    M, A = 2_147_483_647, 48271
    h = lambda i: ((((i + 2) % M) * A) % M % 1_000_000, i)  # noqa: E731
    for lang in ("en", "de"):
        ids = [i for i, l in rows if l == lang]
        want = sorted(sorted(ids, key=h)[:4])
        assert sorted(by_lang[lang]) == want
    # repartitioning does not change the sample
    got2 = reservoir_per_key(df.repartition(13), ["lang"], 4, "doc_id", salt=2).collect()
    assert sorted((r["lang"], r["doc_id"]) for r in got2) == sorted(
        (r["lang"], r["doc_id"]) for r in got
    )


def test_rich_club_matches_bruteforce(spark):
    from tldr_spark.operators.richclub import rich_club

    edges = _rand_edges(61, 24, 70)
    ks = [0, 1, 2, 3, 5, 8]
    got = {
        r["k"]: (r["n_rich"], r["e_rich"], r["phi"])
        for r in rich_club(_df(spark, edges), ks).collect()
    }
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in ks:
        rich = {v for v, dv in deg.items() if dv > k}
        e_k = sum(1 for a, b in und if a in rich and b in rich)
        if len(rich) < 2:
            assert k not in got
            continue
        n_k = len(rich)
        assert got[k][0] == n_k and got[k][1] == e_k
        assert got[k][2] == pytest.approx(2.0 * e_k / (n_k * (n_k - 1)), rel=1e-12)


def test_attribute_assortativity_matches_python(spark):
    from tldr_spark.operators.stats import attribute_assortativity, attribute_mixing_matrix

    edges = _rand_edges(71, 30, 80)
    attr_of = lambda v: ["red", "green", "blue"][v % 3]  # noqa: E731
    attrs = spark.createDataFrame(
        [(v, attr_of(v)) for v in range(30)], "id long, attr string"
    )
    df = _df(spark, edges)
    mm = {
        (r["attr_src"], r["attr_dst"]): r["n_edges"]
        for r in attribute_mixing_matrix(df, attrs).collect()
    }
    want_mm: dict[tuple[str, str], int] = {}
    simple = {(s, d) for s, d in edges if s != d}
    for s, d in simple:
        k = (attr_of(s), attr_of(d))
        want_mm[k] = want_mm.get(k, 0) + 1
    assert mm == want_mm
    row = attribute_assortativity(df, attrs).collect()[0]
    m = sum(want_mm.values())
    trace = sum(v for (a, b), v in want_mm.items() if a == b)
    cats = {c for k in want_mm for c in k}
    sum_ab = sum(
        sum(v for (a, _), v in want_mm.items() if a == c)
        * sum(v for (_, b), v in want_mm.items() if b == c)
        for c in cats
    )
    assert (row["m"], row["trace"], row["sum_ab"]) == (m, trace, sum_ab)
    assert row["assortativity"] == pytest.approx(
        (m * trace - sum_ab) / (m * m - sum_ab), rel=1e-12
    )
    # perfectly assortative graph → r == 1
    iso_edges = [(0, 3), (3, 6), (1, 4), (2, 5)]  # all same attr (mod 3) ends
    r1 = attribute_assortativity(_df(spark, iso_edges), attrs).collect()[0]
    assert r1["assortativity"] == pytest.approx(1.0)


def _jp_py(edges, salt):
    """Pure-Python Jones-Plassmann mirror (same Lehmer priorities)."""
    M, A = 2_147_483_647, 48271
    pri = lambda v: ((((v + salt) % M) * A) % M % 1_000_000, v)  # noqa: E731
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    color: dict[int, int] = {}
    unc = set(adj)
    rounds = 0
    while unc:
        rounds += 1
        winners = [
            v for v in unc if all(pri(v) > pri(w) for w in adj[v] if w in unc)
        ]
        for v in winners:
            used = {color[w] for w in adj[v] if w in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        unc -= set(winners)
    return color, rounds


def test_greedy_coloring_matches_python_mirror(spark):
    from tldr_spark.operators.coloring import jones_plassmann_coloring

    edges = _rand_edges(83, 28, 80)
    res = jones_plassmann_coloring(_df(spark, edges), salt=9)
    got = {r["id"]: r["color"] for r in res.colors.collect()}
    want, want_rounds = _jp_py(edges, 9)
    assert got == want
    assert res.rounds == want_rounds
    # proper coloring + dense color range
    for s, d in edges:
        if s != d:
            assert got[s] != got[d]
    assert res.n_colors == max(got.values()) + 1
    deg: dict[int, int] = {}
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert res.n_colors <= max(deg.values()) + 1


def test_greedy_coloring_rejects_self_loop(spark):
    from tldr_spark.operators.coloring import jones_plassmann_coloring

    with pytest.raises(ValueError):
        jones_plassmann_coloring(_df(spark, [(1, 1), (1, 2)]))


def test_landmark_estimates_are_upper_bounds_and_tight_via_landmark(spark):
    edges = _rand_edges(31, 25, 55)
    df = _df(spark, edges)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a != b], "src long, dst long"
    )
    est = {
        (r["src"], r["dst"]): r["est_dist"]
        for r in landmark_distance_estimates(df, pairs, n_landmarks=4).collect()
    }
    lms = [r["id"] for r in choose_landmarks(df, 4).collect()]
    for (u, v), e in est.items():
        du = _bfs_py(edges, u)
        # upper bound on the true distance (when v is reachable at all)
        if v in du:
            assert e >= du[v]
        # and exactly min over landmarks of d(u→l)+d(l→v)
        best = None
        dv_from = {l: _bfs_py(edges, l).get(v) for l in lms}
        for l in lms:
            a = du.get(l)
            b = dv_from[l]
            if a is not None and b is not None:
                best = min(best, a + b) if best is not None else a + b
        assert e == best


# ---------------------------------------------------------------------------
# exact diameter (iFUB)
# ---------------------------------------------------------------------------

def _diameter_py(edges):
    """Brute force: (component_label, n, diameter) of the largest und CC."""
    from collections import deque

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    seen: set[int] = set()
    comps = []
    for v in sorted(adj):
        if v in seen:
            continue
        comp = {v}
        dq = deque([v])
        seen.add(v)
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    comp.add(w)
                    dq.append(w)
        comps.append(comp)
    best = max(comps, key=lambda c: (len(c), -min(c)))
    diam = 0
    for s in best:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        diam = max(diam, max(dist.values()))
    return min(best), len(best), diam


@pytest.mark.parametrize("seed,n,m", [(91, 30, 50), (92, 40, 60), (93, 25, 28)])
def test_exact_diameter_matches_bruteforce(spark, seed, n, m):
    from tldr_spark.operators.diameter import exact_diameter

    edges = _rand_edges(seed, n, m)
    r = exact_diameter(_df(spark, edges))
    assert (r.component, r.n_vertices, r.diameter) == _diameter_py(edges)


def test_exact_diameter_path_graph(spark):
    # the adversarial shape for iFUB: still exact, just more floods
    from tldr_spark.operators.diameter import exact_diameter

    edges = [(i, i + 1) for i in range(12)]
    r = exact_diameter(_df(spark, edges))
    assert (r.n_vertices, r.diameter) == (13, 12)
    assert r.floods >= 2


def test_exact_diameter_picks_largest_component(spark):
    from tldr_spark.operators.diameter import exact_diameter

    # small triangle + bigger path: must report the path's diameter
    edges = [(100, 101), (101, 102), (102, 100), (0, 1), (1, 2), (2, 3), (3, 4)]
    r = exact_diameter(_df(spark, edges))
    assert (r.component, r.n_vertices, r.diameter) == (0, 5, 4)


# ---------------------------------------------------------------------------
# truss decomposition + power-law alpha
# ---------------------------------------------------------------------------

def _trussness_py(edges):
    """Brute force: peel at k=3,4,... recomputing support each wave."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    truss: dict[tuple[int, int], int] = {}
    cur = set(und)
    k = 2
    while cur:
        k += 1
        while True:
            adj: dict[int, set[int]] = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {
                (a, b): len(adj[a] & adj[b]) for a, b in cur
            }
            drop = {e for e in cur if sup[e] < k - 2}
            if not drop:
                break
            cur -= drop
        # edges of the (k-1)-truss not in the k-truss... recompute:
        # peel happened in place; dropped edges this level get k-1
        dropped_this_level = {e for e in und if e not in cur and e not in truss}
        for e in dropped_this_level:
            truss[e] = k - 1
    return truss


def test_truss_decomposition_matches_bruteforce(spark):
    from tldr_spark.operators.triangles import k_truss, truss_decomposition

    edges = _rand_edges(97, 20, 80)
    res = truss_decomposition(_df(spark, edges))
    got = {(r["a"], r["b"]): r["trussness"] for r in res.trussness.collect()}
    want = _trussness_py(edges)
    assert got == want
    assert res.max_k == max(want.values())
    # consistency with the single-k operator: trussness >= 3 edges == 3-truss
    t3 = {
        (r["a"], r["b"])
        for r in k_truss(_df(spark, edges), 3).edges.collect()
    }
    assert {e for e, t in got.items() if t >= 3} == t3


def test_powerlaw_alpha_matches_python(spark):
    import math

    from tldr_spark.operators.stats import powerlaw_alpha

    edges = _rand_edges(99, 40, 200)
    row = powerlaw_alpha(_df(spark, edges), d_min=2, direction="in").collect()[0]
    indeg: dict[int, int] = {}
    for _, d in {(s, d) for s, d in edges if s != d}:
        indeg[d] = indeg.get(d, 0) + 1
    tail = [d for d in indeg.values() if d >= 2]
    alpha = 1.0 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert row["n_tail"] == len(tail)
    assert row["alpha"] == pytest.approx(alpha, rel=1e-12)


def test_walk_pmi_matches_python(spark):
    import math

    from tldr_spark.operators.walks import random_walks, walk_pmi_pairs

    edges = _rand_edges(13, 20, 60)
    df = _df(spark, edges)
    walks = random_walks(df, walk_length=6, walks_per_vertex=2).collect()
    # python mirror of the pair/marginal algebra over the SAME walks
    t = len(walks)
    occ: dict[int, int] = {}
    by_walk: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for r in walks:
        occ[r["vertex"]] = occ.get(r["vertex"], 0) + 1
        by_walk.setdefault((r["start"], r["walk"]), []).append((r["step"], r["vertex"]))
    pairs: dict[tuple[int, int], int] = {}
    for seq in by_walk.values():
        seq.sort()
        for i, (sa, va) in enumerate(seq):
            for sb, vb in seq[i + 1:]:
                if sb - sa > 2:
                    break
                if va != vb:
                    k = (min(va, vb), max(va, vb))
                    pairs[k] = pairs.get(k, 0) + 1
    p = sum(pairs.values())
    want = {
        k: (n, math.log(n * float(t) * t / (float(p) * occ[k[0]] * occ[k[1]])))
        for k, n in pairs.items()
        if n >= 2
    }
    got = {
        (r["u"], r["v"]): (r["n_uv"], r["pmi"])
        for r in walk_pmi_pairs(df, window=2, walk_length=6, walks_per_vertex=2).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)


def test_vertex_reciprocity_matches_python(spark):
    from tldr_spark.operators.stats import vertex_reciprocity

    edges = _rand_edges(17, 25, 90)
    simple = {(s, d) for s, d in edges if s != d}
    got = {
        r["vertex"]: (r["out_deg"], r["n_reciprocal"], r["reciprocity"])
        for r in vertex_reciprocity(_df(spark, edges)).collect()
    }
    outd: dict[int, int] = {}
    rec: dict[int, int] = {}
    for s, d in simple:
        outd[s] = outd.get(s, 0) + 1
        if (d, s) in simple:
            rec[s] = rec.get(s, 0) + 1
    assert set(got) == set(outd)
    for v in outd:
        assert got[v][0] == outd[v]
        assert got[v][1] == rec.get(v, 0)
        assert got[v][2] == pytest.approx(rec.get(v, 0) / outd[v], rel=1e-12)


def _simrank_py(edges, c=0.8, iterations=3, min_cocite=1, max_in_degree=0):
    """Independent mirror of the truncated algebra: frozen cocitation
    support, s read as 0 off-support, diagonal fixed at 1."""
    simple = {(s, d) for s, d in edges if s != d}
    inn: dict[int, set[int]] = {}
    for s, d in simple:
        inn.setdefault(d, set()).add(s)
    if max_in_degree > 0:
        inn = {v: ns for v, ns in inn.items() if len(ns) <= max_in_degree}
    vs = sorted(inn)
    support = {}
    for i, a in enumerate(vs):
        for b in vs[i + 1 :]:
            cab = len(inn[a] & inn[b])
            if cab >= min_cocite:
                support[(a, b)] = cab
    s = {
        p: c * cab / (len(inn[p[0]]) * len(inn[p[1]]))
        for p, cab in support.items()
    }
    for _ in range(iterations - 1):
        nxt = {}
        for (a, b), cab in support.items():
            off = sum(
                s.get((min(i, j), max(i, j)), 0.0)
                for i in inn[a]
                for j in inn[b]
                if i != j
            )
            nxt[(a, b)] = c * (cab + off) / (len(inn[a]) * len(inn[b]))
        s = nxt
    return s


def test_simrank_matches_python(spark):
    from tldr_spark.operators.simrank import simrank

    edges = _rand_edges(23, 30, 140)
    want = _simrank_py(edges, c=0.8, iterations=3)
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in simrank(_df(spark, edges), c=0.8, iterations=3).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_simrank_exact_on_shared_hub(spark):
    """Two leaves fed only by the same two hubs: the truncation is exact
    there and the textbook closed form applies at k=1 (all in-neighbor
    pairs of (4,5) are diagonal or the non-co-cited hub pair)."""
    from tldr_spark.operators.simrank import simrank

    edges = [(1, 4), (1, 5), (2, 4), (2, 5), (3, 1)]
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in simrank(_df(spark, edges), c=0.8, iterations=3).collect()
    }
    # I(4)=I(5)={1,2}; hubs 1,2 never co-cited so s(1,2)=0 at every k:
    # s(4,5) = 0.8*(2 + 0)/(2*2) = 0.4, stable across iterations
    assert got[(4, 5)] == pytest.approx(0.4, rel=1e-12)
    assert set(got) == {(4, 5)}


def test_simrank_prunes_and_min_iter(spark):
    from tldr_spark.operators.simrank import simrank

    edges = _rand_edges(29, 20, 80)
    want = _simrank_py(edges, c=0.8, iterations=2, min_cocite=2, max_in_degree=5)
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in simrank(
            _df(spark, edges), c=0.8, iterations=2, min_cocite=2, max_in_degree=5
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    with pytest.raises(ValueError):
        simrank(_df(spark, edges), iterations=0)


def _matching_py(edges, max_rounds=64):
    """Independent mirror of the local-min-edge elimination."""
    M, A = 2_147_483_647, 48271
    alive = {}
    for s, d in edges:
        if s != d:
            a, b = min(s, d), max(s, d)
            alive[(a, b)] = ((((a % M) * A) % M + b % M) % M * A) % M
    out = {}
    rounds = 0
    while alive:
        assert rounds < max_rounds
        rounds += 1
        vmin: dict[int, tuple] = {}
        for (a, b), p in alive.items():
            for v in (a, b):
                k = (p, a, b)
                if v not in vmin or k < vmin[v]:
                    vmin[v] = k
        win = [
            (a, b)
            for (a, b), p in alive.items()
            if vmin[a] == (p, a, b) and vmin[b] == (p, a, b)
        ]
        for a, b in win:
            out[(a, b)] = rounds
        gone = {v for ab in win for v in ab}
        alive = {e: p for e, p in alive.items() if e[0] not in gone and e[1] not in gone}
    return out, rounds


def test_maximal_matching_matches_python(spark):
    from tldr_spark.operators.matching import maximal_matching

    edges = _rand_edges(31, 40, 200)
    want, want_rounds = _matching_py(edges)
    r = maximal_matching(_df(spark, edges))
    got = {(x["a"], x["b"]): x["matched_round"] for x in r.pairs.collect()}
    assert got == want
    assert r.rounds == want_rounds


def test_maximal_matching_invariants(spark):
    """Matching (no shared vertex) + maximality (every edge hits a matched
    vertex) + negative-id safety."""
    from tldr_spark.operators.matching import maximal_matching

    edges = [(s - 15, d - 15) for s, d in _rand_edges(37, 30, 120)]
    r = maximal_matching(_df(spark, edges))
    pairs = [(x["a"], x["b"]) for x in r.pairs.collect()]
    seen: set[int] = set()
    for a, b in pairs:
        assert a not in seen and b not in seen
        seen.update((a, b))
    for s, d in edges:
        if s != d:
            assert s in seen or d in seen
    want, _ = _matching_py(edges)
    assert set(pairs) == set(want)


def test_vertex_cover_2approx(spark):
    """Cover = matched endpoints; covers every edge; round provenance."""
    from tldr_spark.operators.matching import maximal_matching, vertex_cover_2approx

    edges = _rand_edges(43, 35, 150)
    r = maximal_matching(_df(spark, edges))
    cover = {x["v"]: x["matched_round"] for x in vertex_cover_2approx(r).collect()}
    want, _ = _matching_py(edges)
    want_cover = {}
    for (a, b), rd in want.items():
        want_cover[a] = rd
        want_cover[b] = rd
    assert cover == want_cover
    for s, d in edges:
        if s != d:
            assert s in cover or d in cover


def _msf_kruskal(edges):
    """Independent Kruskal mirror under the (w, a, b) total order."""
    M, A = 2_147_483_647, 48271
    ce = {}
    for s, d in edges:
        if s != d:
            a, b = min(s, d), max(s, d)
            ce[(a, b)] = ((((a % M) * A) % M + b % M) % M * A) % M
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = {}
    for (a, b), w in sorted(ce.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out[(a, b)] = w
    return out


def _msf_boruvka_rounds(edges):
    """Independent Borůvka mirror: per-round chosen-edge sets (the round
    an edge joins depends only on the component partition, so this pins
    the engine's boruvka_round without mirroring its contraction)."""
    M, A = 2_147_483_647, 48271
    ce = {}
    for s, d in edges:
        if s != d:
            a, b = min(s, d), max(s, d)
            ce[(a, b)] = ((((a % M) * A) % M + b % M) % M * A) % M
    comp = {v: v for ab in ce for v in ab}

    def find(x):
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    rounds = {}
    rn = 0
    while True:
        best = {}
        for (a, b), w in ce.items():
            ca, cb = find(a), find(b)
            if ca == cb:
                continue
            key = (w, a, b)
            for c in (ca, cb):
                if c not in best or key < best[c]:
                    best[c] = key
        if not best:
            return rounds, rn
        rn += 1
        for w, a, b in set(best.values()):
            rounds[(a, b)] = (w, rn)
            ra, rb = find(a), find(b)
            if ra != rb:
                comp[ra] = rb


def test_msf_matches_kruskal_and_boruvka_rounds(spark):
    from tldr_spark.operators.msf import minimum_spanning_forest

    edges = _rand_edges(53, 60, 300)
    r = minimum_spanning_forest(_df(spark, edges))
    got = {(x["a"], x["b"]): (x["w"], x["boruvka_round"]) for x in r.edges.collect()}
    want_set = _msf_kruskal(edges)
    assert {k: v[0] for k, v in got.items()} == want_set
    want_rounds, want_rn = _msf_boruvka_rounds(edges)
    assert got == want_rounds
    assert r.rounds == want_rn


def test_msf_forest_invariants(spark):
    """Acyclic + spanning: |F| = V − #components, and F connects exactly
    the components of the input graph; negative ids safe."""
    from tldr_spark.operators.msf import minimum_spanning_forest

    edges = [(s - 20, d - 20) for s, d in _rand_edges(59, 40, 90)]
    r = minimum_spanning_forest(_df(spark, edges))
    fe = [(x["a"], x["b"]) for x in r.edges.collect()]
    verts = {v for s, d in edges if s != d for v in (s, d)}
    # component count of the input graph (python union-find)
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        if s != d:
            parent[find(s)] = find(d)
    n_comp = len({find(v) for v in verts})
    assert len(fe) == len(verts) - n_comp
    # the forest reproduces the same partition
    fparent = {v: v for v in verts}

    def ffind(x):
        while fparent[x] != x:
            fparent[x] = fparent[fparent[x]]
            x = fparent[x]
        return x

    for a, b in fe:
        assert ffind(a) != ffind(b)  # acyclic
        fparent[ffind(a)] = ffind(b)
    def groups(root):
        g = {}
        for v in verts:
            g.setdefault(root(v), set()).add(v)
        return {frozenset(s) for s in g.values()}

    assert groups(find) == groups(ffind)  # identical partitions


def test_msf_weighted_matches_kruskal(spark):
    """Real weights (heavy ties — only 3 distinct values) broken by
    (a, b); reversed duplicates collapse to their minimum weight."""
    from tldr_spark.operators.msf import minimum_spanning_forest

    import random

    rng = random.Random(79)
    rows = []
    for s, d in _rand_edges(79, 45, 180):
        rows.append((s, d, float(rng.randint(1, 3))))
        if rng.random() < 0.3:
            rows.append((d, s, float(rng.randint(1, 3))))  # reversed dup
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    r = minimum_spanning_forest(df, weight_col="weight")
    got = {(x["a"], x["b"]): x["w"] for x in r.edges.collect()}
    # python Kruskal under the (w, a, b) order with min-collapsed weights
    ce = {}
    for s, d, w in rows:
        if s != d:
            a, b = min(s, d), max(s, d)
            ce[(a, b)] = min(ce.get((a, b), w), w)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = {}
    for (a, b), w in sorted(ce.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            want[(a, b)] = w
    assert got == want


def test_msf_empty_and_selfloops(spark):
    from tldr_spark.operators.msf import minimum_spanning_forest

    r = minimum_spanning_forest(_df(spark, [(7, 7)]))
    assert r.edges.count() == 0 and r.rounds == 0


def _df_ids(spark, ids):
    return spark.createDataFrame([(int(v),) for v in ids], "id long")


def _hitting_py(edges, targets, iters):
    """Exact value-iteration mirror of hitting_time."""
    sd = {(s, d) for s, d in edges if s != d}
    out = {}
    verts = set()
    for s, d in sd:
        out.setdefault(s, []).append(d)
        verts.update((s, d))
    t = set(targets) & verts
    h = {v: 0.0 for v in verts}
    for _ in range(iters):
        nh = {}
        for v in verts:
            if v in t:
                nh[v] = 0.0
            elif v in out:
                nh[v] = 1.0 + sum(h[u] for u in out[v]) / len(out[v])
            else:
                nh[v] = 1.0 + h[v]
        h = nh
    return h


def test_hitting_time_matches_python(spark):
    from tldr_spark.operators.hitting import hitting_time

    edges = _rand_edges(83, 30, 90)
    targets = [v for v in range(30) if v % 7 == 0]
    got = {
        x["id"]: x["hit"]
        for x in hitting_time(
            _df(spark, edges), _df_ids(spark, targets), iterations=12
        ).collect()
    }
    want = _hitting_py(edges, targets, 12)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12, abs=1e-12)


def test_hitting_time_semantics(spark):
    """Targets pin to 0; a path feeding a target counts exact steps up to
    the horizon; dangling vertices walk in place."""
    from tldr_spark.operators.hitting import hitting_time

    #  3 → 2 → 1 → 0(target);  9 isolated-dangling via (9→8) with 8 dangling
    edges = [(3, 2), (2, 1), (1, 0), (9, 8)]
    got = {
        x["id"]: x["hit"]
        for x in hitting_time(
            _df(spark, edges), _df_ids(spark, [0]), iterations=10
        ).collect()
    }
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] == 2.0 and got[3] == 3.0
    assert got[8] == 10.0 and got[9] == 10.0  # stuck walks saturate at K
    with pytest.raises(ValueError):
        hitting_time(_df(spark, edges), _df_ids(spark, [0]), iterations=0)


def _spreading_py(edges, seeds, iters):
    """Exact mirror of clamped synchronous label spreading."""
    und = {}
    for s, d in edges:
        if s != d:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
    seed_cls = {}
    for v, c in seeds:
        if v in und:
            seed_cls[v] = min(c, seed_cls.get(v, c))
    cls = {v: seed_cls.get(v) for v in und}
    for _ in range(iters):
        nxt = {}
        for v in und:
            if v in seed_cls:
                nxt[v] = seed_cls[v]
                continue
            counts = {}
            for u in und[v]:
                if cls[u] is not None:
                    counts[cls[u]] = counts.get(cls[u], 0) + 1
            if counts:
                nxt[v] = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            else:
                nxt[v] = cls[v]
        cls = nxt
    return {v: c for v, c in cls.items() if c is not None}


def test_seeded_spreading_matches_python(spark):
    from tldr_spark.operators.spreading import seeded_label_spreading

    edges = _rand_edges(97, 40, 110)
    seeds = [(v, v % 3) for v in range(0, 40, 9)]
    sdf = spark.createDataFrame(seeds, "id long, cls long")
    got = {
        x["id"]: x["cls"]
        for x in seeded_label_spreading(_df(spark, edges), sdf, iterations=6).collect()
    }
    assert got == _spreading_py(edges, seeds, 6)


def test_seeded_spreading_semantics(spark):
    """Clamping beats the neighbourhood; unlabeled islands stay out;
    duplicate seeds collapse to min class."""
    from tldr_spark.operators.spreading import seeded_label_spreading

    #  path 0-1-2 seeded at 0; disconnected pair 8-9 unseeded
    edges = [(0, 1), (1, 2), (8, 9)]
    sdf = spark.createDataFrame([(0, 4), (0, 2)], "id long, cls long")
    got = {
        x["id"]: x["cls"]
        for x in seeded_label_spreading(_df(spark, edges), sdf, iterations=5).collect()
    }
    assert got == {0: 2, 1: 2, 2: 2}  # min duplicate class wins, spreads
    with pytest.raises(ValueError):
        seeded_label_spreading(_df(spark, edges), sdf, iterations=0)


def _wl_py(edges, rounds):
    """Exact 1-WL mirror (min-member class names)."""
    und = {}
    for s, d in edges:
        if s != d:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
    col = {v: 0 for v in und}
    for _ in range(rounds):
        sig = {v: (col[v], tuple(sorted(col[u] for u in und[v]))) for v in und}
        rep = {}
        for v in und:
            rep[sig[v]] = min(rep.get(sig[v], v), v)
        col = {v: rep[sig[v]] for v in und}
    return col


def test_wl_matches_python(spark):
    from tldr_spark.operators.wl import wl_colors

    edges = _rand_edges(101, 36, 80)
    got = {x["id"]: x["color"] for x in wl_colors(_df(spark, edges), rounds=3).collect()}
    assert got == _wl_py(edges, 3)
    # hashed signatures refine identically (collision-free at this size)
    hashed = {
        x["id"]: x["color"]
        for x in wl_colors(_df(spark, edges), rounds=3, hash_signatures=True).collect()
    }
    assert hashed == got


def test_wl_closed_forms(spark):
    """A cycle stays color-uniform; a star separates center from leaves
    in one round and refines no further."""
    from tldr_spark.operators.wl import wl_colors

    cyc = [(i, (i + 1) % 7) for i in range(7)]
    got = {x["id"]: x["color"] for x in wl_colors(_df(spark, cyc), rounds=4).collect()}
    assert set(got.values()) == {0}
    star = [(0, i) for i in range(1, 6)]
    got = {x["id"]: x["color"] for x in wl_colors(_df(spark, star), rounds=2).collect()}
    assert got[0] == 0 and all(got[i] == 1 for i in range(1, 6))
    with pytest.raises(ValueError):
        wl_colors(_df(spark, star), rounds=0)


def _earliest_py(tedges, seeds):
    """Exact earliest-arrival mirror (label-correcting relaxation)."""
    arr = {s: -1 for s in seeds}
    changed = True
    while changed:
        changed = False
        for s, d, t in tedges:
            if s in arr and t >= arr[s] and t < arr.get(d, float("inf")):
                arr[d] = t
                changed = True
    return arr


def test_earliest_arrival_matches_python(spark):
    from tldr_spark.operators.temporal import earliest_arrival

    import random

    rng = random.Random(103)
    tedges = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(100)) for _ in range(120)
    ]
    tedges = [(s, d, t) for s, d, t in tedges if s != d]
    tdf = spark.createDataFrame(tedges, "src long, dst long, t long")
    seeds = [0, 5]
    got = {
        x["id"]: x["arrival_us"]
        for x in earliest_arrival(tdf, _df_ids(spark, seeds)).collect()
    }
    assert got == _earliest_py(tedges, seeds)


def test_earliest_arrival_time_respecting(spark):
    """A path whose second hop happens BEFORE the first is not traversable;
    reversing the times makes it so."""
    from tldr_spark.operators.temporal import earliest_arrival

    bad = spark.createDataFrame([(0, 1, 10), (1, 2, 5)], "src long, dst long, t long")
    got = {
        x["id"]: x["arrival_us"]
        for x in earliest_arrival(bad, _df_ids(spark, [0])).collect()
    }
    assert got == {0: -1, 1: 10}  # 2 unreachable: its edge left at t=5 < 10
    ok = spark.createDataFrame([(0, 1, 5), (1, 2, 10)], "src long, dst long, t long")
    got = {
        x["id"]: x["arrival_us"]
        for x in earliest_arrival(ok, _df_ids(spark, [0])).collect()
    }
    assert got == {0: -1, 1: 5, 2: 10}


def test_latest_departure_matches_python(spark):
    from tldr_spark.operators.temporal import LATEST_SENTINEL, latest_departure

    import random

    rng = random.Random(127)
    tedges = [
        (rng.randrange(18), rng.randrange(18), rng.randrange(60)) for _ in range(90)
    ]
    tedges = [(s, d, t) for s, d, t in tedges if s != d]
    tdf = spark.createDataFrame(tedges, "src long, dst long, t long")
    targets = [2, 9]
    got = {
        x["id"]: x["departure_us"]
        for x in latest_departure(tdf, _df_ids(spark, targets)).collect()
    }
    ld = {t: LATEST_SENTINEL for t in targets}
    changed = True
    while changed:
        changed = False
        for s, d, t in tedges:
            if d in ld and t <= ld[d] and t > ld.get(s, -1):
                ld[s] = t
                changed = True
    assert got == ld


def test_latest_departure_duality(spark):
    """On the two-hop chain the duals agree on traversability."""
    from tldr_spark.operators.temporal import LATEST_SENTINEL, latest_departure

    ok = spark.createDataFrame([(0, 1, 5), (1, 2, 10)], "src long, dst long, t long")
    got = {
        x["id"]: x["departure_us"]
        for x in latest_departure(ok, _df_ids(spark, [2])).collect()
    }
    assert got == {2: LATEST_SENTINEL, 1: 10, 0: 5}
    bad = spark.createDataFrame([(0, 1, 10), (1, 2, 5)], "src long, dst long, t long")
    got = {
        x["id"]: x["departure_us"]
        for x in latest_departure(bad, _df_ids(spark, [2])).collect()
    }
    assert got == {2: LATEST_SENTINEL, 1: 5}  # 0 cannot reach 2 in time


def test_clickstream_edges_derivation(spark):
    """Per-user LAG ordering by (ts, event_id); self-transitions dropped;
    sampling is on event_id."""
    from tldr_spark.operators.temporal import clickstream_edges

    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: events 0, 7, 14 (sample_mod=7) → pages 7, 924%211, 1841%211
        (0, base, 1, "click", 0.0, "{}"),
        (7, base + datetime.timedelta(minutes=1), 1, "click", 0.0, "{}"),
        (14, base + datetime.timedelta(minutes=2), 1, "click", 0.0, "{}"),
        (3, base, 2, "click", 0.0, "{}"),  # not sampled
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = sorted(
        (x["src"], x["dst"], x["t"])
        for x in clickstream_edges(ev, sample_mod=7).collect()
    )
    p = lambda eid: (eid * 131 + 7) % 211
    us = lambda m: int((base + datetime.timedelta(minutes=m)).timestamp() * 1_000_000)
    assert got == sorted([(p(0), p(7), us(1)), (p(7), p(14), us(2))])


def _partition_py(edges, n_parts, rounds):
    """Exact mirror of the synchronous plurality-move refinement."""
    und = {}
    for s, d in edges:
        if s != d:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
    p = {v: v % n_parts for v in und}
    for _ in range(rounds):
        sz = {}
        for v in und:
            sz[p[v]] = sz.get(p[v], 0) + 1
        np_ = {}
        for v in und:
            c = {}
            for u in und[v]:
                c[p[u]] = c.get(p[u], 0) + 1
            np_[v] = max(c, key=lambda q: (c[q], -sz[q], -q))
        p = np_
    return p


def test_balanced_partition_matches_python(spark):
    from tldr_spark.operators.partition import balanced_partition

    edges = _rand_edges(107, 42, 130)
    got = {
        x["id"]: x["part"]
        for x in balanced_partition(_df(spark, edges), n_parts=5, rounds=3).collect()
    }
    assert got == _partition_py(edges, 5, 3)


def test_partition_refinement_cuts_edges(spark):
    """Refinement must not leave more cut edges than the hash start on a
    graph of two dense cliques bridged by one edge; parts stay in range."""
    from tldr_spark.operators.partition import balanced_partition, edge_cut

    cl = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    cl += [(i, j) for i in range(10, 18) for j in range(i + 1, 18)]
    cl.append((0, 10))
    df = _df(spark, cl)
    h = balanced_partition(df, n_parts=4, rounds=0)
    r = balanced_partition(df, n_parts=4, rounds=4)
    cut_h = edge_cut(df, h).first()
    cut_r = edge_cut(df, r).first()
    assert cut_r["n_edges"] == cut_h["n_edges"] == len(cl)
    assert cut_r["n_cut"] <= cut_h["n_cut"]
    assert cut_r["n_cut"] <= 1  # two cliques collapse to one part each
    parts = {x["part"] for x in r.collect()}
    assert parts <= set(range(4))
    with pytest.raises(ValueError):
        balanced_partition(df, n_parts=0)


def _push_py(edges, seeds, rounds):
    """Exact integer mirror of the forward push (alpha=1/4, SCALE 2^40,
    THRESHOLD 2^16, floor division, remainder retained)."""
    SCALE, T = 1 << 40, 1 << 16
    sd = {(s, d) for s, d in edges if s != d}
    out = {}
    verts = set()
    for s, d in sd:
        out.setdefault(s, []).append(d)
        verts.update((s, d))
    sl = sorted(set(seeds) & verts)
    p = {v: 0 for v in verts}
    r = {v: SCALE // len(sl) if v in sl else 0 for v in verts}
    for _ in range(rounds):
        act = [v for v in verts if v in out and r[v] > T * len(out[v])]
        inc = {}
        for v in act:
            d = len(out[v])
            gain = r[v] // 4
            spread = r[v] - gain
            q, leftover = spread // d, spread - (spread // d) * d
            p[v] += gain
            r[v] = leftover
            for u in out[v]:
                inc[u] = inc.get(u, 0) + q
        for u, x in inc.items():
            r[u] += x
    return p, r


def test_ppr_push_matches_python(spark):
    from tldr_spark.operators.ppr_push import SCALE, ppr_push

    edges = _rand_edges(109, 30, 110)
    seeds = [0, 7, 14]
    res = ppr_push(_df(spark, edges), _df_ids(spark, seeds), rounds=6)
    got = {x["id"]: (x["p_units"], x["r_units"]) for x in res.mass.collect()}
    p, r = _push_py(edges, seeds, 6)
    want = {v: (p[v], r[v]) for v in p if p[v] > 0 or r[v] > 0}
    assert got == want
    # exact mass conservation: floors retain remainders, nothing leaks
    n = len({v for s, d in edges if s != d for v in (s, d)} & set(seeds))
    assert sum(a + b for a, b in got.values()) == (SCALE // n) * n


def test_ppr_push_convergence_mode(spark):
    # a high threshold converges in a handful of rounds — the loop logic
    # is what's under test, the default-threshold depth is bench's job
    T = 1 << 34

    from tldr_spark.operators.ppr_push import ppr_push

    edges = _rand_edges(113, 25, 70)
    res = ppr_push(_df(spark, edges), _df_ids(spark, [1]), threshold=T)
    assert res.converged
    # frontier is truly empty: every vertex is at/below its threshold
    deg = {}
    for s, d in {(s, d) for s, d in edges if s != d}:
        deg[s] = deg.get(s, 0) + 1
    for x in res.mass.collect():
        assert x["r_units"] <= T * deg.get(x["id"], 0) or deg.get(x["id"], 0) == 0
    with pytest.raises(ValueError):
        ppr_push(_df(spark, edges), _df_ids(spark, [99999]))


def _domset_py(edges, max_rounds=64):
    """Exact mirror of the local-max coverage elimination."""
    closed = {}
    for s, d in edges:
        if s != d:
            closed.setdefault(s, {s}).add(d)
            closed.setdefault(d, {d}).add(s)
    unc = set(closed)
    out = {}
    rounds = 0
    while unc:
        assert rounds < max_rounds
        rounds += 1
        cov = {v: len(closed[v] & unc) for v in closed}
        cov = {v: c for v, c in cov.items() if c > 0}
        win = [
            v
            for v in cov
            if (cov[v], -v) == max((cov[w], -w) for w in closed[v] if w in cov)
        ]
        for v in win:
            out[v] = rounds
            unc -= closed[v]
    return out, rounds


def test_dominating_set_matches_python(spark):
    from tldr_spark.operators.domset import dominating_set

    edges = _rand_edges(131, 38, 100)
    r = dominating_set(_df(spark, edges))
    got = {x["id"]: x["round_added"] for x in r.members.collect()}
    want, want_rounds = _domset_py(edges)
    assert got == want and r.rounds == want_rounds


def test_dominating_set_invariants(spark):
    """Every vertex is a member or adjacent to one; star collapses to
    its center in one round."""
    from tldr_spark.operators.domset import dominating_set

    edges = [(s - 9, d - 9) for s, d in _rand_edges(137, 30, 60)]
    r = dominating_set(_df(spark, edges))
    dom = {x["id"] for x in r.members.collect()}
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, {s}).add(d)
            adj.setdefault(d, {d}).add(s)
    for v in adj:
        assert adj[v] & dom, v
    star = [(0, i) for i in range(1, 9)]
    r2 = dominating_set(_df(spark, star))
    assert {x["id"] for x in r2.members.collect()} == {0} and r2.rounds == 1


def _bridges_py(edges):
    """Exact bridges via iterative Tarjan lowlink (independent of the
    engine's XOR-sketch approach)."""
    adj = {}
    eset = set()
    for s, d in edges:
        if s != d:
            a, b = min(s, d), max(s, d)
            if (a, b) not in eset:
                eset.add((a, b))
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
    disc, low = {}, {}
    out = set()
    t = [0]
    for root in adj:
        if root in disc:
            continue
        stack = [(root, None, iter(adj[root]))]
        disc[root] = low[root] = t[0]
        t[0] += 1
        while stack:
            v, pe, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[v])
                    if low[v] > disc[p]:
                        out.add((min(v, p), max(v, p)))
                continue
            if nxt == pe:
                # skip ONE parent edge occurrence (simple graph: exactly one)
                stack[-1] = (v, None, it)
                continue
            if nxt in disc:
                low[v] = min(low[v], disc[nxt])
            else:
                disc[nxt] = low[nxt] = t[0]
                t[0] += 1
                stack.append((nxt, v, iter(adj[nxt])))
    return out


def _two_ecc_py(edges):
    """2ECC labels: CC after deleting bridges (min-member label)."""
    br = _bridges_py(edges)
    verts = {v for s, d in edges if s != d for v in (s, d)}
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        if s != d:
            a, b = min(s, d), max(s, d)
            if (a, b) not in br:
                parent[find(a)] = find(b)
    groups = {}
    for v in verts:
        groups.setdefault(find(v), []).append(v)
    return {v: min(g) for g in groups.values() for v in g}


def test_bridges_match_tarjan(spark):
    from tldr_spark.operators.bridges import bridges

    for seed, n, m in ((61, 40, 60), (67, 30, 33), (71, 50, 140)):
        edges = _rand_edges(seed, n, m)
        got = {(x["a"], x["b"]) for x in bridges(_df(spark, edges)).bridges.collect()}
        assert got == _bridges_py(edges), f"seed {seed}"


def test_bridges_path_and_cycle(spark):
    """Closed forms: every path edge is a bridge; no cycle edge is."""
    from tldr_spark.operators.bridges import bridges

    path = [(i, i + 1) for i in range(8)]
    assert {
        (x["a"], x["b"]) for x in bridges(_df(spark, path)).bridges.collect()
    } == {(i, i + 1) for i in range(8)}
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    r = bridges(_df(spark, cyc + [(0, 9)]))
    assert {(x["a"], x["b"]) for x in r.bridges.collect()} == {(0, 9)}


def test_two_edge_components_match_python(spark):
    from tldr_spark.operators.bridges import two_edge_components

    edges = [(s - 11, d - 11) for s, d in _rand_edges(73, 35, 70)]
    got = {x["id"]: x["label"] for x in two_edge_components(_df(spark, edges)).collect()}
    assert got == _two_ecc_py(edges)


def test_bridges_empty(spark):
    from tldr_spark.operators.bridges import bridges

    r = bridges(_df(spark, [(3, 3)]))
    assert r.bridges.count() == 0 and r.levels == 0


def test_maximal_matching_empty_and_selfloops(spark):
    from tldr_spark.operators.matching import maximal_matching

    r = maximal_matching(_df(spark, [(1, 1), (2, 2)]))
    assert r.pairs.count() == 0 and r.rounds == 0


# ---------------------------------------------------------------------------
# 4-cycle (rectangle) counting + knn degree-correlation curve
# ---------------------------------------------------------------------------

def _c4_py(edges):
    """Independent pair-formula oracle: sum over vertex pairs of
    C(common_neighbors, 2), halved (each rectangle has two diagonals)."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    tot = 0
    for u, w in itertools.combinations(verts, 2):
        c = len(adj[u] & adj[w])
        tot += c * (c - 1) // 2
    return tot // 2


def test_four_cycles_closed_forms(spark):
    from tldr_spark.operators.triangles import four_cycle_count

    k4 = list(itertools.combinations(range(4), 2))
    k5 = list(itertools.combinations(range(5), 2))
    k23 = [(a, b) for a in (0, 1) for b in (2, 3, 4)]
    assert four_cycle_count(_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])) == 1
    assert four_cycle_count(_df(spark, [(0, 1), (1, 2), (2, 3)])) == 0
    assert four_cycle_count(_df(spark, k4)) == 3
    assert four_cycle_count(_df(spark, k5)) == 15
    assert four_cycle_count(_df(spark, k23)) == 3  # K_{2,3}: C(2,2)*C(3,2)
    # triangles alone contain no rectangle; self-loops/multi-edges ignored
    assert four_cycle_count(_df(spark, [(0, 1), (1, 2), (2, 0), (0, 0), (1, 0)])) == 0


def test_four_cycles_match_python(spark):
    from tldr_spark.operators.triangles import four_cycle_count

    for seed, n, m in ((5, 14, 40), (29, 20, 60)):
        edges = [(s - 7, d - 7) for s, d in _rand_edges(seed, n, m)]
        assert four_cycle_count(_df(spark, edges)) == _c4_py(edges)


def _knn_py(edges):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_k = {}
    for v, ns in adj.items():
        k = len(ns)
        s = sum(len(adj[n]) for n in ns)
        n, t = per_k.get(k, (0, 0))
        per_k[k] = (n + 1, t + s)
    return {k: (n, t, t / (k * n)) for k, (n, t) in per_k.items()}


def test_avg_neighbor_degree_matches_python(spark):
    from tldr_spark.operators.stats import avg_neighbor_degree

    for seed, n, m in ((3, 15, 40), (17, 25, 70)):
        edges = [(s - 9, d - 9) for s, d in _rand_edges(seed, n, m)]
        got = {
            r["degree"]: (r["n_vertices"], r["sum_neighbor_deg"], r["knn"])
            for r in avg_neighbor_degree(_df(spark, edges)).collect()
        }
        assert got == _knn_py(edges)


def test_avg_neighbor_degree_star(spark):
    from tldr_spark.operators.stats import avg_neighbor_degree

    got = {
        r["degree"]: r["knn"]
        for r in avg_neighbor_degree(_df(spark, [(0, i) for i in range(1, 6)])).collect()
    }
    assert got == {5: 1.0, 1: 5.0}


# ---------------------------------------------------------------------------
# edge embeddedness (tie strength) + c(k) clustering curve
# ---------------------------------------------------------------------------

def _adj_und(edges):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return und, adj


def test_edge_embeddedness_matches_python(spark):
    from tldr_spark.operators.linksim import edge_embeddedness

    for seed, n, m in ((2, 14, 38), (13, 22, 55)):
        edges = [(s - 5, d - 5) for s, d in _rand_edges(seed, n, m)]
        und, adj = _adj_und(edges)
        exp = {}
        for a, b in und:
            sup = len(adj[a] & adj[b])
            den = len(adj[a]) + len(adj[b]) - 2 - sup
            exp[(a, b)] = (sup, 0.0 if den == 0 else sup / den)
        got = {
            (r["a"], r["b"]): (r["support"], r["embeddedness"])
            for r in edge_embeddedness(_df(spark, edges)).collect()
        }
        assert got == exp


def test_edge_embeddedness_closed_forms(spark):
    from tldr_spark.operators.linksim import edge_embeddedness

    # isolated edge -> (0, 0.0); triangle edges -> (1, 1.0); self-loops dropped
    got = {
        (r["a"], r["b"]): (r["support"], r["embeddedness"])
        for r in edge_embeddedness(
            _df(spark, [(0, 1), (2, 3), (3, 4), (4, 2), (5, 5)])
        ).collect()
    }
    assert got == {
        (0, 1): (0, 0.0),
        (2, 3): (1, 1.0),
        (3, 4): (1, 1.0),
        (2, 4): (1, 1.0),
    }


def test_clustering_by_degree_matches_python(spark):
    from tldr_spark.operators.linksim import clustering_by_degree

    for seed, n, m in ((2, 14, 38), (31, 18, 50)):
        edges = [(s - 3, d - 3) for s, d in _rand_edges(seed, n, m)]
        _, adj = _adj_und(edges)
        per_k = {}
        for v, ns in adj.items():
            k = len(ns)
            if k < 2:
                continue
            t = sum(
                1 for x, y in itertools.combinations(sorted(ns), 2) if y in adj[x]
            )
            c, st = per_k.get(k, (0, 0))
            per_k[k] = (c + 1, st + t)
        exp = {k: (c, st, 2.0 * st / (c * k * (k - 1))) for k, (c, st) in per_k.items()}
        got = {
            r["degree"]: (r["n_vertices"], r["sum_triangles"], r["coeff"])
            for r in clustering_by_degree(_df(spark, edges)).collect()
        }
        assert got == exp


# ---------------------------------------------------------------------------
# onion decomposition
# ---------------------------------------------------------------------------

def _onion_py(edges):
    """Independent oracle in networkx onion_layers style: the threshold
    JUMPS to the min remaining degree (the engine increments k one at a
    time, producing empty non-counted levels — same nonempty batches)."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    deg = {v: len(adj[v]) for v in alive}
    out = {}
    current_core, layer = 1, 0
    while alive:
        this = [v for v in alive if deg[v] <= current_core - 1]
        if not this:
            current_core = min(deg[v] for v in alive) + 1
            this = [v for v in alive if deg[v] <= current_core - 1]
        layer += 1
        for v in this:
            out[v] = (current_core - 1, layer)
        for v in this:
            alive.discard(v)
            for n in adj[v]:
                if n in alive:
                    deg[n] -= 1
    return out


def test_onion_matches_python_both_paths(spark):
    from tldr_spark.operators.kcore import onion_decomposition

    for seed, n, m in ((4, 20, 50), (21, 16, 24)):
        edges = [(s - 7, d - 7) for s, d in _rand_edges(seed, n, m)]
        exp = _onion_py(edges)
        r_loc = onion_decomposition(_df(spark, edges))
        got_loc = {
            r["id"]: (r["coreness"], r["layer"]) for r in r_loc.assignments.collect()
        }
        assert got_loc == exp
        r_dist = onion_decomposition(_df(spark, edges), local_finish_edges=0)
        got_dist = {
            r["id"]: (r["coreness"], r["layer"]) for r in r_dist.assignments.collect()
        }
        assert got_dist == exp
        assert r_dist.rounds_per_k == r_loc.rounds_per_k
        assert r_dist.n_layers == r_loc.n_layers == max(l for _, l in exp.values())


def test_onion_projects_to_coreness(spark):
    from tldr_spark.operators.kcore import core_decomposition, onion_decomposition

    edges = [(s - 3, d - 3) for s, d in _rand_edges(9, 30, 90)]
    onion = {
        r["id"]: r["coreness"]
        for r in onion_decomposition(_df(spark, edges)).assignments.collect()
    }
    core = {
        r["id"]: r["coreness"]
        for r in core_decomposition(_df(spark, edges)).assignments.collect()
    }
    assert onion == core


def test_onion_closed_forms(spark):
    from tldr_spark.operators.kcore import onion_decomposition

    # K4 + pendant chain 4-5-6 hanging off vertex 0:
    # wave 1 (k=1): nothing (no deg-0); k=2 wave 1: 6 falls (deg 1);
    # k=2 wave 2: 5 falls; k=2 wave 3: 4 falls; then K4 survives to k=4,
    # whole clique falls in one wave at k=4 (coreness 3).
    k4 = list(itertools.combinations(range(4), 2))
    edges = k4 + [(0, 4), (4, 5), (5, 6)]
    r = onion_decomposition(_df(spark, edges))
    got = {x["id"]: (x["coreness"], x["layer"]) for x in r.assignments.collect()}
    assert got[6] == (1, 1) and got[5] == (1, 2) and got[4] == (1, 3)
    assert got[0] == (3, 4) and got[1] == (3, 4) and got[2] == (3, 4) and got[3] == (3, 4)
    assert r.max_k == 3 and r.n_layers == 4
    # empty / self-loop-only input
    r0 = onion_decomposition(_df(spark, [(2, 2)]))
    assert r0.assignments.count() == 0 and r0.n_layers == 0 and r0.rounds_per_k == []


def test_degree_moments_matches_python(spark):
    from tldr_spark.operators.stats import degree_moments

    edges = [(s - 4, d - 4) for s, d in _rand_edges(6, 18, 45)]
    _, adj = _adj_und(edges)
    degs = [len(ns) for ns in adj.values()]
    n, sd, sd2 = len(degs), sum(degs), sum(k * k for k in degs)
    r = degree_moments(_df(spark, edges)).collect()[0]
    assert (r["n_vertices"], r["sum_deg"], r["sum_deg2"]) == (n, sd, sd2)
    assert r["n_und_edges"] == sd // 2
    assert r["mean_deg"] == sd / n
    assert r["second_moment"] == sd2 / n
    assert r["kappa"] == sd2 / sd
    assert r["fc"] == 1.0 - sd / (sd2 - sd)


def test_degree_moments_degenerate(spark):
    from tldr_spark.operators.stats import degree_moments

    # perfect matching: every degree 1 -> kappa = 1, fc defined as 0
    r = degree_moments(_df(spark, [(0, 1), (2, 3)])).collect()[0]
    assert r["kappa"] == 1.0 and r["fc"] == 0.0 and r["n_und_edges"] == 2


# ---------------------------------------------------------------------------
# 4-node graphlet census (ESCAPE)
# ---------------------------------------------------------------------------

def _census4_py(edges):
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    verts = sorted({v for e in und for v in e})
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = dict(path4=0, star3=0, cycle4=0, paw=0, diamond=0, clique4=0)
    counts["wedges"] = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    counts["triangles"] = sum(
        1
        for t in itertools.combinations(verts, 3)
        if all((min(u, v), max(u, v)) in und for u, v in itertools.combinations(t, 2))
    )
    for quad in itertools.combinations(verts, 4):
        es = [
            (u, v) for u, v in itertools.combinations(quad, 2) if (u, v) in und
        ]
        m = len(es)
        comp = {quad[0]}
        changed = True
        while changed:
            changed = False
            for u, v in es:
                if (u in comp) != (v in comp):
                    comp |= {u, v}
                    changed = True
        if len(comp) != 4:
            continue
        degs = sorted(
            sum(1 for u in quad if u != v and (min(u, v), max(u, v)) in und)
            for v in quad
        )
        if m == 3 and degs == [1, 1, 2, 2]:
            counts["path4"] += 1
        elif m == 3 and degs == [1, 1, 1, 3]:
            counts["star3"] += 1
        elif m == 4 and degs == [2, 2, 2, 2]:
            counts["cycle4"] += 1
        elif m == 4 and degs == [1, 2, 2, 3]:
            counts["paw"] += 1
        elif m == 5:
            counts["diamond"] += 1
        elif m == 6:
            counts["clique4"] += 1
    return counts


def test_four_node_census_matches_brute_force(spark):
    from tldr_spark.operators.triangles import four_node_census

    k5 = list(itertools.combinations(range(5), 2))
    for name, edges in (
        ("k5", k5),
        ("c4", [(0, 1), (1, 2), (2, 3), (3, 0)]),
        ("rand8", [(s - 2, d - 2) for s, d in _rand_edges(8, 12, 30)]),
        ("rand15", _rand_edges(15, 10, 22)),
    ):
        got = four_node_census(_df(spark, edges)).collect()[0].asDict()
        exp = _census4_py(edges)
        assert {k: got[k] for k in exp} == exp, name


# ---------------------------------------------------------------------------
# K5 count + HyperBall harmonic centrality
# ---------------------------------------------------------------------------

def test_five_cliques_closed_forms_and_brute(spark):
    from tldr_spark.operators.triangles import five_clique_count

    k5 = list(itertools.combinations(range(5), 2))
    k6 = list(itertools.combinations(range(6), 2))
    assert five_clique_count(_df(spark, k5)) == 1
    assert five_clique_count(_df(spark, k6)) == 6  # C(6,5)
    k4 = list(itertools.combinations(range(4), 2))
    assert five_clique_count(_df(spark, k4)) == 0
    # brute force on a dense-ish random graph
    edges = _rand_edges(44, 9, 28)
    und = {(min(s, d), max(s, d)) for s, d in edges}
    verts = sorted({v for e in und for v in e})
    exp = sum(
        1
        for quint in itertools.combinations(verts, 5)
        if all(
            (u, v) in und for u, v in itertools.combinations(quint, 2)
        )
    )
    assert five_clique_count(_df(spark, edges)) == exp
    # orientation invariance
    assert five_clique_count(_df(spark, edges), by_degree=False) == exp


def test_hyperball_harmonic_tracks_exact(spark):
    from tldr_spark.operators.anf import hyperball_harmonic

    edges = _rand_edges(12, 30, 80)
    # exact harmonic centrality by per-vertex BFS over out-edges
    adj = {}
    verts = set()
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            verts |= {s, d}
    exact = {}
    for v in sorted(verts):
        dist = {v: 0}
        frontier = [v]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            frontier = nxt
        exact[v] = sum(1.0 / d for u, d in dist.items() if d > 0)
    got = {
        r["id"]: r["harmonic_est"]
        for r in hyperball_harmonic(_df(spark, edges), max_h=30).collect()
    }
    assert set(got) == set(exact)
    # lg_k=12 registers >> ball sizes here: estimates are near-exact
    for v, e in exact.items():
        assert got[v] == pytest.approx(e, rel=0.02, abs=0.02), v


def test_hyperball_harmonic_closed_form(spark):
    from tldr_spark.operators.anf import hyperball_harmonic

    # directed path 0->1->2->3: HC(0)=1+1/2+1/3, HC(3)=0
    got = {
        r["id"]: r["harmonic_est"]
        for r in hyperball_harmonic(
            _df(spark, [(0, 1), (1, 2), (2, 3)]), max_h=5
        ).collect()
    }
    assert got[3] == pytest.approx(0.0, abs=1e-9)
    assert got[0] == pytest.approx(1 + 0.5 + 1 / 3, rel=0.01)
    assert got[2] == pytest.approx(1.0, rel=0.01)


def test_attack_tolerance_matches_python(spark):
    from tldr_spark.operators.stats import attack_tolerance

    edges = [(s - 8, d - 8) for s, d in _rand_edges(5, 60, 140)]
    _, adj = _adj_und(edges)
    n_total = len(adj)
    order = sorted(adj, key=lambda v: (-len(adj[v]), v))
    exp = []
    for pm in (10, 100, 300):
        k = (pm * n_total) // 1000
        rm = set(order[:k])
        sadj = {}
        for a, ns in adj.items():
            if a in rm:
                continue
            keep = ns - rm
            if keep:
                sadj[a] = keep
        seen, giant = set(), 0
        for v in sadj:
            if v in seen:
                continue
            comp, stack = {v}, [v]
            while stack:
                u = stack.pop()
                for w in sadj[u]:
                    if w not in comp:
                        comp.add(w)
                        stack.append(w)
            seen |= comp
            giant = max(giant, len(comp))
        exp.append((pm, k, len(sadj), giant, giant / n_total))
    got = [
        tuple(r)
        for r in attack_tolerance(_df(spark, edges), per_mille=(10, 100, 300)).collect()
    ]
    assert got == exp


def test_attack_tolerance_star(spark):
    from tldr_spark.operators.stats import attack_tolerance

    # removing the star center at 20% budget kills every edge
    got = [
        tuple(r)
        for r in attack_tolerance(
            _df(spark, [(0, i) for i in range(1, 6)]), per_mille=(200,)
        ).collect()
    ]
    assert got == [(200, 1, 0, 0, 0.0)]


def test_ppr_sweep_cut_matches_python(spark):
    from tldr_spark.operators.ppr_push import SCALE, ppr_sweep_cut

    edges = _rand_edges(27, 40, 120)
    seed_ids = {v for v in range(40) if v % 7 == 0}

    # python mirror of the integer push
    sd = {(s, d) for s, d in edges if s != d}
    out_adj = {}
    for s, d in sd:
        out_adj.setdefault(s, []).append(d)
    verts = {v for e in sd for v in e}
    seeds_l = sorted(v for v in verts if v in seed_ids)
    r = {v: 0 for v in verts}
    p = {v: 0 for v in verts}
    for v in seeds_l:
        r[v] = SCALE // len(seeds_l)
    for _ in range(8):
        active = [
            v for v in verts if out_adj.get(v) and r[v] > (1 << 16) * len(out_adj[v])
        ]
        if not active:
            break
        inc = {}
        for v in active:
            gain = r[v] // 4
            rest = r[v] - gain
            q = rest // len(out_adj[v])
            for w in out_adj[v]:
                inc[w] = inc.get(w, 0) + q
            p[v] += gain
            r[v] = rest - q * len(out_adj[v])
        for w, i in inc.items():
            r[w] += i

    # python sweep
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    du = {v: len(ns) for v, ns in adj.items()}
    cand = sorted(
        ((-((p[v] * 1048576) // du[v]), v) for v in p if p.get(v, 0) > 0 and v in du)
    )
    order = [v for _, v in cand]
    vol_total = 2 * len(und)
    exp, vol, inside, S = [], 0, 0, set()
    for j, v in enumerate(order, 1):
        vol += du[v]
        inside += sum(1 for n in adj[v] if n in S)
        S.add(v)
        cut = vol - 2 * inside
        den = min(vol, vol_total - vol)
        exp.append((j, v, vol, cut, cut / den if den > 0 else 1.0))

    seeds = spark.createDataFrame([(v,) for v in seeds_l], "id long")
    got = [
        tuple(r_)
        for r_ in ppr_sweep_cut(_df(spark, edges), seeds, rounds=8)
        .orderBy("sweep_pos")
        .collect()
    ]
    assert got == exp
    # the conductance curve has an interior minimum on a clustered graph
    assert min(x[4] for x in exp) <= exp[-1][4]


def test_ppr_sweep_cut_planted_community(spark):
    from tldr_spark.operators.ppr_push import ppr_sweep_cut

    # two K6 cliques joined by one bridge edge; seed inside clique A:
    # the minimum-conductance prefix is exactly clique A. Edges go BOTH
    # directions (the ACL push spreads along out-edges; an id-oriented
    # clique would leave its max vertex with no out-degree and hence no
    # settled mass — directed-graph caveat documented in the operator).
    a = list(range(6))
    b = list(range(10, 16))
    edges = (
        [(x, y) for i, x in enumerate(a) for y in a[i + 1:]]
        + [(x, y) for i, x in enumerate(b) for y in b[i + 1:]]
        + [(0, 10)]
    )
    edges = edges + [(y, x) for x, y in edges]
    seeds = spark.createDataFrame([(0,)], "id long")
    curve = (
        ppr_sweep_cut(_df(spark, edges), seeds, rounds=20)
        .orderBy("sweep_pos")
        .collect()
    )
    best = min(curve, key=lambda r_: (r_["conductance"], r_["sweep_pos"]))
    prefix = {r_["vertex"] for r_ in curve if r_["sweep_pos"] <= best["sweep_pos"]}
    assert prefix == set(a)
    assert best["cut"] == 1


def test_edge_betweenness_matches_brandes(spark):
    from collections import deque

    from tldr_spark.operators.betweenness import betweenness_centrality

    edges = [(s - 6, d - 6) for s, d in _rand_edges(6, 25, 70)]
    sd = sorted({(s, d) for s, d in edges if s != d})
    adj = {}
    verts = set()
    for s, d in sd:
        adj.setdefault(s, []).append(d)
        verts |= {s, d}
    eb, vb = {}, {}
    for s in sorted(verts):
        dist, sigma, order = {s: 0}, {s: 1.0}, []
        qd = deque([s])
        while qd:
            u = qd.popleft()
            order.append(u)
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    qd.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[u]
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    c = sigma[w] / sigma[x] * (1 + delta[x])
                    eb[(w, x)] = eb.get((w, x), 0.0) + c
                    delta[w] += c
            if w != s:
                vb[w] = vb.get(w, 0.0) + delta[w]

    probes = spark.createDataFrame([(v,) for v in sorted(verts)], "id long")
    res = betweenness_centrality(
        _df(spark, edges), probes, max_levels=30, collect_edge_scores=True
    )
    got_e = {(r["src"], r["dst"]): r["betweenness"] for r in res.edge_scores.collect()}
    got_v = {r["id"]: r["betweenness"] for r in res.scores.collect()}
    assert set(got_e) == set(eb)
    for k in eb:
        assert got_e[k] == pytest.approx(eb[k], abs=1e-9), k
    for k in vb:
        assert got_v[k] == pytest.approx(vb[k], abs=1e-9), k


def test_edge_betweenness_bridge_dominates(spark):
    from tldr_spark.operators.betweenness import betweenness_centrality

    # two triangles joined by one bridge: the bridge edge carries every
    # cross-side shortest path — strictly the largest edge score
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    edges = edges + [(y, x) for x, y in edges]
    verts = sorted({v for e in edges for v in e})
    probes = spark.createDataFrame([(v,) for v in verts], "id long")
    res = betweenness_centrality(
        _df(spark, edges), probes, max_levels=10, collect_edge_scores=True
    )
    got = {(r["src"], r["dst"]): r["betweenness"] for r in res.edge_scores.collect()}
    assert got[(2, 3)] == max(got.values())
    assert got[(2, 3)] == 9.0  # 3x3 cross pairs via the bridge


# ---------------------------------------------------------------------------
# Leiden connectivity refinement
# ---------------------------------------------------------------------------

def test_refine_connected_splits_disconnected_community(spark):
    from tldr_spark.operators.community import refine_connected

    labels = spark.createDataFrame(
        [(0, 99), (1, 99), (2, 99), (3, 99), (10, 77), (11, 77)],
        "id long, label long",
    )
    # community 99 = {0,1} + {2,3} with no connecting edge -> must split
    got = {
        r["id"]: r["label"]
        for r in refine_connected(_df(spark, [(0, 1), (2, 3), (10, 11)]), labels).collect()
    }
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 10: 10, 11: 10}


def test_leiden_connectivity_invariant(spark):
    from tldr_spark.operators.community import leiden

    for seed in (1, 8):
        edges = [(s - 13, d - 13) for s, d in _rand_edges(seed, 50, 110)]
        comm = {}
        for r in leiden(_df(spark, edges)).labels.collect():
            comm.setdefault(r["community"], set()).add(r["id"])
        _, adj = _adj_und(edges)
        for members in comm.values():
            if len(members) == 1:
                continue
            seen, stack = {min(members)}, [min(members)]
            while stack:
                u = stack.pop()
                for w in adj.get(u, ()):
                    if w in members and w not in seen:
                        seen.add(w)
                        stack.append(w)
            assert seen == members  # the Leiden guarantee Louvain lacks


def test_leiden_ring_of_cliques(spark):
    from tldr_spark.operators.community import leiden

    cliq = []
    for k in range(4):
        base = 10 * k
        cliq += [
            (base + i, base + j) for i, j in itertools.combinations(range(5), 2)
        ]
        cliq.append((10 * k + 4, 10 * ((k + 1) % 4)))
    got = {}
    for r in leiden(_df(spark, cliq)).labels.collect():
        got.setdefault(r["community"], set()).add(r["id"])
    exp = [set(range(10 * k, 10 * k + 5)) for k in range(4)]
    assert sorted(map(sorted, got.values())) == sorted(map(sorted, exp))


# ---------------------------------------------------------------------------
# directed assortativity matrix + sliding streaming window
# ---------------------------------------------------------------------------

def test_directed_assortativity_matches_python(spark):
    import math

    from tldr_spark.operators.stats import directed_assortativity

    edges = [(s - 11, d - 11) for s, d in _rand_edges(7, 30, 80)]
    sd = sorted({(s, d) for s, d in edges if s != d})
    od, idg = {}, {}
    for s, d in sd:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    modes = {
        "out-in": lambda s, d: (od.get(s, 0), idg.get(d, 0)),
        "out-out": lambda s, d: (od.get(s, 0), od.get(d, 0)),
        "in-in": lambda s, d: (idg.get(s, 0), idg.get(d, 0)),
        "in-out": lambda s, d: (idg.get(s, 0), od.get(d, 0)),
    }
    exp = {}
    for mode, f in modes.items():
        xs = [f(s, d) for s, d in sd]
        m = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        sxx = sum(x * x for x, _ in xs)
        syy = sum(y * y for _, y in xs)
        den = math.sqrt(float(m * sxx - sx * sx) * float(m * syy - sy * sy))
        exp[mode] = (
            m, sxy, sx, sy, sxx, syy,
            float(m * sxy - sx * sy) / den if den > 0 else 0.0,
        )
    got = {
        r["mode"]: tuple(r)[1:]
        for r in directed_assortativity(_df(spark, edges)).collect()
    }
    assert got == exp


def test_stream_sliding_window_matches_batch(spark):
    from tldr_spark.streaming.edges_stream import streamed_sliding_in_degree

    rows = streamed_sliding_in_degree(spark, "/root/testdata/sf0.001").collect()
    assert rows  # drain produced windows
    # every (hour, dst) group must appear in exactly two windows: starts
    # at floor_hour and floor_hour - 3600
    from collections import Counter

    by_dst_total = Counter()
    for r in rows:
        by_dst_total[r["dst"]] += r["in_deg"]
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(((F.col("event_id") * 131 + 7) % 211).alias("dst"))
        .count()
        .collect()
    )
    exp = {r["dst"]: 2 * r["count"] for r in batch}  # each event in 2 windows
    assert dict(by_dst_total) == exp


def test_random_failure_tolerance_matches_python(spark):
    from tldr_spark.operators.stats import random_failure_tolerance

    edges = [(s - 5, d - 5) for s, d in _rand_edges(5, 60, 140)]
    _, adj = _adj_und(edges)
    n_total = len(adj)
    exp = []
    for pm in (100, 300, 500):
        rm = {v for v in adj if (v * 2654435761) % 1000 < pm}
        sadj = {}
        for a, ns in adj.items():
            if a in rm:
                continue
            keep = ns - rm
            if keep:
                sadj[a] = keep
        seen, giant = set(), 0
        for v in sadj:
            if v in seen:
                continue
            comp, stack = {v}, [v]
            while stack:
                u = stack.pop()
                for w in sadj[u]:
                    if w not in comp:
                        comp.add(w)
                        stack.append(w)
            seen |= comp
            giant = max(giant, len(comp))
        exp.append((pm, len(rm), len(sadj), giant, giant / n_total))
    got = [
        tuple(r)
        for r in random_failure_tolerance(
            _df(spark, edges), per_mille=(100, 300, 500)
        ).collect()
    ]
    assert got == exp


# ---------------------------------------------------------------------------
# geometric diffusion (truncated heat-kernel-style influence)
# ---------------------------------------------------------------------------

def _diffusion_py(edges, seeds, iters, base=0.5):
    """Reference: dense iteration of score = sum_k base^(k+1) (P^T)^k s."""
    from collections import defaultdict

    w = defaultdict(float)
    for s, d, wt in edges:
        w[(s, d)] += wt
    outw = defaultdict(float)
    for (s, _d), wt in w.items():
        outw[s] += wt
    mass = {v: 1.0 for v in seeds}
    acc = defaultdict(float)
    coef = base
    for v, m in mass.items():
        acc[v] += m * coef
    for _ in range(iters):
        nxt = defaultdict(float)
        for (s, d), wt in w.items():
            if s in mass:
                nxt[d] += mass[s] * (wt / outw[s])
        coef *= base
        for v, m in nxt.items():
            acc[v] += m * coef
        mass = nxt
    return {v: a for v, a in acc.items()}


def test_geometric_diffusion_matches_python(spark):
    from tldr_spark.operators.diffusion import geometric_diffusion

    raw = _rand_edges(11, 40, 120)
    edges = [(s, d, 1.0 + (s * 7 + d) % 3) for s, d in raw]
    seeds = sorted({v for e in raw for v in e if v % 5 == 0})
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    sdf = spark.createDataFrame([(v,) for v in seeds], "id long")
    got = {
        r["id"]: r["score"]
        for r in geometric_diffusion(df, sdf, iters=6, base=0.5).collect()
    }
    exp = _diffusion_py(edges, seeds, iters=6)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], rel=1e-12), v


def test_geometric_diffusion_path_closed_form(spark):
    """Directed path 0->1->2->3, seed {0}: unit mass sits at vertex k only
    at iteration k, so score(k) = 2^-(k+1) exactly."""
    from tldr_spark.operators.diffusion import geometric_diffusion

    df = _df(spark, [(0, 1), (1, 2), (2, 3)])
    sdf = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["score"]
        for r in geometric_diffusion(df, sdf, iters=8, base=0.5).collect()
    }
    assert got == {0: 0.5, 1: 0.25, 2: 0.125, 3: 0.0625}


def test_geometric_diffusion_truncation_and_duplicates(spark):
    """iters=0 keeps only the seed layer; duplicate (src,dst) edge weights
    sum before normalization (same §2.7 contract as PageRank prep)."""
    from tldr_spark.operators.diffusion import geometric_diffusion

    df = spark.createDataFrame(
        [(0, 1, 2.0), (0, 1, 1.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    sdf = spark.createDataFrame([(0,)], "id long")
    got0 = {
        r["id"]: r["score"]
        for r in geometric_diffusion(df, sdf, iters=0, base=0.5).collect()
    }
    assert got0 == {0: 0.5}
    got1 = {
        r["id"]: r["score"]
        for r in geometric_diffusion(df, sdf, iters=1, base=0.5).collect()
    }
    assert got1 == {0: 0.5, 1: pytest.approx(0.25 * 0.75), 2: pytest.approx(0.25 * 0.25)}


# ---------------------------------------------------------------------------
# global efficiency / sampled Wiener index
# ---------------------------------------------------------------------------

def _efficiency_py(edges, probes):
    from collections import deque

    adj = {}
    verts = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        verts.add(s)
        verts.add(d)
    pairs = wiener = 0
    inv = 0.0
    for p in probes:
        dist = {p: 0}
        dq = deque([p])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, dd in dist.items():
            if dd > 0:
                pairs += 1
                wiener += dd
                inv += 1.0 / dd
    n_p, n_v = len(probes), len(verts)
    avg = wiener / pairs if pairs else 0.0
    eff = inv / (n_p * max(n_v - 1, 1))
    return (n_p, n_v, pairs, wiener, avg, eff)


def test_global_efficiency_matches_python(spark):
    from tldr_spark.operators.bfs import global_efficiency

    edges = _rand_edges(13, 50, 130)
    probes = sorted({v for e in edges for v in e if v % 7 == 0})
    df = _df(spark, edges)
    pdf = spark.createDataFrame([(v,) for v in probes], "id long")
    row = global_efficiency(df, pdf, max_levels=40).collect()[0]
    n_p, n_v, pairs, wiener, avg, eff = _efficiency_py(edges, probes)
    assert (row["n_probes"], row["n_vertices"]) == (n_p, n_v)
    assert (row["pairs_reached"], row["wiener_sum"]) == (pairs, wiener)
    assert row["avg_dist"] == pytest.approx(avg, rel=1e-12)
    assert row["efficiency"] == pytest.approx(eff, rel=1e-12)


def test_global_efficiency_star_closed_form(spark):
    """Out-star center->leaves, probes = {center}: every leaf at distance 1,
    so avg_dist = 1 and efficiency = L / (1 * ((L+1) - 1)) = 1.0 exactly."""
    from tldr_spark.operators.bfs import global_efficiency

    leaves = 6
    df = _df(spark, [(0, i) for i in range(1, leaves + 1)])
    pdf = spark.createDataFrame([(0,)], "id long")
    row = global_efficiency(df, pdf).collect()[0]
    assert row["pairs_reached"] == leaves
    assert row["wiener_sum"] == leaves
    assert row["avg_dist"] == 1.0
    assert row["efficiency"] == pytest.approx(leaves / (1 * leaves))


def test_global_efficiency_unreachable_probe(spark):
    """A probe with no out-edges contributes nothing but still divides the
    efficiency denominator."""
    from tldr_spark.operators.bfs import global_efficiency

    df = _df(spark, [(0, 1), (1, 2)])
    pdf = spark.createDataFrame([(0,), (2,)], "id long")
    row = global_efficiency(df, pdf).collect()[0]
    # probe 0 reaches 1 (d=1), 2 (d=2); probe 2 reaches nothing
    assert row["pairs_reached"] == 2
    assert row["wiener_sum"] == 3
    assert row["avg_dist"] == pytest.approx(1.5)
    assert row["efficiency"] == pytest.approx((1.0 + 0.5) / (2 * 2))


# ---------------------------------------------------------------------------
# incremental-crawl delta (snapshot diff + rank movers)
# ---------------------------------------------------------------------------

def test_edges_prev_is_strict_subset(spark):
    """The previous snapshot is the current one minus exactly each page's
    k = deg-1 edge (self-loop-filtered), so multiset containment holds."""
    from collections import Counter

    from tldr_spark.sources.tables import derive_edges, derive_edges_prev

    sf = "/root/testdata/sf0.001"
    cur = Counter(
        (r["src"], r["dst"], r["weight"]) for r in derive_edges(spark, sf).collect()
    )
    prev = Counter(
        (r["src"], r["dst"], r["weight"])
        for r in derive_edges_prev(spark, sf).collect()
    )
    assert all(prev[k] <= cur[k] for k in prev)
    # per-page deficit is exactly the (possibly self-loop-dropped) last link
    dropped = cur - prev
    by_src = Counter(s for (s, _d, _w) in dropped.elements())
    assert all(c == 1 for c in by_src.values())


def _delta_py(old, new):
    from collections import defaultdict

    def agg(edges):
        m = defaultdict(lambda: [0, 0.0])
        for s, d, w in edges:
            m[(s, d)][0] += 1
            m[(s, d)][1] += w
        return m

    o, n = agg(old), agg(new)
    out = {}
    for k in set(o) | set(n):
        n_old, w_old = o.get(k, [0, 0.0])
        n_new, w_new = n.get(k, [0, 0.0])
        if n_old != n_new or w_old != w_new:
            status = "added" if n_old == 0 else ("removed" if n_new == 0 else "changed")
            out[k] = (n_old, n_new, w_old, w_new, status)
    return out


def test_edge_delta_matches_python(spark):
    from tldr_spark.operators.crawl_delta import edge_delta

    old = [(0, 1, 1.0), (0, 1, 2.0), (1, 2, 3.0), (2, 3, 1.0), (4, 5, 2.0)]
    new = [(0, 1, 1.0), (1, 2, 3.0), (2, 3, 1.0), (2, 3, 1.0), (6, 7, 1.0)]
    df_old = spark.createDataFrame(old, "src long, dst long, weight double")
    df_new = spark.createDataFrame(new, "src long, dst long, weight double")
    got = {
        (r["src"], r["dst"]): (r["n_old"], r["n_new"], r["w_old"], r["w_new"], r["status"])
        for r in edge_delta(df_old, df_new).collect()
    }
    assert got == _delta_py(old, new)
    assert got[(4, 5)][4] == "removed"
    assert got[(6, 7)][4] == "added"
    assert got[(0, 1)][4] == "changed" and got[(2, 3)][4] == "changed"
    assert (1, 2) not in got  # identical pair filtered out


def test_rank_movers_vertex_entry_and_exit(spark):
    """A vertex present only in one snapshot gets 0.0 on the missing side;
    deltas are rank_new - rank_old; identical snapshots give all-zero
    deltas."""
    from tldr_spark.operators.crawl_delta import rank_movers

    old = _df(spark, [(0, 1), (1, 2)])
    new = _df(spark, [(0, 1), (1, 2), (2, 3)])
    mv = {r["id"]: r for r in rank_movers(old, new, n_iter=8).collect()}
    assert mv[3]["rank_old"] == 0.0 and mv[3]["rank_new"] > 0.0
    for r in mv.values():
        assert r["delta"] == pytest.approx(r["rank_new"] - r["rank_old"])
    same = rank_movers(new, new, n_iter=8).collect()
    assert all(r["delta"] == 0.0 for r in same)


# ---------------------------------------------------------------------------
# distributed Lloyd's k-means
# ---------------------------------------------------------------------------

def _kmeans_py(vecs, ids, k, iters):
    """Identical-arithmetic NumPy Lloyd: hash-min init, first-min ties,
    empty clusters keep their centroid, inertia vs FINAL centroids."""
    import numpy as np

    X = np.asarray(vecs, dtype=np.float64)
    order = sorted(range(len(ids)), key=lambda i: ((ids[i] * 2654435761) % (2**32), ids[i]))
    cents = X[order[:k]].copy()

    def assign(c):
        d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (X @ c.T)
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        a = assign(cents)
        for j in range(k):
            m = a == j
            if m.any():
                cents[j] = X[m].mean(axis=0)
    a = assign(cents)
    d2 = (X * X).sum(axis=1) - 2.0 * (X * cents[a]).sum(axis=1) + (cents[a] * cents[a]).sum(axis=1)
    return {ids[i]: int(a[i]) for i in range(len(ids))}, cents, float(np.maximum(d2, 0).sum())


def _blob_data(seed, n, d, k_true):
    """Well-separated deterministic blobs (LCG noise around spread centers)."""
    pts = []
    x = seed
    for i in range(n):
        c = i % k_true
        row = []
        for j in range(d):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            noise = ((x >> 20) % 1000) / 1000.0 - 0.5
            row.append(100.0 * c + (10.0 if j == c else 0.0) + noise)
        pts.append(row)
    return pts


def test_kmeans_matches_numpy_lloyd(spark):
    from tldr_spark.operators.kmeans import kmeans

    n, d, k = 60, 6, 3
    vecs = _blob_data(7, n, d, k)
    ids = list(range(n))
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in ids], "vec_id long, embedding array<double>"
    )
    res = kmeans(df, k=k, iters=4)
    exp_assign, exp_cents, exp_inertia = _kmeans_py(vecs, ids, k, 4)
    got = {r["id"]: r["cluster"] for r in res.assignments.collect()}
    assert got == exp_assign
    assert res.centroids == pytest.approx(exp_cents, rel=1e-9)
    assert res.inertia == pytest.approx(exp_inertia, rel=1e-9)


def test_kmeans_separated_blobs_recovered(spark):
    """k = k_true on well-separated blobs: every blob lands in one cluster."""
    from tldr_spark.operators.kmeans import kmeans

    n, d, k = 40, 5, 4
    vecs = _blob_data(3, n, d, k)
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    res = kmeans(df, k=k, iters=5)
    got = {r["id"]: r["cluster"] for r in res.assignments.collect()}
    for i in range(n):
        for j in range(i + 1, n):
            same_blob = (i % k) == (j % k)
            assert (got[i] == got[j]) == same_blob, (i, j)


def test_kmeans_k1_and_empty(spark):
    from tldr_spark.operators.kmeans import kmeans

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 2.0])], "vec_id long, embedding array<double>"
    )
    res = kmeans(df, k=1, iters=3)
    assert {r["cluster"] for r in res.assignments.collect()} == {0}
    import numpy as np

    assert res.centroids == pytest.approx(np.array([[1.0, 1.0]]))
    assert res.inertia == pytest.approx(4.0)  # 2 * (1^2 + 1^2)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    res0 = kmeans(empty, k=3, iters=2)
    assert res0.assignments.count() == 0 and res0.inertia == 0.0


# ---------------------------------------------------------------------------
# node2vec second-order biased walks
# ---------------------------------------------------------------------------

def _node2vec_py(edges, walk_length, walks_per_vertex, rw, iw, ow):
    import hashlib

    adj = {}
    eset = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        eset.add((s, d))
    adj = {s: sorted(ds) for s, ds in adj.items()}

    def h32(start, walk, step):
        return int(hashlib.md5(f"{start}-{walk}-{step}".encode()).hexdigest()[:8], 16)

    rows = []
    for start in sorted(adj):
        for walk in range(walks_per_vertex):
            prev, cur = None, start
            rows.append((start, walk, 0, start))
            for step in range(walk_length):
                cands = adj.get(cur, [])
                if not cands:
                    break
                ws = [
                    1 if prev is None
                    else (rw if x == prev else (iw if (prev, x) in eset else ow))
                    for x in cands
                ]
                r = h32(start, walk, step) % sum(ws)
                cum = 0
                for x, w in zip(cands, ws):
                    cum += w
                    if r < cum:
                        nxt = x
                        break
                rows.append((start, walk, step + 1, nxt))
                prev, cur = cur, nxt
    return sorted(rows)


def test_node2vec_matches_python(spark):
    from tldr_spark.operators.walks import node2vec_walks

    edges = _rand_edges(17, 30, 90)
    got = sorted(
        (r["start"], r["walk"], r["step"], r["vertex"])
        for r in node2vec_walks(
            _df(spark, edges), walk_length=6, walks_per_vertex=2
        ).collect()
    )
    assert got == _node2vec_py(edges, 6, 2, 1, 2, 4)


def test_node2vec_return_weight_dominates(spark):
    """From vertex 1 with prev=0 the candidates are {0 (return), 2 (out)}:
    a ~10^6:1 weight ratio pins the hash interval to one arm, so the walk
    must bounce back (huge return_w) or push outward (huge out_w)."""
    from tldr_spark.operators.walks import node2vec_walks

    # 0 <-> 1, plus 1 -> 2; from 1 with prev=0: cands [0 (return), 2 (out)]
    edges = [(0, 1), (1, 0), (1, 2)]
    # return_w huge: every walk that reaches 1 from 0 must bounce back to 0
    walks = node2vec_walks(
        _df(spark, edges), walk_length=3, walks_per_vertex=2,
        return_w=10**6, in_w=1, out_w=1,
    ).collect()
    byw = {}
    for r in walks:
        byw.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["vertex"]
    for (s, _w), steps in byw.items():
        for t in range(1, max(steps)):
            if steps.get(t) == 1 and steps[t - 1] == 0 and (t + 1) in steps:
                assert steps[t + 1] == 0  # bounced back
    # out_w huge: from 1 with prev=0 the walk must push on to 2
    walks = node2vec_walks(
        _df(spark, edges), walk_length=3, walks_per_vertex=2,
        return_w=1, in_w=1, out_w=10**6,
    ).collect()
    byw = {}
    for r in walks:
        byw.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["vertex"]
    for (s, _w), steps in byw.items():
        for t in range(1, max(steps)):
            if steps.get(t) == 1 and steps[t - 1] == 0 and (t + 1) in steps:
                assert steps[t + 1] == 2  # pushed outward


# ---------------------------------------------------------------------------
# anchor-text index
# ---------------------------------------------------------------------------

def test_anchor_text_index_matches_python(spark):
    import re
    from collections import defaultdict

    from tldr_spark.operators.index import ANCHOR_RE, anchor_text_index
    from tldr_spark.sources.synth_pages import generate_pages

    pages = generate_pages(spark, n_pages=120, num_partitions=4)
    rows = pages.select("url", "html").collect()
    pat = re.compile(ANCHOR_RE)
    mentions = defaultdict(int)
    sources = defaultdict(set)
    for r in rows:
        html = bytes(r["html"]).decode("utf-8")
        for href, atext in pat.findall(html):
            for term in atext.strip().split():
                mentions[(href, term)] += 1
                sources[(href, term)].add(r["url"])
    exp = {k: (mentions[k], len(sources[k])) for k in mentions}
    got = {
        (r["dst_url"], r["term"]): (r["n_mentions"], r["n_sources"])
        for r in anchor_text_index(pages).collect()
    }
    assert got == exp
    assert len(got) > 0


def test_anchor_text_index_handcrafted(spark):
    from tldr_spark.operators.index import anchor_text_index

    pages = spark.createDataFrame(
        [
            ("http://a/", b'<a href="http://t/">big cats</a><a href="http://t/">cats</a>'),
            ("http://b/", b'x <a href="http://t/">cats</a> y <a href="http://u/"> </a>'),
        ],
        "url string, html binary",
    )
    got = {
        (r["dst_url"], r["term"]): (r["n_mentions"], r["n_sources"])
        for r in anchor_text_index(pages).collect()
    }
    assert got == {
        ("http://t/", "big"): (1, 1),
        ("http://t/", "cats"): (3, 2),
    }


# ---------------------------------------------------------------------------
# configuration-model null graph
# ---------------------------------------------------------------------------

def _config_model_py(edges):
    import hashlib
    from collections import Counter, defaultdict

    occ = defaultdict(int)
    keyed = []
    for s, d in edges:
        occ[(s, d)] += 1
        keyed.append((s, d, occ[(s, d)]))

    def h(s, d, o, tag):
        return int(hashlib.md5(f"{s}-{d}-{o}-{tag}".encode()).hexdigest()[:8], 16)

    rs = sorted(keyed, key=lambda k: (h(*k, "s"), k[0], k[1], k[2]))
    rd = sorted(keyed, key=lambda k: (h(*k, "d"), k[1], k[0], k[2]))
    out = Counter()
    for (s, _d, _o), (_s2, d2, _o2) in zip(rs, rd):
        if s != d2:
            out[(s, d2)] += 1
    return dict(out)


def test_config_model_matches_python_and_preserves_degrees(spark):
    from collections import Counter

    from tldr_spark.operators.nullmodel import configuration_model

    edges = _rand_edges(23, 40, 150) + [(1, 2), (1, 2)]  # force multi-edges
    got = {
        (r["src"], r["dst"]): r["n"]
        for r in configuration_model(_df(spark, edges)).collect()
    }
    exp = _config_model_py(edges)
    assert got == exp
    # degree multisets preserved up to dropped self-loops
    out_orig = Counter(s for s, _ in edges)
    in_orig = Counter(d for _, d in edges)
    out_new = Counter()
    in_new = Counter()
    for (s, d), n in got.items():
        out_new[s] += n
        in_new[d] += n
    for v in out_new:
        assert out_new[v] <= out_orig[v]
    for v in in_new:
        assert in_new[v] <= in_orig[v]
    # both sides lose exactly the dropped self-loop stubs
    assert sum(out_orig.values()) - sum(out_new.values()) == sum(in_orig.values()) - sum(in_new.values())


def test_config_model_partitioning_invariant(spark):
    """Ranks come from the total hash order, not the physical layout: the
    rewiring is identical whatever the input partitioning."""
    from tldr_spark.operators.nullmodel import configuration_model

    edges = _rand_edges(29, 30, 100)
    df = _df(spark, edges)
    a = {
        (r["src"], r["dst"]): r["n"]
        for r in configuration_model(df.repartition(1)).collect()
    }
    b = {
        (r["src"], r["dst"]): r["n"]
        for r in configuration_model(df.repartition(7, "dst")).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# session transition matrix + host pagerank composition
# ---------------------------------------------------------------------------

def test_session_transitions_handcrafted(spark):
    from tldr_spark.operators.sessions import session_transitions

    h = 3_600
    # user 1, session A: a->b->a ; (8h gap) session B: b alone (no pair)
    # user 2, session C: a->a
    rows = [
        (1, 1, 0 * h, "a"),
        (1, 2, 1 * h, "b"),
        (1, 3, 2 * h, "a"),
        (1, 4, 12 * h, "b"),
        (2, 5, 0 * h, "a"),
        (2, 6, 1 * h, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, secs long, event_type string"
    ).selectExpr("user_id", "event_id", "timestamp_seconds(secs) AS ts", "event_type")
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
        for r in session_transitions(ev, gap_seconds=2 * h).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "a"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_session_transitions_tie_order_deterministic(spark):
    """Equal timestamps: the (ts_us, event_id) total order pins the pairing."""
    from tldr_spark.operators.sessions import session_transitions

    ev = spark.createDataFrame(
        [(1, 10, 0, "x"), (1, 11, 0, "y"), (1, 12, 0, "z")],
        "user_id long, event_id long, secs long, event_type string",
    ).selectExpr("user_id", "event_id", "timestamp_seconds(secs) AS ts", "event_type")
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in session_transitions(ev, gap_seconds=60).collect()
    }
    assert got == {("x", "y"): 1, ("y", "z"): 1}


def test_host_pagerank_composition(spark):
    """host PageRank == NumPy fixpoint on the collected host graph."""
    import numpy as np

    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.sources.synth_pages import generate_pages, pages_to_host_edges

    pages = generate_pages(spark, n_pages=200, num_partitions=4)
    he = pages_to_host_edges(pages).collect()
    edges = [(r["src_host"], r["dst_host"], float(r["n_links"])) for r in he]
    hosts = sorted({h for s, d, _ in edges for h in (s, d)})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    w = np.zeros((n, n))
    for s, d, wt in edges:
        w[idx[s], idx[d]] += wt
    outw = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(300):
        contrib = np.zeros(n)
        dang = 0.0
        for i in range(n):
            if outw[i] > 0:
                contrib += 0.85 * r[i] * w[i] / outw[i]
            else:
                dang += r[i]
        r = (0.15 + 0.85 * dang) / n + contrib
    df = spark.createDataFrame(edges, "src_h string, dst_h string, weight double").select(
        F.xxhash64("src_h").alias("src"), F.xxhash64("dst_h").alias("dst"), "weight",
        "src_h", "dst_h",
    )
    hmap = {}
    for row in df.select("src", "src_h").union(df.select("dst", "dst_h")).distinct().collect():
        hmap[row["src"]] = row["src_h"]
    res = pagerank(df.select("src", "dst", "weight"), tolerance=1e-12)
    got = {hmap[row["id"]]: row["rank"] for row in res.ranks.collect()}
    for h in hosts:
        assert got[h] == pytest.approx(r[idx[h]], abs=1e-8), h
