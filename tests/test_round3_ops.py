"""Round-3 operator wave: full core decomposition (peel + h-index scale
path), K4 motif counting, SCC condensation DAG, host-level link graph.

Correctness pins: exact pure-Python oracles (heap peel for coreness,
itertools brute force for cliques, urllib for host extraction), a
differential test between the two coreness implementations, and structural
invariants (condensation antisymmetry/acyclicity witnesses).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from tldr_spark.operators.kcore import core_decomposition, core_decomposition_hindex
from tldr_spark.operators.scc import condensation, strongly_connected_components
from tldr_spark.operators.triangles import four_clique_count


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in edges], "src long, dst long, weight double"
    )


def _rand_edges(seed: int, n: int, m: int):
    """Deterministic pseudo-random simple directed edge list."""
    edges = set()
    x = seed
    while len(edges) < m:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        s, d = (x >> 8) % n, (x >> 40) % n
        if s != d:
            edges.add((int(s), int(d)))
    return sorted(edges)


def _coreness_py(edges):
    """Exact coreness by min-heap peel (Batagelj-Zaversnik)."""
    import heapq

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = {v: set(ns) for v, ns in adj.items()}
    h = [(len(ns), v) for v, ns in alive.items()]
    heapq.heapify(h)
    core, seen, k = {}, set(), 0
    while h:
        d, v = heapq.heappop(h)
        if v in seen or d != len(alive[v]):
            continue
        seen.add(v)
        k = max(k, d)
        core[v] = k
        for u in alive[v]:
            alive[u].discard(v)
            heapq.heappush(h, (len(alive[u]), u))
        alive[v] = set()
    return core


class TestCoreDecomposition:
    def test_matches_exact_peel_oracle(self, spark):
        edges = _rand_edges(7, 40, 160)
        # both paths: default (driver wave-peel finisher) and the
        # distributed progressive peel (local_finish_edges=0 disables)
        for lf in (500_000, 0):
            res = core_decomposition(_df(spark, edges), local_finish_edges=lf)
            got = {r["id"]: r["coreness"] for r in res.assignments.collect()}
            assert got == _coreness_py(edges), lf

    def test_hindex_differential_equal(self, spark):
        for seed, n, m in [(1, 30, 90), (2, 25, 60), (3, 50, 220)]:
            edges = _rand_edges(seed, n, m)
            df = _df(spark, edges)
            a = {r["id"]: r["coreness"] for r in core_decomposition(df).assignments.collect()}
            b = {
                r["id"]: r["coreness"]
                for r in core_decomposition_hindex(df).assignments.collect()
            }
            assert a == b == _coreness_py(edges)

    def test_clique_plus_tail(self, spark):
        # K5 on 0-4 (coreness 4) with a path 4-10-11 hanging off (coreness 1)
        edges = [(a, b) for a, b in itertools.combinations(range(5), 2)]
        edges += [(4, 10), (10, 11)]
        res = core_decomposition(_df(spark, edges))
        got = {r["id"]: r["coreness"] for r in res.assignments.collect()}
        assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 10: 1, 11: 1}
        assert res.max_k == 4

    def test_rounds_count_terminal_implicit_drop_wave(self, spark):
        # ADVICE r3 boundary case — path 1-2-3 at level k=2: wave 1 drops
        # {1, 3}; vertex 2 then has ZERO alive neighbors and must cost an
        # explicit second counted wave (the SQL oracle's survivor-join
        # semantics). The distributed peel used to drop it implicitly in
        # wave 1 and report rounds_per_k=[0, 1], under-feeding the
        # q_coreness oracle-unroll gate by one level.
        df = _df(spark, [(1, 2), (2, 3)])
        for lf in (500_000, 0):
            res = core_decomposition(df, local_finish_edges=lf)
            assert res.rounds_per_k == [0, 2], lf
            got = {r["id"]: r["coreness"] for r in res.assignments.collect()}
            assert got == {1: 1, 2: 1, 3: 1}, lf

    def test_local_finisher_mirrors_distributed_on_advice_boundary(self, spark):
        # VERDICT r4 task #5: dedicated regression naming the ADVICE r3
        # scenario — the kcore.py docstring claims the local finisher
        # "mirrors the distributed peel EXACTLY"; pin that equality
        # DIRECTLY (not just both-equal-a-constant) on the boundary
        # family where the terminal implicit-drop wave used to diverge:
        # the path 1-2-3 itself, a star (hub outlives all leaves by one
        # wave), a pendant chain off a triangle (cascading waves), and
        # two triangles sharing a vertex.
        cases = [
            [(1, 2), (2, 3)],
            [(0, i) for i in range(1, 6)],
            [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)],
            [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)],
        ]
        for edges in cases:
            df = _df(spark, edges)
            r_loc = core_decomposition(df)
            r_dist = core_decomposition(df, local_finish_edges=0)
            assert r_dist.rounds_per_k == r_loc.rounds_per_k, edges
            assert r_dist.max_k == r_loc.max_k, edges
            a_loc = {r["id"]: r["coreness"] for r in r_loc.assignments.collect()}
            a_dist = {r["id"]: r["coreness"] for r in r_dist.assignments.collect()}
            assert a_loc == a_dist, edges

    def test_rounds_per_k_distributed_matches_local(self, spark):
        for seed, n, m in [(11, 30, 90), (12, 40, 160)]:
            df = _df(spark, _rand_edges(seed, n, m))
            r_local = core_decomposition(df)
            r_dist = core_decomposition(df, local_finish_edges=0)
            assert r_dist.rounds_per_k == r_local.rounds_per_k
            assert r_dist.max_k == r_local.max_k

    def test_reciprocal_and_parallel_edges_collapse(self, spark):
        # triangle given with both orientations + duplicates: still coreness 2
        tri = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (0, 1)]
        got = {
            r["id"]: r["coreness"]
            for r in core_decomposition(_df(spark, tri)).assignments.collect()
        }
        assert got == {0: 2, 1: 2, 2: 2}

    def test_empty_graph(self, spark):
        # empty frame AND self-loop-only frame, on BOTH paths: the
        # distributed peel must agree with the local finisher that a graph
        # with no effective edges has rounds_per_k=[] (not a spurious [0])
        empty = spark.createDataFrame([], "src long, dst long, weight double")
        loops = _df(spark, [(1, 1), (2, 2)])
        for df in (empty, loops):
            for lf in (500_000, 0):
                res = core_decomposition(df, local_finish_edges=lf)
                assert res.assignments.count() == 0, lf
                assert res.max_k == 0, lf
                assert res.rounds_per_k == [], lf


def _four_cliques_py(edges):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    verts = sorted(adj)
    n = 0
    for quad in itertools.combinations(verts, 4):
        if all(b in adj[a] for a, b in itertools.combinations(quad, 2)):
            n += 1
    return n


class TestFourCliques:
    def test_k5_has_five(self, spark):
        edges = [(a, b) for a, b in itertools.combinations(range(5), 2)]
        assert four_clique_count(_df(spark, edges)) == 5  # C(5,4)

    def test_random_matches_bruteforce(self, spark):
        for seed, n, m in [(11, 18, 70), (12, 14, 50)]:
            edges = _rand_edges(seed, n, m)
            df = _df(spark, edges)
            want = _four_cliques_py(edges)
            assert four_clique_count(df) == want
            # orientation-invariance: id order and degree order agree
            assert four_clique_count(df, by_degree=False) == want

    def test_triangle_free_square(self, spark):
        assert four_clique_count(_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])) == 0


class TestCondensation:
    def test_two_sccs_one_bridge(self, spark):
        # cycle {0,1,2} -> cycle {5,6} via 2->5, plus a tail 6->9
        edges = [(0, 1), (1, 2), (2, 0), (5, 6), (6, 5), (2, 5), (6, 9)]
        df = _df(spark, edges)
        rows = {
            (r["src_component"], r["dst_component"]): r["n_edges"]
            for r in condensation(df).collect()
        }
        assert rows == {(0, 5): 1, (5, 9): 1}

    def test_antisymmetric_and_loop_free(self, spark):
        edges = _rand_edges(21, 30, 120)
        df = _df(spark, edges)
        res = condensation(df).collect()
        pairs = {(r["src_component"], r["dst_component"]) for r in res}
        assert all(a != b for a, b in pairs)  # no self-loops
        assert not any((b, a) in pairs for a, b in pairs)  # DAG antisymmetry
        # edge conservation: condensation counts cross-component edges exactly
        assign = {
            r["id"]: r["component"]
            for r in strongly_connected_components(df).assignments.collect()
        }
        cross = {}
        for s, d in set(edges):
            cs, cd = assign[s], assign[d]
            if cs != cd:
                cross[(cs, cd)] = cross.get((cs, cd), 0) + 1
        assert {(a, b): n for (a, b), n in cross.items()} == {
            (r["src_component"], r["dst_component"]): r["n_edges"] for r in res
        }

    def test_reuses_given_assignments(self, spark):
        edges = [(0, 1), (1, 0), (1, 2)]
        df = _df(spark, edges)
        pre = strongly_connected_components(df).assignments
        rows = condensation(df, assignments=pre).collect()
        assert {(r["src_component"], r["dst_component"], r["n_edges"]) for r in rows} == {
            (0, 2, 1)
        }


class TestHostLinkGraph:
    def test_url_host_parity_with_urllib(self, spark):
        from urllib.parse import urlparse

        from tldr_spark.sources.synth_pages import url_host

        urls = [
            "https://site3.example/p/9",
            "HTTP://WWW.Example.COM/path?q=1#frag",
            "https://sub.domain.example:8080/deep/path",
            "ftp://files.example/pub",
            "https://host.example",
            "not a url at all",
            "https://UPPER.example/p/1",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r["url"]: r["h"] for r in df.select("url", url_host(F.col("url")).alias("h")).collect()}
        for u in urls:
            p = urlparse(u)
            want = p.netloc.lower() if p.scheme else ""
            assert got[u] == want, (u, got[u], want)

    def test_host_edges_aggregate(self, spark):
        from tldr_spark.sources.synth_pages import pages_to_host_edges

        def page(url, hrefs):
            html = "".join(f'<a href="{h}">x</a>' for h in hrefs)
            return (url, None, html.encode(), "", "en")

        pages = spark.createDataFrame(
            [
                page("https://a.example/1", ["https://b.example/x", "https://b.example/y"]),
                page("https://a.example/2", ["https://b.example/z", "https://a.example/self"]),
                page("https://b.example/1", ["https://a.example/1"]),
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        rows = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in pages_to_host_edges(pages).collect()
        }
        # self-host link dropped; multiplicity kept
        assert rows == {("a.example", "b.example"): 3, ("b.example", "a.example"): 1}

    def test_synthetic_pages_host_rollup_deterministic(self, spark):
        from tldr_spark.sources.synth_pages import generate_pages, pages_to_host_edges

        pages = generate_pages(spark, n_pages=200, num_partitions=4)
        a = sorted(map(tuple, pages_to_host_edges(pages).collect()))
        b = sorted(
            map(
                tuple,
                pages_to_host_edges(
                    generate_pages(spark, n_pages=200, num_partitions=7)
                ).collect(),
            )
        )
        assert a == b  # partition-layout invariant
        assert len(a) > 0
        assert all(h.startswith("site") and h.endswith(".example") for h, _, _ in a)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_tfidf(texts):
    import math

    tf, df = {}, {}
    for i, t in enumerate(texts):
        toks = [w for w in t.strip().split() if w]
        for w in toks:
            tf[(i, w)] = tf.get((i, w), 0) + 1
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    n = len(texts)
    return {
        (i, w): c * (math.log((n + 1) / (df[w] + 1)) + 1.0) for (i, w), c in tf.items()
    }, tf, df


class TestTfidf:
    TEXTS = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cats and dogs and cats",
        "completely different vocabulary entirely",
        "the the the the",
        "",
    ]

    def test_vectors_match_python(self, spark):
        from tldr_spark.operators.tfidf import tfidf_vectors

        import math

        want, tf, df = _py_tfidf(self.TEXTS)
        rows = tfidf_vectors(_docs_df(spark, self.TEXTS)).collect()
        got = {(r["doc_id"], r["token"]): (r["tf"], r["df"], r["tfidf"]) for r in rows}
        assert set(got) == set(want)
        for k, (tfv, dfv, w) in got.items():
            assert tfv == tf[k] and dfv == df[k[1]]
            assert math.isclose(w, want[k], rel_tol=1e-12)

    def test_cosine_pairs_match_bruteforce(self, spark):
        import math

        from tldr_spark.operators.tfidf import tfidf_cosine_pairs

        want_vec, _, _ = _py_tfidf(self.TEXTS)
        vecs = {}
        for (i, w), v in want_vec.items():
            vecs.setdefault(i, {})[w] = v
        brute = {}
        for a in vecs:
            for b in vecs:
                if a < b:
                    shared = set(vecs[a]) & set(vecs[b])
                    dot = sum(vecs[a][w] * vecs[b][w] for w in shared)
                    na = math.sqrt(sum(v * v for v in vecs[a].values()))
                    nb = math.sqrt(sum(v * v for v in vecs[b].values()))
                    if dot and dot / (na * nb) >= 0.1:
                        brute[(a, b)] = dot / (na * nb)
        rows = tfidf_cosine_pairs(_docs_df(spark, self.TEXTS), threshold=0.1).collect()
        got = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in rows}
        assert set(got) == set(brute)
        for k in got:
            assert math.isclose(got[k], brute[k], rel_tol=1e-9)

    def test_tf_weighting_and_candidates(self, spark):
        from tldr_spark.operators.tfidf import tfidf_cosine_pairs

        df = _docs_df(spark, self.TEXTS)
        full = tfidf_cosine_pairs(df, threshold=0.0, weighting="tf").collect()
        assert len(full) > 0
        cand = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
        only = tfidf_cosine_pairs(df, threshold=0.0, weighting="tf", candidates=cand).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in only} == {(0, 1)}
        want = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in full}[(0, 1)]
        assert abs(only[0]["cosine"] - want) < 1e-12

    def test_max_df_prune_is_sound(self, spark):
        """Pruned run returns a subset of exact pairs; surviving pairs'
        cosines are lower bounds (norms exact, dot misses pruned tokens)."""
        from tldr_spark.operators.tfidf import tfidf_cosine_pairs

        df = _docs_df(spark, self.TEXTS)
        exact = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(df, threshold=0.0).collect()
        }
        pruned = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(df, threshold=0.0, max_df_ratio=0.4).collect()
        }
        assert set(pruned) <= set(exact)
        for k, v in pruned.items():
            assert v <= exact[k] + 1e-12


class TestUnigramLogprob:
    def test_matches_python(self, spark):
        import math

        from tldr_spark.operators.tfidf import unigram_logprob

        texts = ["a b a c", "b b d", "a a a a a", ""]
        corpus: dict[str, int] = {}
        per_doc = []
        for t in texts:
            toks = [w for w in t.strip().split() if w]
            per_doc.append(toks)
            for w in toks:
                corpus[w] = corpus.get(w, 0) + 1
        tt, vv = sum(corpus.values()), len(corpus)
        rows = unigram_logprob(_docs_df(spark, texts)).collect()
        got = {r["doc_id"]: (r["n_tokens"], r["mean_logprob"]) for r in rows}
        assert set(got) == {0, 1, 2, 3}
        for i, toks in enumerate(per_doc):
            n, mlp = got[i]
            assert n == len(toks)
            if not toks:
                assert mlp is None
            else:
                want = sum(math.log((corpus[w] + 1) / (tt + vv)) for w in toks) / len(toks)
                assert math.isclose(mlp, want, rel_tol=1e-12)

    def test_garbage_scores_below_natural(self, spark):
        from tldr_spark.operators.tfidf import unigram_logprob

        texts = ["the cat sat on the mat"] * 8 + ["zq jx qv wk px"]
        rows = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob(_docs_df(spark, texts)).collect()}
        assert rows[8] < min(rows[i] for i in range(8))
