"""TextRank: word-graph python oracle (pair counts at window 1/2/3),
symmetric-weight invariant, python power-iteration oracle for the fixed-
iteration scores, and the Mihalcea sanity (a bridging word outranks a
frequent-but-peripheral one)."""

from __future__ import annotations

import pytest

from tldr_spark.operators.textrank import textrank_keywords, word_graph

DOCS = [
    (1, "spark runs fast and spark scales"),
    (2, "fast spark fast"),
    (3, ""),
]


def _py_graph(docs, window):
    from collections import Counter

    cnt = Counter()
    for _, text in docs:
        toks = text.split()
        for i, a in enumerate(toks):
            for k in range(1, window + 1):
                if i + k < len(toks) and toks[i + k] != a:
                    cnt[(a, toks[i + k])] += 1
                    cnt[(toks[i + k], a)] += 1
    return dict(cnt)


def _py_textrank(graph, n_iter, d=0.85):
    verts = sorted({a for a, _ in graph} | {b for _, b in graph})
    outw = {v: 0.0 for v in verts}
    for (a, b), w in graph.items():
        outw[a] += w
    n = len(verts)
    r = {v: 1.0 / n for v in verts}
    for _ in range(n_iter):
        leak = sum(r[v] for v in verts if outw[v] == 0)
        contrib = {v: 0.0 for v in verts}
        for (a, b), w in graph.items():
            contrib[b] += r[a] * w / outw[a]
        r = {v: (1 - d) / n + d * leak / n + d * contrib[v] for v in verts}
    return r


def _df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


@pytest.mark.parametrize("window", [1, 2, 3])
def test_word_graph_matches_oracle(spark, window):
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in word_graph(_df(spark), window=window).collect()
    }
    assert got == {k: float(v) for k, v in _py_graph(DOCS, window).items()}


def test_graph_is_symmetric(spark):
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in word_graph(_df(spark), window=2).collect()
    }
    assert all(got[(b, a)] == w for (a, b), w in got.items())


def test_scores_match_python_power_iteration(spark):
    got = {
        r["word"]: r["rank"]
        for r in textrank_keywords(_df(spark), window=2, n_iter=8).collect()
    }
    exp = _py_textrank(_py_graph(DOCS, 2), 8)
    assert set(got) == set(exp)
    for w in exp:
        assert got[w] == pytest.approx(exp[w], rel=1e-9), w


def test_bridge_word_outranks_peripheral(spark):
    # "hub" co-occurs with everything; "noise" repeats but only next to
    # itself-adjacent filler at the edge of the graph.
    docs = [
        (1, "hub alpha hub beta hub gamma hub delta"),
        (2, "noise filler noise filler"),
    ]
    got = {
        r["word"]: r["rank"]
        for r in textrank_keywords(_df(spark, docs), window=1, n_iter=15).collect()
    }
    assert got["hub"] > got["noise"]


def test_window_zero_raises(spark):
    with pytest.raises(ValueError):
        word_graph(_df(spark), window=0)
