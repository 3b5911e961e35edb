"""Inverted-index retrieval primitives — pure-Python differential oracles
(an independent dict-based index; BM25 recomputed from the formula with
math.log) plus hand-pinned fixtures.
"""

from __future__ import annotations

import math

from tldr_spark.operators.index import (
    bm25_scores,
    bm25_topk,
    boolean_retrieval,
    phrase_search,
    token_postings,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat"),
    (2, "lazy dog lazy dog lazy dog"),
    (3, "fox"),
    (4, ""),
    (5, "quick   quick\tbrown\nfox quick"),
]


def _df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _tok(text):
    return [t for t in text.replace("\t", " ").replace("\n", " ").split(" ") if t]


def test_postings(spark):
    rows = token_postings(_df(spark)).collect()
    idx = {(r["token"], r["doc_id"]): (r["tf"], r["positions"]) for r in rows}
    assert idx[("the", 0)] == (2, [0, 6])
    assert idx[("lazy", 2)] == (3, [0, 2, 4])
    assert idx[("quick", 5)] == (3, [0, 1, 4])
    assert ("", 4) not in idx and not any(d == 4 for _, d in idx)
    # tf always equals len(positions); positions sorted
    for tf, pos in idx.values():
        assert tf == len(pos) and pos == sorted(pos)


def test_boolean_and_or(spark):
    df = _df(spark)
    got_and = {
        r["doc_id"] for r in boolean_retrieval(df, ["quick", "fox"], "and").collect()
    }
    assert got_and == {0, 5}
    got_or = {
        r["doc_id"] for r in boolean_retrieval(df, ["quick", "fox"], "or").collect()
    }
    assert got_or == {0, 1, 3, 5}
    # duplicate terms collapse
    assert {
        r["doc_id"] for r in boolean_retrieval(df, ["fox", "fox"], "and").collect()
    } == {0, 3, 5}


def test_phrase(spark):
    df = _df(spark)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(df, ["quick", "brown"]).collect()
    }
    assert got == {0: 1, 1: 1, 5: 1}
    got3 = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(df, ["lazy", "dog", "lazy"]).collect()
    }
    assert got3 == {2: 2}
    single = {
        r["doc_id"]: r["n_matches"] for r in phrase_search(df, ["quick"]).collect()
    }
    assert single == {0: 1, 1: 1, 5: 3}


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    toks = {d: _tok(t) for d, t in docs}
    n = len(docs)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in sorted(set(terms)):
        df_ = sum(1 for ts in toks.values() if term in ts)
        if df_ == 0:
            continue
        idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
        for d, ts in toks.items():
            tf = ts.count(term)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl[d] / avgdl)
                )
    return scores


def test_bm25_matches_python(spark):
    terms = ["lazy", "fox", "quick"]
    got = {r["doc_id"]: r["score"] for r in bm25_scores(_df(spark), terms).collect()}
    want = _bm25_py(DOCS, terms)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d


def test_bm25_topk_order(spark):
    rows = bm25_topk(_df(spark), ["lazy", "dog"], k=2).collect()
    want = sorted(
        _bm25_py(DOCS, ["lazy", "dog"]).items(), key=lambda kv: (-kv[1], kv[0])
    )[:2]
    assert [(r["doc_id"]) for r in rows] == [d for d, _ in want]


def test_empty_inputs(spark):
    import pytest

    df = _df(spark)
    for fn in (
        lambda: boolean_retrieval(df, [], "and"),
        lambda: phrase_search(df, []),
        lambda: bm25_scores(df, []),
    ):
        with pytest.raises(ValueError):
            fn()
    # phrase absent from corpus
    assert phrase_search(df, ["brown", "dog"]).count() == 0


def test_ql_dirichlet_matches_formula(spark):
    from tldr_spark.operators.index import ql_dirichlet_scores

    terms, mu = ["quick", "dog"], 50.0
    got = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_scores(_df(spark), terms, mu=mu).collect()
    }
    # independent dict-based mirror
    toks = {d: _tok(t) for d, t in DOCS}
    tot = sum(len(v) for v in toks.values())
    cf = {t: sum(v.count(t) for v in toks.values()) for t in terms}
    cand = {d for d, v in toks.items() if any(t in v for t in terms)}
    assert set(got) == cand
    for d in cand:
        want = sum(
            math.log(
                (toks[d].count(t) + mu * cf[t] / tot) / (len(toks[d]) + mu)
            )
            for t in terms
        )
        assert abs(got[d] - want) < 1e-12
    # the dog-heavy doc must outrank the single-mention docs on "dog"
    dog_only = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_scores(_df(spark), ["dog"], mu=mu).collect()
    }
    assert dog_only[2] == max(dog_only.values())


def test_ql_dirichlet_background_term_penalty(spark):
    """A candidate doc missing one query term still gets that term's
    background (tf=0) contribution — the score is a proper likelihood."""
    from tldr_spark.operators.index import ql_dirichlet_scores

    got = {
        r["doc_id"]: r["score"]
        for r in ql_dirichlet_scores(_df(spark), ["fox", "lazy"], mu=10.0).collect()
    }
    # doc 3 = "fox" alone: matches fox, missing lazy -> still scored
    assert 3 in got and got[3] < 0
    # Dirichlet length normalization: the 1-token exact match beats the
    # 9-token doc containing both terms (tf/(dl+mu) dominates at small mu)
    assert got[3] > got[0]
