"""LSA power iteration vs an exact numpy mirror + SVD convergence sanity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tldr_spark.operators.lsa import lsa_top_component


def _np_mirror(texts, iterations):
    """Exact replay of the operator's arithmetic (same update order)."""
    toks = {d: [t for t in s.split() if t] for d, s in texts.items()}
    vocab = sorted({t for ts in toks.values() for t in ts})
    docs = sorted(d for d, ts in toks.items() if ts)
    vi = {t: i for i, t in enumerate(vocab)}
    di = {d: i for i, d in enumerate(docs)}
    A = np.zeros((len(docs), len(vocab)))
    for d, ts in toks.items():
        if not ts:
            continue
        for t in ts:
            A[di[d], vi[t]] += 1.0
    v = np.full(len(vocab), 1.0 / math.sqrt(len(vocab)))
    u = None
    for _ in range(iterations):
        u = A @ v
        w = A.T @ u
        v = w / math.sqrt(float(w @ w))
    return (
        {d: u[di[d]] for d in docs},
        {t: v[vi[t]] for t in vocab},
        A,
        docs,
        vocab,
        di,
        vi,
    )


TEXTS = {
    0: "graph spark rank spark graph",
    1: "spark rank rank spark",
    2: "tea pot tea kettle",
    3: "pot kettle tea tea tea",
    4: "graph rank",
    5: "",
}


def test_matches_numpy_mirror(spark):
    df = spark.createDataFrame(sorted(TEXTS.items()), "doc_id long, text string")
    res = lsa_top_component(df, iterations=8)
    want_u, want_v, *_ = _np_mirror(TEXTS, 8)
    got_u = {r["doc_id"]: r["score"] for r in res.doc_scores.collect()}
    got_v = {r["token"]: r["loading"] for r in res.term_loadings.collect()}
    assert got_u.keys() == want_u.keys()  # empty doc 5 excluded
    assert all(abs(got_u[d] - want_u[d]) < 1e-9 * max(1.0, abs(want_u[d])) for d in want_u)
    assert got_v.keys() == want_v.keys()
    assert all(abs(got_v[t] - want_v[t]) < 1e-9 for t in want_v)
    # unit loading vector
    assert abs(sum(x * x for x in got_v.values()) - 1.0) < 1e-9


def test_converges_to_dominant_singular_vector(spark):
    df = spark.createDataFrame(sorted(TEXTS.items()), "doc_id long, text string")
    res = lsa_top_component(df, iterations=30)
    _, _, A, docs, vocab, di, vi = _np_mirror(TEXTS, 1)
    _, _, vt = np.linalg.svd(A, full_matrices=False)
    top = vt[0]
    got_v = np.array(
        [dict((r["token"], r["loading"]) for r in res.term_loadings.collect())[t] for t in vocab]
    )
    cos = abs(float(got_v @ top) / (np.linalg.norm(got_v) * np.linalg.norm(top)))
    # sigma1/sigma2 = 4.109/3.933 on this corpus -> per-round error decay
    # (s2/s1)^2 ~ 0.916; 30 rounds leave ~0.07 residual mass, cos ~ 0.997.
    # The check is direction-identification, not ulp convergence: any
    # non-dominant direction would score cos <= ~0.7.
    assert cos > 0.99


def test_validation_and_empty(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lsa_top_component(df, iterations=0)
    empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    res = lsa_top_component(empty, iterations=3)
    assert res.doc_scores.count() == 0 and res.term_loadings.count() == 0
