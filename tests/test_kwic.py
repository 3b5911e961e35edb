"""KWIC concordance: pure-Python oracle over a tiny corpus, plus the edge
clamps (occurrence at position 1 / at the last token / adjacent duplicates)
and the deterministic top_token tie rule."""

from __future__ import annotations

import pytest

from tldr_spark.operators.kwic import kwic, top_token

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the the dog"),
    (3, "mat before the"),
    (4, "   "),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_kwic(term: str, window: int):
    out = []
    for doc_id, text in DOCS:
        toks = text.split()
        for i, t in enumerate(toks):
            if t == term:
                lo = max(0, i - window)
                hi = min(len(toks), i + window + 1)
                out.append((doc_id, i + 1, " ".join(toks[lo:hi])))
    return sorted(out)


def test_top_token_tie_rule(spark):
    # "the" appears 5x, everything else less; ties would break token-asc.
    assert top_token(_docs_df(spark)) == "the"


def test_kwic_matches_python_oracle(spark):
    got = sorted(
        tuple(r) for r in kwic(_docs_df(spark), "the", window=2).collect()
    )
    assert got == _py_kwic("the", 2)
    # Clamp checks are embedded in the fixture: doc 1 pos 1 (left clamp),
    # doc 3 pos 3 (right clamp), doc 2 pos 1+2 (adjacent duplicates).
    assert (1, 1, "the cat sat") in got
    assert (3, 3, "mat before the") in got
    assert (2, 1, "the the dog") in got and (2, 2, "the the dog") in got


def test_kwic_window_zero_and_absent_term(spark):
    df = _docs_df(spark)
    got = sorted(tuple(r) for r in kwic(df, "dog", window=0).collect())
    assert got == [(2, 3, "dog")]
    assert kwic(df, "zebra", window=2).count() == 0


def test_top_token_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError):
        top_token(empty)
