"""char_entropy vs a pure-Python mirror + directional sanity."""

from __future__ import annotations

import math
from collections import Counter

from tldr_spark.operators.textstats import char_entropy

DOCS = [
    (0, "aaaaaaaaaaaaaaaa"),                      # zero entropy
    (1, "abcdefghijklmnop"),                      # maximal: 4 bits
    (2, "the quick brown fox jumps over it"),     # prose-ish
    (3, ""),                                      # excluded
    (4, "QWxhZGRpbjpvcGVuIHNlc2FtZQ== QWxhZGRpbjpvcGVu"),  # base64-ish
]


def _py_entropy(text):
    n = len(text)
    cnt = Counter(text)
    return (math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n) / math.log(2)


def test_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(got) == {0, 1, 2, 4}
    for d, text in DOCS:
        if not text:
            continue
        r = got[d]
        assert r["n_chars"] == len(text)
        assert r["n_distinct"] == len(set(text))
        assert abs(r["entropy_bits"] - _py_entropy(text)) < 1e-12


def test_directional(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["entropy_bits"] for r in char_entropy(df).collect()}
    assert got[0] == 0.0
    assert abs(got[1] - 4.0) < 1e-12
    # base64-ish blob is higher-entropy than prose; prose above repetition
    assert got[4] > got[2] > got[0]
