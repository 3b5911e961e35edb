"""Blocklist literal scan vs python str.count (non-overlapping)."""

from __future__ import annotations

import pytest

from tldr_spark.operators.textstats import blocklist_hits

DOCS = [
    (0, "the cat sat on the mat with the cat"),
    (1, "dogs only here"),
    (2, ""),
    (3, "catcatcat"),
]


def test_matches_python(spark):
    pats = ["cat", "the", "mat"]
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["n_patterns_hit"])
           for r in blocklist_hits(df, pats).collect()}
    for d, text in DOCS:
        counts = [text.count(p) for p in sorted(set(pats))]
        assert got[d] == (sum(counts), sum(1 for c in counts if c)), d
    assert got[3] == (3, 1)  # non-overlapping triple
    assert got[2] == (0, 0)


def test_rejects_empty_pattern(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        blocklist_hits(df, ["ok", ""])
