"""Chunking: python oracle (the pinned start rule), exact boundary cases
(n == chunk, n == chunk+1, n == chunk+stride), overlap reconstruction
(every token appears in some chunk; consecutive chunks share exactly
`overlap` tokens except a short last chunk), zero-token drop, raises."""

from __future__ import annotations

import math

import pytest

from tldr_spark.operators.chunking import chunk_documents


def _py_chunks(text: str, chunk: int, overlap: int):
    toks = text.split()
    n = len(toks)
    if n == 0:
        return []
    s = chunk - overlap
    n_chunks = 1 if n <= chunk else math.ceil((n - chunk) / s) + 1
    out = []
    for i in range(n_chunks):
        start = i * s  # 0-based
        got = toks[start : start + chunk]
        out.append((i, start + 1, len(got), " ".join(got)))
    return out


def _run(spark, rows, chunk, overlap):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk"])
        )
    return {k: sorted(v) for k, v in got.items()}


def test_matches_python_oracle(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, "a b c"),
        (3, ""),
        (4, "solo"),
        (5, " ".join(f"w{i}" for i in range(23))),
    ]
    got = _run(spark, rows, chunk=4, overlap=1)
    for doc_id, text in rows:
        exp = _py_chunks(text, 4, 1)
        assert got.get(doc_id, []) == exp, doc_id


@pytest.mark.parametrize("n", [4, 5, 7, 8, 9])
def test_boundaries(spark, n):
    # chunk=4, overlap=1 → stride 3; n=4 → 1 chunk, n=5 → 2, n=7 → 2,
    # n=8 → 3 (last chunk short), n=9 → 3.
    text = " ".join(f"x{i}" for i in range(n))
    got = _run(spark, [(1, text)], chunk=4, overlap=1)[1]
    exp = _py_chunks(text, 4, 1)
    assert got == exp
    # coverage: last chunk ends at token n
    assert got[-1][1] + got[-1][2] - 1 == n
    # overlap: consecutive full chunks share exactly `overlap` positions
    for (i1, s1, l1, _), (i2, s2, l2, _) in zip(got, got[1:]):
        assert s2 == s1 + 3
        if l1 == 4:
            assert s1 + l1 - s2 == 1  # shared tokens


def test_no_overlap_partitions_exactly(spark):
    text = " ".join(str(i) for i in range(10))
    got = _run(spark, [(1, text)], chunk=3, overlap=0)[1]
    rebuilt = " ".join(c[3] for c in got)
    assert rebuilt == text
    assert [c[2] for c in got] == [3, 3, 3, 1]


def test_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=-1)
