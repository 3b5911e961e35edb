"""Sequence packing — python oracle parity + partitioning invariance."""

from __future__ import annotations

import pytest

from tldr_spark.operators.packing import pack_sequences

DOCS = [
    (0, "a b c d e"),          # 5 tokens -> seq 0 [0..5)
    (1, ""),                   # empty: occupies nothing at start=5
    (2, "f g h"),              # 3 tokens -> 5..8, spans the cap-8 boundary
    (3, "i j k l m n o p q"),  # 9 tokens -> 8..17, spans seqs 1-2
    (4, "   r   s  "),         # whitespace runs collapse: 2 tokens
]


def _oracle(docs, capacity):
    toks = {i: len([t for t in txt.strip().split() if t]) for i, txt in docs}
    start, out = 0, {}
    for i in sorted(toks):
        n = toks[i]
        out[i] = (
            n,
            start // capacity,
            (start + max(n, 1) - 1) // capacity,
            start % capacity,
        )
        start += n
    return out


def _run(spark, docs=DOCS, capacity=8, n_parts=None):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    if n_parts:
        df = df.repartition(n_parts)
    return {
        r.doc_id: (r.n_tokens, r.first_seq, r.last_seq, r.offset_in_first)
        for r in pack_sequences(df, capacity=capacity).collect()
    }


def test_matches_python_oracle(spark):
    assert _run(spark) == _oracle(DOCS, 8)


def test_span_semantics(spark):
    got = _run(spark)
    assert got[0] == (5, 0, 0, 0)  # fits in seq 0
    assert got[1] == (0, 0, 0, 5)  # empty doc: degenerate span at start=5
    assert got[2] == (3, 0, 0, 5)  # fills seq 0 exactly to the boundary
    assert got[3] == (9, 1, 2, 0)  # starts exactly on a boundary
    assert got[4] == (2, 2, 2, 1)


def test_partitioning_invariance(spark):
    # the prefix sum must depend only on doc_id order, not input layout
    docs = [(i, "tok " * (1 + (i * 7) % 13)) for i in range(97)]
    base = _run(spark, docs, capacity=16)
    assert base == _oracle(docs, 16)
    for parts in (1, 3, 16):
        assert _run(spark, docs, capacity=16, n_parts=parts) == base


def test_capacity_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, capacity=0)


def test_sequences_are_gapless_and_full(spark):
    # every sequence before the last must receive exactly `capacity`
    # tokens: reconstruct per-seq fill from the spans and check.
    capacity = 16
    docs = [(i, "tok " * (1 + (i * 7) % 13)) for i in range(97)]
    got = _run(spark, docs, capacity=capacity)
    total = sum(v[0] for v in got.values())
    n_seqs = max(v[2] for v in got.values()) + 1
    fill = [0] * n_seqs
    for n, first, last, off in got.values():
        pos = first * capacity + off
        for t in range(n):
            fill[(pos + t) // capacity] += 1
    assert sum(fill) == total
    assert all(f == capacity for f in fill[:-1])
