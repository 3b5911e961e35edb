"""Token-length percentiles — nearest-rank exactness."""

from __future__ import annotations

import math

from tldr_spark.operators.textstats import token_length_percentiles


def _oracle(lengths, pcts=(50, 90, 99)):
    d = sorted(lengths)
    n = len(d)
    out = {"n_docs": n}
    for p in pcts:
        out[f"p{p}_tokens"] = d[math.ceil(p * n / 100) - 1]
    out["max_tokens"] = d[-1]
    return out


def _run(spark, lengths):
    docs = [(i, "tok " * L) for i, L in enumerate(lengths)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return token_length_percentiles(df).collect()[0].asDict()


def test_matches_python_oracle(spark):
    lengths = [1 + (i * 37) % 100 for i in range(97)]
    assert _run(spark, lengths) == _oracle(lengths)


def test_nearest_rank_not_interpolated(spark):
    # n=4, p50 -> rank ceil(2)=2: the 2nd value EXACTLY, never (10+20)/2.
    lengths = [1, 10, 20, 1000]
    got = _run(spark, lengths)
    assert got["p50_tokens"] == 10
    assert got["p90_tokens"] == 1000  # rank ceil(3.6)=4
    assert got["max_tokens"] == 1000


def test_empty_and_constant_corpora(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    z = token_length_percentiles(df).collect()[0]
    assert tuple(z) == (0, 0, 0, 0, 0)
    const = _run(spark, [7] * 25)
    assert const == {
        "n_docs": 25, "p50_tokens": 7, "p90_tokens": 7,
        "p99_tokens": 7, "max_tokens": 7,
    }
