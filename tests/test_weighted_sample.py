"""A-Res weighted sampling: python oracle re-deriving the exact MINSTD →
u → ln(u)/w priorities, partitioning invariance, the P∝w statistical
property across many salts, weight<=0 exclusion, and the k>=n clamp."""

from __future__ import annotations

import math

import pytest

from tldr_spark.operators.sampling import _A, _M, _PPM, weighted_sample

ROWS = [(i, float(w)) for i, w in zip(range(40), [1, 2, 5, 100, 1, 3] * 7)]


def _bucket(key: int, salt: int) -> int:
    return (((key + salt) % _M) * _A) % _M % _PPM


def _py_topk(rows, k: int, salt: int):
    scored = []
    for key, w in rows:
        if w is None or w <= 0:
            continue
        u = (_bucket(key, salt) + 0.5) / 1e6
        scored.append((math.log(u) / w, -key))
    scored.sort(reverse=True)
    return [-negk for _, negk in scored[:k]]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, w double")


@pytest.mark.parametrize("k,salt", [(5, 0), (12, 7), (40, 3), (100, 1)])
def test_matches_python_oracle(spark, k, salt):
    got = [
        r["doc_id"]
        for r in weighted_sample(_df(spark), "doc_id", "w", k, salt=salt)
        .orderBy("doc_id").collect()
    ]
    assert sorted(got) == sorted(_py_topk(ROWS, k, salt))


def test_partitioning_invariance(spark):
    a = weighted_sample(_df(spark).repartition(7), "doc_id", "w", 8)
    b = weighted_sample(_df(spark).coalesce(1), "doc_id", "w", 8)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_selection_proportional_to_weight(spark):
    # one heavy row (w=100) among w=1 rows: across 60 salts it must be
    # selected into a k=5 sample far more often than any light row.
    rows = [(i, 100.0 if i == 0 else 1.0) for i in range(30)]
    heavy = light = 0
    for salt in range(60):
        picked = set(_py_topk(rows, 5, salt))
        heavy += 0 in picked
        light += 1 in picked
    assert heavy > 55          # heavy row nearly always in
    assert light < heavy // 2  # any fixed light row much rarer
    # and the Spark side agrees with the oracle on a few of those salts
    df = _df(spark, rows)
    for salt in (0, 13, 59):
        got = sorted(
            r["doc_id"]
            for r in weighted_sample(df, "doc_id", "w", 5, salt=salt).collect()
        )
        assert got == sorted(_py_topk(rows, 5, salt))


def test_nonpositive_weights_excluded(spark):
    rows = [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)]
    got = weighted_sample(_df(spark, rows), "doc_id", "w", 10).collect()
    assert [r["doc_id"] for r in got] == [4]


def test_k_zero_raises(spark):
    with pytest.raises(ValueError):
        weighted_sample(_df(spark), "doc_id", "w", 0)
