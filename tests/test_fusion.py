"""Rank-position + RRF fusion tests (python oracle differential)."""

from __future__ import annotations

import random

import pytest

from tldr_spark.operators.fusion import rank_positions, reciprocal_rank_fusion


def _pos_oracle(scores):
    order = sorted(scores, key=lambda i: (-scores[i], i))
    return {i: p + 1 for p, i in enumerate(order)}


def _positions(spark, scores, parts=4):
    df = spark.createDataFrame(
        sorted(scores.items()), "id long, s long"
    ).repartition(parts)
    return {r["id"]: r["pos"] for r in rank_positions(df, "s").collect()}


@pytest.mark.parametrize("seed", [0, 1])
def test_rank_positions_match_oracle(spark, seed):
    rnd = random.Random(seed)
    scores = {i: rnd.randrange(20) for i in range(200)}  # heavy ties
    assert _positions(spark, scores) == _pos_oracle(scores)


def test_rank_positions_partitioning_independent(spark):
    scores = {i: (i * 7) % 13 for i in range(100)}
    assert _positions(spark, scores, parts=1) == _positions(spark, scores, parts=8)


def test_rrf_matches_python(spark):
    r1 = {1: 1, 2: 2, 3: 3}
    r2 = {3: 1, 2: 2, 9: 3}  # id 9 only in ranking 2, id 1 only in 1
    d1 = spark.createDataFrame(sorted(r1.items()), "id long, pos long")
    d2 = spark.createDataFrame(sorted(r2.items()), "id long, pos long")
    got = {r["id"]: r["rrf"] for r in reciprocal_rank_fusion([d1, d2], k=60).collect()}
    want = {}
    for r in (r1, r2):
        for i, p in r.items():
            want[i] = want.get(i, 0.0) + 1.0 / (60 + p)
    assert got.keys() == want.keys()
    assert all(abs(got[i] - want[i]) < 1e-15 for i in want)


def test_rrf_empty_rankings_raise(spark):
    with pytest.raises(ValueError):
        reciprocal_rank_fusion([])
