"""Systematic resampling — exactness invariants + python oracle."""

from __future__ import annotations

import pytest

from tldr_spark.operators.mixing import quality_weighted_mix, systematic_resample


def _oracle(weights, multiplier):
    ids = sorted(weights)
    W = sum(weights.values())
    M = multiplier * len(ids)
    out, c = {}, 0
    for i in ids:
        w = weights[i]
        out[i] = ((c + w) * M) // W - (c * M) // W
        c += w
    return out


def _run(spark, weights, multiplier=2):
    df = spark.createDataFrame(
        sorted(weights.items()), "doc_id long, w long"
    )
    return {
        r.doc_id: r.n_copies
        for r in systematic_resample(df, multiplier=multiplier).collect()
    }


def test_matches_python_oracle_and_total_is_exact(spark):
    weights = {i: 1 + (i * 7) % 4 for i in range(83)}
    for mult in (1, 2, 5):
        got = _run(spark, weights, mult)
        assert got == _oracle(weights, mult)
        assert sum(got.values()) == mult * len(weights)


def test_counts_within_one_of_real_share(spark):
    weights = {i: 1 + (i * 13) % 4 for i in range(60)}
    got = _run(spark, weights, 3)
    W, M = sum(weights.values()), 3 * len(weights)
    for i, n in got.items():
        share = weights[i] * M / W
        assert share - 1 < n < share + 1


def test_zero_weight_docs_dropped(spark):
    weights = {0: 0, 1: 2, 2: 0, 3: 2}
    got = _run(spark, weights, 2)
    assert got[0] == 0 and got[2] == 0
    assert got[1] == 4 and got[3] == 4  # equal weights split M exactly


def test_uniform_weights_give_exact_multiplier(spark):
    weights = {i: 3 for i in range(17)}
    got = _run(spark, weights, 4)
    assert all(n == 4 for n in got.values())


def test_multiplier_validation(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, w long")
    with pytest.raises(ValueError):
        systematic_resample(df, multiplier=0)


def test_quality_weighted_wrapper(spark):
    docs = [
        (0, "the cat and the dog went to the market in town today"),  # high
        (1, "!!! ??? ### $$$ %%%"),  # punct-heavy, low quality
        (2, ""),  # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.w, r.n_copies) for r in quality_weighted_mix(df).collect()}
    assert sum(n for _, n in got.values()) == 6
    assert got[0][0] > got[1][0]  # quality ordering reflected in weights


def test_temperature_resample_shares_and_exact_total(spark):
    import math

    from tldr_spark.operators.mixing import temperature_resample

    # 64 docs of a high-resource lang, 4 of a low-resource one
    rows = [(i, "en") for i in range(64)] + [(100 + i, "xx") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.doc_id: (r.lang, r.w, r.n_copies) for r in temperature_resample(df).collect()}
    assert len(got) == 68
    # exact integer weights: 65536 // isqrt(n_l)
    assert all(w == 65536 // math.isqrt(64) for l, w, _ in got.values() if l == "en")
    assert all(w == 65536 // math.isqrt(4) for l, w, _ in got.values() if l == "xx")
    # telescoping-floor invariant: total copies == n_docs exactly
    assert sum(n for _, _, n in got.values()) == 68
    # alpha=0.5 rebalancing: per-DOC copies of the low-resource lang
    # exceed the high-resource lang's (weight ratio 2:1)
    en = sum(n for l, _, n in got.values() if l == "en") / 64
    xx = sum(n for l, _, n in got.values() if l == "xx") / 4
    assert xx > en


def test_temperature_resample_single_language_identity(spark):
    from tldr_spark.operators.mixing import temperature_resample

    df = spark.createDataFrame([(i, "en") for i in range(10)], "doc_id long, lang string")
    got = {r.doc_id: r.n_copies for r in temperature_resample(df).collect()}
    # equal weights -> exactly one copy each
    assert got == {i: 1 for i in range(10)}
