"""Bloom filter: position oracle, the no-false-negative law, exact
deterministic FPR vs a python re-computation, duplicate-position probes,
and raises."""

from __future__ import annotations

import pytest

from tldr_spark.operators.bloom import _A, _M, _SALT_STRIDE, bloom_build, bloom_probe


def _pos(key: int, i: int, m: int, salt: int = 0) -> int:
    g = ((key + i * _SALT_STRIDE + salt) % _M) * _A % _M
    return (g * g + g) % _M % m


def _py_bits(keys, m, k, salt=0):
    return {_pos(x, i, m, salt) for x in keys for i in range(k)}


def _py_hit(bits, key, m, k, salt=0):
    return all(_pos(key, i, m, salt) in bits for i in range(k))


def _rand(seed, n, lim):
    x, out = seed, []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(x % lim)
    return out


def _df(spark, keys):
    return spark.createDataFrame([(int(x),) for x in keys], "id long")


M, K = 1 << 12, 4


def test_bits_match_python(spark):
    members = _rand(1, 300, 10**9)
    bits = bloom_build(_df(spark, members), "id", M, K)
    got = sorted(r["pos"] for r in bits.collect())
    assert got == sorted(_py_bits(members, M, K))


def test_no_false_negatives_and_exact_fpr(spark):
    members = set(_rand(2, 500, 10**9))
    probes = [x for x in _rand(3, 800, 10**9) if x not in members]
    bits = bloom_build(_df(spark, members), "id", M, K)
    # every member hits
    hits = {
        r["key"]: r["hit"]
        for r in bloom_probe(bits, _df(spark, members), "id", M, K).collect()
    }
    assert all(hits.values())
    # non-member FPR equals the python recomputation exactly
    got = {
        r["key"]: r["hit"]
        for r in bloom_probe(bits, _df(spark, probes), "id", M, K).collect()
    }
    pybits = _py_bits(members, M, K)
    exp = {x: _py_hit(pybits, x, M, K) for x in probes}
    assert got == exp
    fp = sum(exp.values())
    assert 0 < fp < len(probes) * 0.25  # small m forces some, not most


def test_salt_changes_bits(spark):
    members = _rand(4, 100, 10**9)
    a = {r["pos"] for r in bloom_build(_df(spark, members), "id", M, K).collect()}
    b = {r["pos"] for r in bloom_build(_df(spark, members), "id", M, K, salt=9).collect()}
    assert a != b


def test_raises(spark):
    df = _df(spark, [1])
    with pytest.raises(ValueError):
        bloom_build(df, "id", 1, 4)
    with pytest.raises(ValueError):
        bloom_build(df, "id", 64, 0)
