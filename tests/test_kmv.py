"""KMV sketch: python oracle for the exact sketch contents, the merge law
(union-of-sketches == sketch-of-union, the mergeability contract), the
under-k exact path, estimate accuracy on a large random set, and
duplicate-insensitivity."""

from __future__ import annotations

import pytest

from tldr_spark.operators.kmv import _A, _M, kmv_distinct, kmv_estimate, kmv_sketch


def _h(key: int, salt: int = 0) -> int:
    return ((key + salt) % _M) * _A % _M


def _py_sketch(keys, k: int, salt: int = 0):
    return sorted({_h(x, salt) for x in keys})[:k]


def _df(spark, keys):
    return spark.createDataFrame([(int(x),) for x in keys], "x long")


def _rand(seed, n, m):
    x, out = seed, []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(x % m)
    return out


def test_sketch_matches_python_oracle(spark):
    keys = _rand(1, 500, 10**9)
    for k, salt in [(16, 0), (64, 7)]:
        got = [r["h"] for r in kmv_sketch(_df(spark, keys), "x", k, salt).collect()]
        assert sorted(got) == _py_sketch(keys, k, salt)


def test_merge_law(spark):
    a_keys = _rand(2, 400, 10**8)
    b_keys = _rand(3, 400, 10**8)
    k = 32
    a = kmv_sketch(_df(spark, a_keys), "x", k)
    b = kmv_sketch(_df(spark, b_keys), "x", k)
    from pyspark.sql import functions as F

    merged = sorted(
        r["h"] for r in a.union(b).distinct().orderBy("h").limit(k).collect()
    )
    direct = sorted(
        r["h"] for r in kmv_sketch(_df(spark, a_keys + b_keys), "x", k).collect()
    )
    assert merged == direct
    # and the merged estimate equals the direct estimate
    est_m = kmv_estimate(a.union(b).distinct().orderBy("h").limit(k), k).collect()[0]
    est_d = kmv_distinct(_df(spark, a_keys + b_keys), "x", k).collect()[0]
    assert tuple(est_m) == tuple(est_d)


def test_under_k_is_exact(spark):
    keys = list(range(10)) * 5  # 10 distinct, lots of dups
    row = kmv_distinct(_df(spark, keys), "x", k=64).collect()[0]
    assert row["k_used"] == 10
    assert row["distinct_est"] == 10


def test_duplicates_do_not_move_the_sketch(spark):
    keys = _rand(4, 300, 10**7)
    once = [r["h"] for r in kmv_sketch(_df(spark, keys), "x", 32).collect()]
    thrice = [r["h"] for r in kmv_sketch(_df(spark, keys * 3), "x", 32).collect()]
    assert sorted(once) == sorted(thrice)


def test_estimate_accuracy(spark):
    keys = _rand(5, 30_000, 10**12)
    true = len(set(keys))
    row = kmv_distinct(_df(spark, keys), "x", k=256).collect()[0]
    assert row["k_used"] == 256
    assert abs(row["distinct_est"] - true) / true < 0.25


def test_k_too_small_raises(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_df(spark, [1]), "x", k=1)
