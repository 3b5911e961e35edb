"""Spearman rho: exact python oracle (common-subset ranks, same total
order), identical-ranking +1 pin, exactly-reversed -1 pin, common-id
restriction semantics (disjoint extras must not shift ranks),
deterministic tie handling, degenerate n<=1 NULL."""

from __future__ import annotations

import random

from tldr_spark.operators.rankcorr import spearman_rho


def _py(a, b):
    common = set(a) & set(b)
    if len(common) <= 1:
        return (len(common), 0, None)
    order_a = sorted(common, key=lambda i: (-a[i], i))
    order_b = sorted(common, key=lambda i: (-b[i], i))
    pa = {i: p + 1 for p, i in enumerate(order_a)}
    pb = {i: p + 1 for p, i in enumerate(order_b)}
    n = len(common)
    sd2 = sum((pa[i] - pb[i]) ** 2 for i in common)
    return (n, sd2, 1.0 - 6.0 * sd2 / (n * (n * n - 1)))


def _got(spark, a, b):
    da = spark.createDataFrame(list(a.items()), "id long, score long")
    db = spark.createDataFrame(list(b.items()), "id long, score long")
    (r,) = spearman_rho(da, db).collect()
    return (r.n, r.sum_d2, r.rho)


def test_matches_python_random(spark):
    rng = random.Random(11)
    a = {i: rng.randrange(1000) for i in range(80)}
    b = {i: rng.randrange(1000) for i in range(5, 95)}  # partial overlap
    n, sd2, rho = _py(a, b)
    gn, gsd2, grho = _got(spark, a, b)
    assert (gn, gsd2) == (n, sd2)
    assert abs(grho - rho) < 1e-12


def test_identical_is_one(spark):
    a = {i: i * 7 % 101 for i in range(50)}
    n, sd2, rho = _got(spark, a, a)
    assert (sd2, rho) == (0, 1.0)


def test_reversed_is_minus_one(spark):
    a = {i: i for i in range(40)}
    b = {i: -i for i in range(40)}
    _, _, rho = _got(spark, a, b)
    assert abs(rho + 1.0) < 1e-12


def test_common_subset_ranking(spark):
    # extras outside the overlap must NOT shift ranks: rho over the
    # common ids alone is 1 even though side A has higher-scored extras
    a = {1: 10, 2: 9, 3: 8, 100: 1000, 101: 999}
    b = {1: 3, 2: 2, 3: 1, 200: 50}
    n, sd2, rho = _got(spark, a, b)
    assert (n, sd2, rho) == (3, 0, 1.0)


def test_degenerate_null(spark):
    a, b = {1: 5}, {1: 9}
    n, sd2, rho = _got(spark, a, b)
    assert n == 1 and rho is None
