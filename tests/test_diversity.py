"""Diversity indices: python oracle, uniform-max entropy pin
(shannon_norm == 1), single-category conventions, null exclusion."""

from __future__ import annotations

import math

import pytest

from tldr_spark.operators.diversity import group_diversity


def _py(rows):
    g = {}
    for grp, cat in rows:
        if cat is None:
            continue
        g.setdefault(grp, {}).setdefault(cat, 0)
        g[grp][cat] += 1
    out = {}
    for grp, cats in g.items():
        n = sum(cats.values())
        ps = [c / n for c in cats.values()]
        h = -sum(p * math.log(p) for p in ps)
        out[grp] = (
            n,
            len(cats),
            h,
            h / math.log(len(cats)) if len(cats) > 1 else None,
            1 - sum(p * p for p in ps),
        )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g long, cat string")
    return {
        r["g"]: (r["n_rows"], r["n_cats"], r["shannon"], r["shannon_norm"], r["simpson"])
        for r in group_diversity(df, "g", "cat").collect()
    }


def test_matches_python(spark):
    rows = [(1, "en")] * 4 + [(1, "fr")] * 3 + [(1, "de")] + [(2, "en")] * 5
    got, exp = _run(spark, rows), _py(rows)
    assert set(got) == set(exp)
    for k in exp:
        for a, b in zip(got[k], exp[k]):
            if b is None:
                assert a is None
            else:
                assert a == pytest.approx(b, rel=1e-12)


def test_uniform_is_max_entropy(spark):
    rows = [(1, c) for c in "abcd" for _ in range(5)]
    got = _run(spark, rows)[1]
    assert got[3] == pytest.approx(1.0, abs=1e-12)       # normalized = 1
    assert got[2] == pytest.approx(math.log(4), rel=1e-12)
    assert got[4] == pytest.approx(0.75, abs=1e-12)


def test_single_category_and_nulls(spark):
    rows = [(1, "en"), (1, "en"), (1, None), (2, None)]
    got = _run(spark, rows)
    assert got[1] == (2, 1, 0.0, None, pytest.approx(0.0, abs=1e-12))
    assert 2 not in got  # all-null group disappears
