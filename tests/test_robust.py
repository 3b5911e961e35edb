"""Robust median/MAD outliers: python rank-statistics oracle (random
differential over several group shapes), even/odd lower-median pins,
MAD=0 degenerate behavior, single-row groups, outlier-threshold boundary."""

from __future__ import annotations

import math

from tldr_spark.operators.robust import _THRESH_DEN, _THRESH_NUM, robust_outliers


def _py(rows):
    groups = {}
    for k, v in rows:
        groups.setdefault(k, []).append(v)
    out = {}
    for k, vals in groups.items():
        n = len(vals)
        med = sorted(vals)[math.ceil(n / 2) - 1]
        ads = sorted(abs(v - med) for v in vals)
        mad = ads[math.ceil(n / 2) - 1]
        n_out = sum(
            1 for v in vals if abs(v - med) * _THRESH_DEN > _THRESH_NUM * mad
        )
        out[k] = (n, med, mad, n_out)
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    return {
        r["k"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
        for r in robust_outliers(df, "k", "v").collect()
    }


def test_even_odd_lower_median(spark):
    rows = [(1, 10), (1, 20), (1, 30), (2, 1), (2, 2), (2, 3), (2, 100)]
    got = _run(spark, rows)
    assert got == _py(rows)
    assert got[1][1] == 20       # odd group: middle
    assert got[2][1] == 2        # even group: LOWER median


def test_outlier_detected_and_boundary(spark):
    # nonzero MAD (5): only the huge value clears 3*1.4826*5 ≈ 22.2
    rows = [(1, 90), (1, 95), (1, 100), (1, 105), (1, 110), (1, 10_000)]
    got = _run(spark, rows)
    assert got == _py(rows)
    assert got[1] == (6, 100, 5, 1)
    # boundary: ad * DEN == NUM * mad must NOT flag (strict >)
    mad = 10
    ad_eq = _THRESH_NUM * mad // _THRESH_DEN  # 44 -> 44*1e4 < 44478*10
    base = [(2, 0), (2, 0), (2, -mad), (2, mad), (2, mad)]
    rows2 = base + [(2, ad_eq)]
    got2 = _run(spark, rows2)
    assert got2 == _py(rows2)


def test_mad_zero_degenerate(spark):
    rows = [(1, 5)] * 6 + [(1, 6)]
    got = _run(spark, rows)
    assert got == _py(rows)
    assert got[1][2] == 0 and got[1][3] == 1  # every non-median flagged


def test_single_row_groups(spark):
    rows = [(1, 42), (2, -7)]
    got = _run(spark, rows)
    assert got == _py(rows)
    assert got[1] == (1, 42, 0, 0)


def test_random_differential(spark):
    x = 31337
    rows = []
    for _ in range(600):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        rows.append((x % 7, (x >> 24) % 1000 - 500))
    assert _run(spark, rows) == _py(rows)
