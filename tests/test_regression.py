"""OLS-via-sufficient-statistics vs NumPy lstsq on dense data."""

from __future__ import annotations

import numpy as np
import pytest

from tldr_spark.operators.regression import _cramer3, ols_2feature


def _fit_np(x1, x2, y):
    X = np.column_stack([np.ones(len(y)), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    sst = ((y - y.mean()) ** 2).sum()
    sse = ((y - pred) ** 2).sum()
    return beta, 1.0 - sse / sst


def test_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x1 = rng.uniform(0, 5, 400)
    x2 = rng.uniform(-2, 2, 400)
    y = 1.5 + 0.7 * x1 - 2.2 * x2 + rng.normal(0, 0.3, 400)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    got = ols_2feature(df, "y", "x1", "x2").collect()[0]
    beta, r2 = _fit_np(x1, x2, y)
    assert got["n"] == 400
    assert got["b0"] == pytest.approx(beta[0], abs=1e-8)
    assert got["b1"] == pytest.approx(beta[1], abs=1e-8)
    assert got["b2"] == pytest.approx(beta[2], abs=1e-8)
    assert got["r2"] == pytest.approx(r2, abs=1e-10)


def test_exact_recovery_no_noise(spark):
    rows = [(float(i % 7), float((i * 3) % 5), 0.0) for i in range(50)]
    rows = [(a, b, 2.0 + 3.0 * a - 0.5 * b) for a, b, _ in rows]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = ols_2feature(df, "y", "x1", "x2").collect()[0]
    assert got["b0"] == pytest.approx(2.0, abs=1e-9)
    assert got["b1"] == pytest.approx(3.0, abs=1e-9)
    assert got["b2"] == pytest.approx(-0.5, abs=1e-9)
    assert got["r2"] == pytest.approx(1.0, abs=1e-12)


def test_singular_design_yields_nulls(spark):
    # x2 = 2*x1 -> collinear -> det 0
    rows = [(float(i), 2.0 * i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = ols_2feature(df, "y", "x1", "x2").collect()[0]
    assert got["b0"] is None and got["r2"] is None


def test_empty_input(spark):
    df = spark.createDataFrame([], "x1 double, x2 double, y double")
    got = ols_2feature(df, "y", "x1", "x2").collect()[0]
    assert got["n"] == 0 and got["b0"] is None


def test_cramer_degenerate_sst():
    # constant y: SST == 0 -> r2 NULL, coefficients finite
    b0, b1, b2, r2 = _cramer3(3, 6.0, 3.0, 9.0, 14.0, 6.0, 5.0, 18.0, 9.0, 27.0)
    assert r2 is None


def test_grouped_slope_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for g, (a, b) in enumerate([(1.0, 2.0), (-0.5, 0.1), (3.0, -1.0)]):
        x = rng.uniform(0, 10, 60)
        y = a + b * x + rng.normal(0, 0.2, 60)
        rows += [(f"g{g}", float(xi), float(yi)) for xi, yi in zip(x, y)]
    rows.append(("deg", 5.0, 7.0))  # single point -> NULL slope
    rows.append(("novar", 2.0, 1.0))
    rows.append(("novar", 2.0, 9.0))  # zero x-variance -> NULL slope
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    from tldr_spark.operators.regression import grouped_ols_slope

    got = {r["grp"]: r for r in grouped_ols_slope(df, "grp", "x", "y").collect()}
    for g, (a, b) in enumerate([(1.0, 2.0), (-0.5, 0.1), (3.0, -1.0)]):
        xs = np.array([x for gg, x, _ in rows if gg == f"g{g}"])
        ys = np.array([y for gg, _, y in rows if gg == f"g{g}"])
        bb, aa = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        row = got[f"g{g}"]
        assert row["slope"] == __import__("pytest").approx(bb, abs=1e-9)
        assert row["intercept"] == __import__("pytest").approx(aa, abs=1e-9)
        assert row["r2"] == __import__("pytest").approx(r * r, abs=1e-9)
    assert got["deg"]["slope"] is None
    assert got["novar"]["slope"] is None
