"""2-D skyline: brute-force dominance python oracle (random differential),
tie semantics (same-x strictly-worse dropped, exact duplicates kept),
single staircase shape check, null handling, non-integer-x raise."""

from __future__ import annotations

import pytest

from tldr_spark.operators.skyline import skyline2d


def _py_skyline(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (x2 >= x and y2 > y) or (x2 > x and y2 >= y)
            for j, (x2, y2) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _run(spark, points):
    df = spark.createDataFrame(
        [(i, int(x), float(y)) for i, (x, y) in enumerate(points)],
        "id long, x long, y double",
    )
    return sorted((r["x"], r["y"]) for r in skyline2d(df, "x", "y").collect())


def test_staircase(spark):
    pts = [(1, 9.0), (2, 7.0), (3, 8.0), (4, 4.0), (5, 1.0), (2, 2.0)]
    got = _run(spark, pts)
    assert got == _py_skyline(pts) == [(1, 9.0), (3, 8.0), (4, 4.0), (5, 1.0)]


def test_ties_and_duplicates(spark):
    # same x, lower y drops; exact duplicate undominated points both stay
    pts = [(5, 5.0), (5, 5.0), (5, 3.0), (4, 6.0)]
    got = _run(spark, pts)
    assert got == [(4, 6.0), (5, 5.0), (5, 5.0)]


def test_random_differential(spark):
    # _py_skyline emits one entry per undominated point INSTANCE, so
    # duplicates compare one-to-one with the engine's surviving rows.
    x = 99
    pts = []
    for _ in range(300):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        pts.append((x % 50, float((x >> 32) % 40)))
    assert _run(spark, pts) == _py_skyline(pts)


def test_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(1, 1, 1.0), (2, None, 9.0), (3, 9, None)], "id long, x long, y double"
    )
    got = skyline2d(df, "x", "y").collect()
    assert [r["id"] for r in got] == [1]


def test_fractional_x_raises(spark):
    df = spark.createDataFrame([(1.5, 1.0)], "x double, y double")
    with pytest.raises(ValueError):
        skyline2d(df, "x", "y")
