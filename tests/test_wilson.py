"""Wilson lower bound vs a Python mirror + the classic ranking property."""

from __future__ import annotations

import math

from tldr_spark.operators.stats import wilson_lower_bound


def _py_lb(k, n, z=1.96):
    p = k / n
    z2 = z * z
    return (p + z2 / (2 * n) - z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (
        1 + z2 / n
    )


def test_matches_python_and_ranks_sanely(spark):
    rows = (
        [("tiny", 1)] * 1
        + [("big", 1)] * 950 + [("big", 0)] * 50
        + [("mid", 1)] * 8 + [("mid", 0)] * 2
        + [("zero", 0)] * 5
    )
    df = spark.createDataFrame(rows, "src string, ok int")
    got = {r["grp"]: r for r in wilson_lower_bound(df, "src", "ok").collect()}
    for g, (k, n) in {"tiny": (1, 1), "big": (950, 1000), "mid": (8, 10), "zero": (0, 5)}.items():
        assert (got[g]["k"], got[g]["n"]) == (k, n)
        assert abs(got[g]["wilson_lb"] - _py_lb(k, n)) < 1e-12
    # the point of Wilson: 1-for-1 ranks BELOW 950-for-1000
    assert got["tiny"]["phat"] == 1.0
    assert got["tiny"]["wilson_lb"] < got["big"]["wilson_lb"]
    assert abs(got["zero"]["wilson_lb"]) < 1e-12  # 0 up to fp cancellation
