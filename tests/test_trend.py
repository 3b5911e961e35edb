"""Mann-Kendall: exact python oracle (S, tie-corrected variance, z),
known monotonic series pins, flat-series zero, gap-tie participation,
raises."""

from __future__ import annotations

import datetime
import math

import pytest

from tldr_spark.operators.trend import mann_kendall

T0 = datetime.datetime(2024, 5, 1)


def _rows(series):
    rows = []
    for g, counts in series.items():
        for day, c in enumerate(counts):
            for j in range(c):
                rows.append((g, T0 + datetime.timedelta(days=day, seconds=7 * j)))
    return rows


def _py(series):
    lo = min(d for v in series.values() for d, c in enumerate(v) if c)
    hi = max(d for v in series.values() for d, c in enumerate(v) if c)
    big_t = hi - lo + 1
    out = {}
    for g, v in series.items():
        xs = [0] * big_t
        for d, c in enumerate(v):
            if c:
                xs[d - lo] += c
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(big_t)
            for j in range(i + 1, big_t)
        )
        tie = {}
        for x in xs:
            tie[x] = tie.get(x, 0) + 1
        var18 = big_t * (big_t - 1) * (2 * big_t + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in tie.values()
        )
        if s == 0 or var18 == 0:
            z = 0.0
        elif s > 0:
            z = (s - 1) / math.sqrt(var18 / 18.0)
        else:
            z = (s + 1) / math.sqrt(var18 / 18.0)
        out[g] = (s, var18, big_t, z)
    return out


SERIES = {
    "rising": [1, 2, 3, 4, 5, 6, 7, 8],
    "falling": [9, 7, 6, 5, 4, 3, 2, 1],
    "flat": [4, 4, 4, 4, 4, 4, 4, 4],
    "noisy": [3, 1, 4, 1, 5, 9, 2, 6],
    "gappy": [2, 0, 0, 0, 0, 0, 0, 7],
}


def _got(spark, rows):
    df = spark.createDataFrame(rows, "group string, ts timestamp")
    return {
        r.group: (r.s_stat, r.var18, r.n_buckets, r.z)
        for r in mann_kendall(df, group_col="group").collect()
    }


def test_matches_python(spark):
    got = _got(spark, _rows(SERIES))
    want = _py(SERIES)
    assert set(got) == set(want)
    for g in want:
        assert got[g][:3] == want[g][:3], g
        assert abs(got[g][3] - want[g][3]) < 1e-12, g


def test_monotonic_pins(spark):
    got = _got(spark, _rows(SERIES))
    # strictly rising, no ties: S = C(8,2) = 28, var18 = 8*7*21 = 1176
    assert got["rising"][:2] == (28, 1176)
    assert got["falling"][0] == -28
    assert got["rising"][3] > 2.4 and got["falling"][3] < -2.4
    assert got["flat"] == (0, 0, 8, 0.0)


def test_gap_ties(spark):
    # gappy: xs = [2,0,0,0,0,0,0,7] -> six zero ties shrink the variance
    got = _got(spark, _rows(SERIES))
    s, var18, big_t, z = got["gappy"]
    assert big_t == 8
    assert var18 == 8 * 7 * 21 - 6 * 5 * 17
    # 2 beats six 0s (-6), 2<7 (+1), six 0s < 7 (+6)
    assert s == 1
    assert (s, var18, big_t, z) == _py({"gappy": SERIES["gappy"]})["gappy"]


def test_raises(spark):
    df = spark.createDataFrame([("a", T0)], "group string, ts timestamp")
    with pytest.raises(ValueError):
        mann_kendall(df, group_col="group", bucket="month")
