"""CUSUM changepoint: exact python mirror (integer deviation argmax,
earliest-tie), step-function pinpointing, gap-bucket deviations,
single-bucket drop, flat-series behavior, raises."""

from __future__ import annotations

import datetime

import pytest

from tldr_spark.operators.changepoint import cusum_changepoints

T0 = datetime.datetime(2024, 3, 1)
DAY0 = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp())


def _rows(series):
    rows = []
    for g, counts in series.items():
        for day, c in enumerate(counts):
            for j in range(c):
                rows.append((g, T0 + datetime.timedelta(days=day, seconds=13 * j)))
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
        tot = sum(xs)
        best = None
        s = 0
        for t in range(1, big_t):  # interior buckets only
            s += xs[t - 1]
            dev = abs(big_t * s - t * tot)
            if best is None or dev > best[0]:
                best = (dev, t)
        if best is not None:
            out[g] = (lo + best[1] - 1, best[0], tot, big_t)
    return out


def _got(spark, rows):
    df = spark.createDataFrame(rows, "group string, ts timestamp")
    return {
        r.group: ((r.cp_epoch - DAY0) // 86400, r.dev_scaled, r.total, r.n_buckets)
        for r in cusum_changepoints(df, group_col="group").collect()
    }


SERIES = {
    "step_up": [2, 2, 2, 2, 10, 10, 10, 10],
    "step_down": [9, 9, 9, 1, 1, 1, 1, 1],
    "flat": [4, 4, 4, 4, 4, 4, 4, 4],
    "gappy": [6, 0, 0, 0, 0, 0, 0, 6],
    "late_spike": [1, 1, 1, 1, 1, 1, 1, 20],
}


def test_matches_python(spark):
    rows = _rows(SERIES)
    assert _got(spark, rows) == _py(SERIES)


def test_step_location(spark):
    got = _got(spark, _rows(SERIES))
    assert got["step_up"][0] == 3  # last low day: shift between day 3 and 4
    assert got["step_down"][0] == 2
    assert got["late_spike"][0] == 6


def test_flat_ties_to_earliest(spark):
    # a perfectly uniform series has dev 0 everywhere -> earliest bucket
    got = _got(spark, _rows(SERIES))
    assert got["flat"] == (0, 0, 32, 8)


def test_gap_buckets_count(spark):
    # mass at both ends, zeros inside: the python mirror (dense axis)
    # must agree, proving zero buckets participate in the deviation
    series = {"only": [5, 0, 0, 0, 0, 0, 0, 0, 0, 5]}
    assert _got(spark, _rows(series)) == _py(series)


def test_single_bucket_dropped(spark):
    rows = _rows({"a": [7]})
    assert _got(spark, rows) == {}


def test_raises(spark):
    df = spark.createDataFrame([("a", T0)], "group string, ts timestamp")
    with pytest.raises(ValueError):
        cusum_changepoints(df, group_col="group", bucket="week")
