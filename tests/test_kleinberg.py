"""Kleinberg burst detection: exact python Viterbi mirror (same
forward/backward folds, same drop of the shared binomial coefficient),
spike-detection sanity, uniform-series silence, tie-to-state-0, gap
buckets, min_count prune, single-bucket edge, arg validation."""

from __future__ import annotations

import datetime
import math

import pytest

from tldr_spark.operators.kleinberg import kleinberg_bursts

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events_from_series(series: dict[str, list[int]]):
    """series: item -> per-day counts (shared axis). Returns rows and
    the python-side (item, day_index) burst oracle."""
    rows = []
    for item, counts in series.items():
        for day, c in enumerate(counts):
            for j in range(c):
                rows.append(
                    (item, T0 + datetime.timedelta(days=day, seconds=17 * j + 1))
                )
    return rows


def _py_bursts(series, s=2.0, gamma=1.0, min_count=1):
    tmax = max(len(v) for v in series.values()) - 1
    # dense axis over observed buckets only (events define min/max)
    lo = min(d for v in series.values() for d, c in enumerate(v) if c)
    hi = max(d for v in series.values() for d, c in enumerate(v) if c)
    big_t = hi - lo + 1
    darr = [0] * big_t
    for v in series.values():
        for d, c in enumerate(v):
            if c:
                darr[d - lo] += c
    big_d = sum(darr)
    out = set()
    for item, v in series.items():
        big_r = sum(v)
        if big_r < min_count:
            continue
        rarr = [0] * big_t
        for d, c in enumerate(v):
            if c:
                rarr[d - lo] += c
        p0 = min(big_r / big_d, 1 - 1e-9)
        p1 = min(s * p0, 1 - 1e-9)
        trans = gamma * math.log(float(big_t))
        cost = lambda p, i: -(rarr[i] * math.log(p) + (darr[i] - rarr[i]) * math.log(1.0 - p))  # noqa: E731
        c0, c1 = 0.0, float("inf")
        a0, a1 = [], []
        for i in range(big_t):
            n0 = min(c0, c1) + cost(p0, i)
            n1 = min(c1, c0 + trans) + cost(p1, i)
            c0, c1 = n0, n1
            a0.append(n0)
            a1.append(n1)
        b0, b1 = 0.0, 0.0
        bb0, bb1 = [0.0], [0.0]
        for j in range(big_t - 1, 0, -1):
            n0 = min(cost(p0, j) + b0, trans + cost(p1, j) + b1)
            n1 = min(cost(p1, j) + b1, cost(p0, j) + b0)
            b0, b1 = n0, n1
            bb0.insert(0, n0)
            bb1.insert(0, n1)
        for i in range(big_t):
            if a1[i] + bb1[i] < a0[i] + bb0[i]:
                out.add((item, lo + i))
    return out


SERIES = {
    "steady": [3, 3, 3, 3, 3, 3, 3, 3, 3, 3],
    "spike": [1, 1, 1, 1, 12, 14, 1, 1, 1, 1],
    "ramp": [0, 0, 1, 2, 3, 5, 8, 12, 0, 0],
    "rare": [0, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    "gappy": [5, 0, 0, 0, 0, 0, 0, 0, 0, 9],
}


def _got(spark, rows, **kw):
    df = spark.createDataFrame(rows, "item string, ts timestamp")
    day0 = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp())
    return {
        (r.item, (r.bucket_epoch - day0) // 86400)
        for r in kleinberg_bursts(df, **kw).collect()
    }


@pytest.mark.parametrize("s,gamma", [(2.0, 1.0), (3.0, 0.5), (1.5, 2.0)])
def test_matches_python(spark, s, gamma):
    rows = _events_from_series(SERIES)
    assert _got(spark, rows, s=s, gamma=gamma) == _py_bursts(SERIES, s=s, gamma=gamma)


def test_spike_is_burst(spark):
    rows = _events_from_series(SERIES)
    got = _got(spark, rows)
    assert ("spike", 4) in got and ("spike", 5) in got


def test_constant_shares_never_burst(spark):
    # every item's per-day share equals its base rate -> the burst state
    # never pays for its entry cost; state 0 everywhere
    series = {"a": [2, 4, 2, 6, 2], "b": [1, 2, 1, 3, 1]}
    rows = _events_from_series(series)
    assert _got(spark, rows) == set()


def test_single_item_stream_ties_to_state0(spark):
    # one item owns the whole stream: p0 clamps, rates coincide, no bursts
    series = {"only": [1, 1, 9, 1, 1]}
    rows = _events_from_series(series)
    assert _got(spark, rows) == set()


def test_min_count_prunes(spark):
    rows = _events_from_series(SERIES)
    got = _got(spark, rows, min_count=2)
    assert not any(item == "rare" for item, _ in got)
    assert got == _py_bursts(SERIES, min_count=2)


def test_single_bucket(spark):
    series = {"a": [5], "b": [1]}
    rows = _events_from_series(series)
    assert _got(spark, rows) == _py_bursts(series)


def test_r_d_columns(spark):
    rows = _events_from_series(SERIES)
    df = __import__("tldr_spark.session", fromlist=["x"]) and None
    from pyspark.sql import functions as F  # noqa: F401

    sdf = spark.createDataFrame(rows, "item string, ts timestamp")
    res = kleinberg_bursts(sdf).collect()
    dtot = {}
    for item, counts in SERIES.items():
        for d, c in enumerate(counts):
            dtot[d] = dtot.get(d, 0) + c
    day0 = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp())
    for r in res:
        day = (r.bucket_epoch - day0) // 86400
        assert r.r == SERIES[r.item][day]
        assert r.d == dtot[day]


def test_raises(spark):
    df = spark.createDataFrame([("a", T0)], "item string, ts timestamp")
    with pytest.raises(ValueError):
        kleinberg_bursts(df, bucket="minute")
    with pytest.raises(ValueError):
        kleinberg_bursts(df, s=1.0)
    with pytest.raises(ValueError):
        kleinberg_bursts(df, gamma=-0.1)
    with pytest.raises(ValueError):
        kleinberg_bursts(df, min_count=0)
