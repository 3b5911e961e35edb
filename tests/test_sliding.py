"""Sliding distinct: brute-force every-window python oracle (set per
trailing window — proving the difference-array interval algebra),
single-appearance span behavior, re-appearance extension, W=1
degenerates to per-bucket distinct, empty-bucket carry, raises."""

from __future__ import annotations

import datetime

import pytest

from tldr_spark.operators.sliding import sliding_distinct

T0 = datetime.datetime(2024, 7, 1)
H0 = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp())


def _rows(occurrences):
    # occurrences: list of (key, hour_index)
    return [
        (k, T0 + datetime.timedelta(hours=h, minutes=7))
        for k, h in occurrences
    ]


def _py(occurrences, w):
    hours = [h for _, h in occurrences]
    lo, hi = min(hours), max(hours)
    out = {}
    for h in range(lo, hi + 1):
        s = {k for k, t in occurrences if h - w + 1 <= t <= h}
        out[h - lo] = len(s)
    return out


def _got(spark, occurrences, w):
    df = spark.createDataFrame(_rows(occurrences), "key string, ts timestamp")
    res = sliding_distinct(df, key_col="key", bucket="hour", window=w).collect()
    lo = min(h for _, h in occurrences)
    return {(r.bucket_epoch - H0) // 3600 - lo: r.distinct_keys for r in res}


OCC = [
    ("a", 0), ("a", 1), ("a", 10),
    ("b", 2), ("b", 3), ("b", 4),
    ("c", 0), ("c", 15),
    ("d", 7),
]


@pytest.mark.parametrize("w", [1, 3, 24])
def test_matches_bruteforce(spark, w):
    assert _got(spark, OCC, w) == _py(OCC, w)


def test_single_appearance_spans_w_windows(spark):
    occ = [("x", 0), ("pad", 30)]
    got = _got(spark, occ, 5)
    # TRAILING windows: x (hour 0) counts for h in 0..4; pad (hour 30,
    # the axis end) only for h = 30
    for h in range(0, 31):
        want = (1 if h <= 4 else 0) + (1 if h == 30 else 0)
        assert got[h] == want, h


def test_reappearance_extends_not_doublecounts(spark):
    occ = [("x", 0), ("x", 2), ("pad", 9)]
    got = _got(spark, occ, 3)
    assert got == _py(occ, 3)
    assert got[2] == 1  # x present twice in window -> counted once


def test_empty_bucket_carry(spark):
    occ = [("x", 0), ("y", 6)]
    got = _got(spark, occ, 4)
    # hours 1-3 have no events but x still in the trailing window
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 0


def test_raises(spark):
    df = spark.createDataFrame(_rows([("a", 0)]), "key string, ts timestamp")
    with pytest.raises(ValueError):
        sliding_distinct(df, key_col="key", bucket="minute")
    with pytest.raises(ValueError):
        sliding_distinct(df, key_col="key", window=0)
