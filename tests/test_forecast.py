"""Seasonal-naive MASE evaluation vs a pure-Python mirror."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from tldr_spark.operators.forecast import seasonal_naive_eval

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events(pattern, grp="a", days=4):
    """One event per unit of pattern[h % 24] at each hour (0 => gap)."""
    rows = []
    for d in range(days):
        for h in range(24):
            for _ in range(pattern[h % len(pattern)]):
                rows.append((grp, T0 + dt.timedelta(days=d, hours=h)))
    return rows


def _py_eval(rows, season=24):
    per = {}
    for g, t in rows:
        per.setdefault(g, Counter())[int(t.timestamp()) // 3600] += 1
    out = {}
    for g, cnt in per.items():
        h0, h1 = min(cnt), max(cnt)
        ys = [cnt.get(h, 0) for h in range(h0, h1 + 1)]
        num = sum(abs(ys[i] - ys[i - season]) for i in range(season, len(ys)))
        den = sum(abs(ys[i] - ys[i - 1]) for i in range(season, len(ys)))
        out[g] = (len(ys) - season, num, den, num / den if den else None)
    return out


def test_matches_python_and_seasonal_signal(spark):
    # strongly diurnal series -> seasonal naive crushes the random walk
    diurnal = [1, 0, 0, 1, 2, 5, 9, 9, 5, 2, 1, 1] * 2
    noise = [3] * 24  # flat series -> both errors 0 inside, den may be 0
    rows = _events(diurnal, "diurnal") + _events(noise, "flat")
    # perturb the flat series so the denominator is nonzero
    rows += [("flat", T0 + dt.timedelta(days=1, hours=5))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r["grp"]: (r["n_scored"], r["mae_seasonal_num"], r["mae_naive_num"], r["mase"])
        for r in seasonal_naive_eval(df).collect()
    }
    want = _py_eval(rows)
    assert set(got) == set(want)
    for g in want:
        assert got[g][:3] == want[g][:3]
        if want[g][3] is None:
            assert got[g][3] is None
        else:
            assert abs(got[g][3] - want[g][3]) < 1e-12
    assert got["diurnal"][3] < 1.0  # seasonality is real signal


def test_gap_hours_count_as_zero(spark):
    # two events 3 hours apart, then one a day later: spine densifies
    rows = [
        ("g", T0),
        ("g", T0 + dt.timedelta(hours=3)),
        ("g", T0 + dt.timedelta(hours=27)),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = seasonal_naive_eval(df).collect()[0]
    # spine h0..h0+27 -> 28 hours, scored = 4 (hours 24..27)
    assert r["n_scored"] == 4
    # y = [1,0,0,1,0*20,0,0,0,1]; seasonal errors |0-1|,|0-0|,|0-0|,|1-1| = 1
    assert r["mae_seasonal_num"] == 1
    # naive errors at hours 24..27: |0-0|,|0-0|,|0-0|,|1-0| = 1
    assert r["mae_naive_num"] == 1
