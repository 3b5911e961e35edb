"""Cohort retention matrix — python-oracle differential + edge cases."""

import datetime as dt

import pytest

from tldr_spark.operators.retention import retention_cohorts

EPOCH = dt.datetime(1970, 1, 1)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return EPOCH + dt.timedelta(days=day, hours=hour)


def _python_oracle(rows, unit_days=7):
    per = {(u, (d // unit_days)) for u, d in rows}
    first = {}
    for u, p in per:
        first[u] = min(first.get(u, p), p)
    cells = {}
    for u, p in per:
        key = (first[u], p - first[u])
        cells[key] = cells.get(key, 0) + 1
    return {
        (EPOCH.date() + dt.timedelta(days=c * unit_days), off): n
        for (c, off), n in cells.items()
    }


def _run(spark, rows, unit_days=7):
    df = spark.createDataFrame(
        [(u, _ts(d, h)) for u, d, h in rows], "user_id long, ts timestamp"
    )
    got = retention_cohorts(df, unit_days=unit_days).collect()
    return {(r["cohort_start"], r["offset"]): r["n_users"] for r in got}


def test_matches_python_oracle(spark):
    # users: 1 active weeks 0,1,3 (skips 2 and returns); 2 only week 0;
    # 3 joins week 1, active weeks 1,2; 4 joins week 3
    rows = [
        (1, 0, 5), (1, 3, 0), (1, 8, 1), (1, 22, 0),
        (2, 2, 0),
        (3, 7, 0), (3, 15, 23),
        (4, 21, 12), (4, 21, 13),
    ]
    got = _run(spark, rows)
    want = _python_oracle([(u, d) for u, d, _ in rows])
    assert got == want
    # spot-check the shape: cohort week-0 has 2 users at offset 0
    assert got[(dt.date(1970, 1, 1), 0)] == 2
    # user 1 skipped week 2: no (week0, 2) cell from them; week-0 cohort
    # has no offset-2 activity at all
    assert (dt.date(1970, 1, 1), 2) not in got


def test_multiple_events_one_period_count_once(spark):
    rows = [(1, 0, 1), (1, 1, 2), (1, 6, 23)]  # all inside week 0
    got = _run(spark, rows)
    assert got == {(dt.date(1970, 1, 1), 0): 1}


def test_unit_days_one(spark):
    rows = [(1, 0, 0), (1, 2, 5), (2, 1, 0)]
    got = _run(spark, rows, unit_days=1)
    assert got == {
        (dt.date(1970, 1, 1), 0): 1,  # user 1, first day
        (dt.date(1970, 1, 1), 2): 1,  # user 1 returns 2 days after cohort start
        (dt.date(1970, 1, 2), 0): 1,  # user 2's own day-1 cohort
    }


def test_rejects_nonpositive_unit(spark):
    df = spark.createDataFrame([(1, _ts(0))], "user_id long, ts timestamp")
    with pytest.raises(ValueError):
        retention_cohorts(df, unit_days=0)


def test_random_differential(spark):
    import random

    rng = random.Random(7)
    rows = [
        (rng.randrange(20), rng.randrange(60), rng.randrange(24))
        for _ in range(400)
    ]
    got = _run(spark, rows)
    want = _python_oracle([(u, d) for u, d, _ in rows])
    assert got == want
