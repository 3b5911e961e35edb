"""Funnel conversion vs an exact python earliest-match oracle."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from tldr_spark.operators.funnel import funnel_counts


def _py_funnel(events, steps):
    # events: list of (user, type, ts); earliest-match greedy per user
    by_user: dict = {}
    for u, et, t in events:
        by_user.setdefault(u, []).append((t, et))
    counts = []
    survivors = {u: None for u in by_user}
    for step in steps:
        nxt = {}
        for u, prev_t in survivors.items():
            times = [
                t for t, et in by_user[u]
                if et == step and (prev_t is None or t > prev_t)
            ]
            if times:
                nxt[u] = min(times)
        counts.append(len(nxt))
        survivors = nxt
    return counts


def _run(spark, events, steps):
    df = spark.createDataFrame(
        [(u, et, t) for u, et, t in events],
        "user_id long, event_type string, ts timestamp",
    )
    rows = funnel_counts(df, steps).orderBy("step").collect()
    assert [r["event_type"] for r in rows] == steps
    return [r["n_users"] for r in rows]


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_hand_funnel(spark):
    events = [
        (1, "view", _ts(0)), (1, "click", _ts(1)), (1, "buy", _ts(2)),  # full
        (2, "view", _ts(0)), (2, "click", _ts(1)),                      # no buy
        (3, "click", _ts(0)), (3, "view", _ts(1)), (3, "buy", _ts(2)),  # click BEFORE view: stops after view? buy yes only if click after view
        (4, "buy", _ts(0)), (4, "view", _ts(1)),                        # view only
    ]
    steps = ["view", "click", "buy"]
    got = _run(spark, events, steps)
    assert got == _py_funnel(events, steps)
    # user 3's click precedes their view -> falls out at step 2;
    # user 4's buy precedes their view -> falls out at step 3
    assert got == [4, 2, 1]


def test_strictly_after_not_equal(spark):
    # a step-2 event at EXACTLY the step-1 timestamp does not count
    events = [(1, "a", _ts(5)), (1, "b", _ts(5)), (2, "a", _ts(5)), (2, "b", _ts(6))]
    got = _run(spark, events, ["a", "b"])
    assert got == _py_funnel(events, ["a", "b"]) == [2, 1]


def test_earliest_match_is_optimal(spark):
    # taking the EARLIEST step-1 time admits the step-2 match a later
    # choice would miss
    events = [(1, "a", _ts(0)), (1, "a", _ts(10)), (1, "b", _ts(5))]
    assert _run(spark, events, ["a", "b"]) == [1, 1]


@pytest.mark.parametrize("seed", [0, 1])
def test_random_matches_python(spark, seed):
    rnd = random.Random(seed)
    types = ["v", "c", "p", "x"]
    events = [
        (rnd.randrange(15), rnd.choice(types), _ts(rnd.randrange(500)))
        for _ in range(300)
    ]
    steps = ["v", "c", "p"]
    assert _run(spark, events, steps) == _py_funnel(events, steps)


def test_validation(spark):
    df = spark.createDataFrame([(1, "a", _ts(0))], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError):
        funnel_counts(df, [])
