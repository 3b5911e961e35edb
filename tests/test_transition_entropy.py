"""Transition entropy vs a Python mirror on hand sessions."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from tldr_spark.operators.sessions import session_transitions, transition_entropy

T0 = dt.datetime(2024, 1, 1, 9, 0, 0)


def _events(spark):
    # user 1: view->click, view->click (deterministic from 'view')
    # user 2: click->view, click->purchase (uncertain from 'click')
    seq = [
        (1, ["view", "click", "view", "click"]),
        (2, ["click", "view", "click", "purchase"]),
    ]
    rows, eid = [], 0
    for uid, types in seq:
        for i, t in enumerate(types):
            rows.append((eid, uid, T0 + dt.timedelta(minutes=i), t))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")


def test_matches_mirror(spark):
    df = _events(spark)
    trans = [
        (r["from_type"], r["to_type"], r["n_transitions"])
        for r in session_transitions(df, gap_seconds=1800).collect()
    ]
    per = Counter()
    for f, t, n in trans:
        per[f] += n
    want = {}
    for f in per:
        ns = [n for ff, _, n in trans if ff == f]
        nf = sum(ns)
        want[f] = (nf, len(ns), (math.log(nf) - sum(n * math.log(n) for n in ns) / nf) / math.log(2))
    got = {r["from_type"]: (r["n_from"], r["n_targets"], r["entropy_bits"])
           for r in transition_entropy(df, gap_seconds=1800).collect()}
    assert set(got) == set(want)
    for f in want:
        assert got[f][:2] == want[f][:2]
        assert abs(got[f][2] - want[f][2]) < 1e-12
    # 'view' always leads to click -> 0 bits; 'click' is uncertain -> > 0
    assert got["view"][2] == 0.0
    assert got["click"][2] > 0.9


def test_trigram_paths(spark):
    from tldr_spark.operators.sessions import session_trigram_paths

    df = _events(spark)
    got = [
        (r["t1"], r["t2"], r["t3"], r["n_paths"])
        for r in session_trigram_paths(df, gap_seconds=1800).collect()
    ]
    # user1: view,click,view,click -> triples (v,c,v), (c,v,c)
    # user2: click,view,click,purchase -> (c,v,c), (v,c,p)
    assert set(got) == {
        ("view", "click", "view", 1),
        ("click", "view", "click", 2),
        ("view", "click", "purchase", 1),
    }
    # deterministic order: n DESC then lexicographic
    assert got[0] == ("click", "view", "click", 2)


def test_trigram_paths_respect_session_boundary(spark):
    import datetime as dt

    from tldr_spark.operators.sessions import session_trigram_paths

    rows = [
        (0, 1, T0, "a"),
        (1, 1, T0 + dt.timedelta(minutes=1), "b"),
        # 2h gap: new session — no triple may span it
        (2, 1, T0 + dt.timedelta(hours=2), "c"),
        (3, 1, T0 + dt.timedelta(hours=2, minutes=1), "d"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    assert session_trigram_paths(df, gap_seconds=1800).count() == 0
