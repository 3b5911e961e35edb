"""As-of join: python oracle over handcrafted timelines, inclusive vs
exclusive equal-ts semantics, no-prior-match nulls, tolerance nulling,
equal-ts tiebreak, payload-collision raise, and a random differential."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tldr_spark.operators.asof import asof_join

# (event_id, key, ts_us)
LEFT = [
    (100, 1, 50),
    (101, 1, 10),   # before any right row for key 1
    (102, 1, 30),   # exactly equal to a right ts
    (103, 2, 40),
    (104, 3, 40),   # key 3 has no right rows at all
]
RIGHT = [
    (200, 1, 20, "a"),
    (201, 1, 30, "b"),
    (202, 1, 45, "c"),
    (203, 2, 40, "d"),
    (204, 2, 5, "e"),
]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "event_id long, key long, ts long")
    r = spark.createDataFrame(RIGHT, "rid long, key long, ts long, tag string")
    return l, r


def _py_asof(inclusive: bool, tolerance=None):
    out = {}
    for eid, k, ts in LEFT:
        cands = [
            (rts, rid, tag)
            for rid, rk, rts, tag in RIGHT
            if rk == k and (rts <= ts if inclusive else rts < ts)
        ]
        if tolerance is not None:
            cands = [c for c in cands if ts - c[0] <= tolerance]
        if cands:
            rts, rid, tag = max(cands)  # latest ts, rid tiebreak
            out[eid] = (rid, tag)
        else:
            out[eid] = (None, None)
    return out


def _run(spark, **kw):
    l, r = _dfs(spark)
    got = asof_join(l, r, on="key", ts="ts", payload=["rid", "tag"],
                    tiebreak=["rid"], **kw).collect()
    assert len(got) == len(LEFT)
    return {row["event_id"]: (row["rid"], row["tag"]) for row in got}


def test_inclusive_matches_oracle(spark):
    got = _run(spark)
    assert got == _py_asof(inclusive=True)
    assert got[102] == (201, "b")   # equal ts IS visible
    assert got[101] == (None, None)
    assert got[104] == (None, None)


def test_exclusive_matches_oracle(spark):
    got = _run(spark, inclusive=False)
    assert got == _py_asof(inclusive=False)
    assert got[102] == (200, "a")   # equal ts NOT visible
    assert got[103] == (204, "e")


def test_tolerance_nulls_stale_matches(spark):
    got = _run(spark, tolerance=F.lit(10))
    assert got == _py_asof(inclusive=True, tolerance=10)
    assert got[100] == (202, "c")   # gap 5, kept
    assert got[103] == (203, "d")   # gap 0, kept
    # key-1 @10 has no match; and without tolerance 102 matched gap 0
    assert got[101] == (None, None)


def test_equal_ts_tiebreak_picks_last(spark):
    l = _dfs(spark)[0].where("event_id = 100")
    r = spark.createDataFrame(
        [(300, 1, 50, "x"), (301, 1, 50, "y"), (299, 1, 50, "w")],
        "rid long, key long, ts long, tag string",
    )
    got = asof_join(l, r, on="key", ts="ts", payload=["rid", "tag"],
                    tiebreak=["rid"]).collect()[0]
    assert (got["rid"], got["tag"]) == (301, "y")


def test_payload_collision_raises(spark):
    l, r = _dfs(spark)
    with pytest.raises(ValueError):
        asof_join(l, r.withColumnRenamed("rid", "event_id"),
                  on="key", ts="ts", payload=["event_id"])


def test_random_differential(spark):
    x = 12345
    def nxt(m):
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return x % m
    lrows = [(i, nxt(7), nxt(100)) for i in range(120)]
    rrows = [(1000 + i, nxt(7), nxt(100), f"t{i}") for i in range(80)]
    l = spark.createDataFrame(lrows, "event_id long, key long, ts long")
    r = spark.createDataFrame(rrows, "rid long, key long, ts long, tag string")
    got = {
        row["event_id"]: (row["rid"], row["tag"])
        for row in asof_join(l, r, on="key", ts="ts", payload=["rid", "tag"],
                             tiebreak=["rid"]).collect()
    }
    for eid, k, ts in lrows:
        cands = [(rts, rid, tag) for rid, rk, rts, tag in rrows
                 if rk == k and rts <= ts]
        exp = (max(cands)[1], max(cands)[2]) if cands else (None, None)
        assert got[eid] == exp, eid
