"""Interval join: python oracle, bucket-boundary pins (point exactly on a
bucket edge / interval edge), multi-bucket intervals, keyed vs global,
inverted intervals match nothing, no duplicate pairs, collision raise,
random differential across bucket widths."""

from __future__ import annotations

import pytest

from tldr_spark.operators.ranges import interval_join

POINTS = [(1, 0, 10), (2, 0, 100), (3, 1, 100), (4, 0, 250), (5, 0, 99)]
# (iid, key, s, e)
IVALS = [
    (10, 0, 0, 10),      # closed ends: point 10 included
    (11, 0, 95, 205),    # spans buckets at W=100
    (12, 1, 100, 100),   # degenerate single-instant
    (13, 0, 300, 200),   # inverted -> matches nothing
    (14, 0, 240, 260),
]


def _dfs(spark):
    p = spark.createDataFrame(POINTS, "pid long, key long, t long")
    i = spark.createDataFrame(IVALS, "iid long, key long, s long, e long")
    return p, i


def _py_pairs(keyed: bool):
    out = set()
    for pid, pk, t in POINTS:
        for iid, ik, s, e in IVALS:
            if s <= t <= e and (pk == ik or not keyed):
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("width", [1, 7, 100, 1000])
def test_matches_oracle_keyed(spark, width):
    p, i = _dfs(spark)
    got = interval_join(p, i, "t", "s", "e", width, on="key").collect()
    pairs = [(r["pid"], r["iid"]) for r in got]
    assert len(pairs) == len(set(pairs))  # no dup pairs at any width
    assert set(pairs) == _py_pairs(keyed=True)


def test_matches_oracle_global(spark, ):
    p, i = _dfs(spark)
    got = interval_join(p.drop("key"), i.drop("key"), "t", "s", "e", 100).collect()
    assert {(r["pid"], r["iid"]) for r in got} == _py_pairs(keyed=False)


def test_edge_inclusivity(spark):
    p, i = _dfs(spark)
    pairs = {
        (r["pid"], r["iid"])
        for r in interval_join(p, i, "t", "s", "e", 100, on="key").collect()
    }
    assert (1, 10) in pairs   # t == end
    assert (3, 12) in pairs   # t == start == end
    assert not any(iid == 13 for _, iid in pairs)  # inverted interval


def test_random_differential(spark):
    x = 777

    def nxt(m):
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return x % m

    pts = [(i, nxt(3), nxt(500)) for i in range(150)]
    ivs = []
    for i in range(60):
        s = nxt(500)
        ivs.append((1000 + i, nxt(3), s, s + nxt(80)))
    p = spark.createDataFrame(pts, "pid long, key long, t long")
    iv = spark.createDataFrame(ivs, "iid long, key long, s long, e long")
    exp = {
        (pid, iid)
        for pid, pk, t in pts
        for iid, ik, s, e in ivs
        if pk == ik and s <= t <= e
    }
    for width in (13, 64, 100):
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(p, iv, "t", "s", "e", width, on="key").collect()
        }
        assert got == exp, width


def test_raises(spark):
    p, i = _dfs(spark)
    with pytest.raises(ValueError):
        interval_join(p, i, "t", "s", "e", 0, on="key")
    with pytest.raises(ValueError):
        interval_join(p, i.withColumnRenamed("iid", "pid"), "t", "s", "e", 10, on="key")
