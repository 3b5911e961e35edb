"""Hierarchical rollup: differential against direct-from-raw aggregation
at EVERY level (the merge-correctness contract), bucket-boundary pins,
nesting validation, single-level passthrough."""

from __future__ import annotations

import pytest

from tldr_spark.operators.rollup import rollup_levels


def _rows():
    x = 424242
    rows = []
    for i in range(400):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        t = x % 100_000          # ~1.2 days of seconds
        v = (x >> 32) % 2000 - 500  # signed cents
        rows.append((t, v))
    # exact boundary hits at every level edge
    rows += [(0, 7), (3600, -1), (86400 - 1, 3), (86400, 9)]
    return rows


def _direct(rows, width):
    agg = {}
    for t, v in rows:
        b = (t // width) * width
        n, s, lo, hi = agg.get(b, (0, 0, None, None))
        agg[b] = (
            n + 1,
            s + v,
            v if lo is None else min(lo, v),
            v if hi is None else max(hi, v),
        )
    return {b: (n, s, lo, hi) for b, (n, s, lo, hi) in agg.items()}


def test_every_level_equals_direct(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "t long, v long")
    levels = [600, 3600, 43200, 86400]
    got = {}
    for r in rollup_levels(df, "t", "v", levels).collect():
        got.setdefault(r["level_s"], {})[r["bucket_s"]] = (
            r["n"], r["sum_v"], r["min_v"], r["max_v"]
        )
    assert set(got) == set(levels)
    for width in levels:
        assert got[width] == _direct(rows, width), width


def test_materialize_false_same_answer(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "t long, v long")
    levels = [600, 3600]
    key = lambda r: (r["level_s"], r["bucket_s"])
    a = sorted(map(tuple, rollup_levels(df, "t", "v", levels).collect()))
    b = sorted(map(tuple, rollup_levels(df, "t", "v", levels, materialize=False).collect()))
    assert a == b


def test_boundary_rows_in_correct_buckets(spark):
    rows = [(0, 1), (3599, 2), (3600, 4)]
    df = spark.createDataFrame(rows, "t long, v long")
    got = {
        (r["level_s"], r["bucket_s"]): r["n"]
        for r in rollup_levels(df, "t", "v", [3600, 7200]).collect()
    }
    assert got[(3600, 0)] == 2 and got[(3600, 3600)] == 1
    assert got[(7200, 0)] == 3


def test_single_level(spark):
    rows = [(10, 5), (20, -5)]
    df = spark.createDataFrame(rows, "t long, v long")
    got = rollup_levels(df, "t", "v", [60]).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["level_s"], r["bucket_s"], r["n"], r["sum_v"], r["min_v"], r["max_v"]) == (
        60, 0, 2, 0, -5, 5
    )


@pytest.mark.parametrize("levels", [[], [0], [3600, 5000], [3600, 3600], [100, 50]])
def test_bad_levels_raise(spark, levels):
    df = spark.createDataFrame([(1, 1)], "t long, v long")
    with pytest.raises(ValueError):
        rollup_levels(df, "t", "v", levels)
