"""Morton/Z-order: exact python bit-interleave mirror, round-trip
de-interleave, ordering pin (quadrant order), the LOCALITY LAW (bucket
spans bounded by 2^ceil(shift/2) per dimension), raises."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from tldr_spark.operators.zorder import morton_key, zorder_layout_stats


def _py_morton(x, y):
    out = 0
    for b in range(32):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_matches_python(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(1 << 32), rng.randrange(1 << 32)) for _ in range(200)]
    pts += [(0, 0), (1, 0), (0, 1), ((1 << 32) - 1, (1 << 32) - 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.k
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("k")).collect()
    }
    for (x, y), k in got.items():
        want = _py_morton(x, y)
        # python result may exceed int63 (sign bit set): compare mod 2^64
        assert k % (1 << 64) == want % (1 << 64), (x, y)


def test_quadrant_order(spark):
    # z-order visits quadrants: (0,0) < (1,0) < (0,1) < (1,1)
    pts = [(0, 0), (1, 0), (0, 1), (1, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = [
        (r.x, r.y)
        for r in df.select("x", "y", morton_key(F.col("x"), F.col("y")).alias("k"))
        .orderBy("k")
        .collect()
    ]
    assert got == pts


def test_locality_law(spark):
    rng = random.Random(21)
    pts = [(rng.randrange(1 << 20), rng.randrange(1 << 20)) for _ in range(3000)]
    df = spark.createDataFrame(pts, "x long, y long")
    shift = 24
    stats = zorder_layout_stats(df, "x", "y", shift=shift).collect()
    bound = 1 << ((shift + 1) // 2)
    assert sum(r.n_rows for r in stats) == len(pts)
    for r in stats:
        assert r.x_max - r.x_min < bound
        assert r.y_max - r.y_min < bound


def test_raises(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_layout_stats(df, "x", "y", shift=64)
