"""Farthest-first k-center pinned against a pure-python greedy oracle,
plus the contract edge cases (k >= n clamp, k=1, duplicate points,
tie-breaking, non-increasing radius)."""

from __future__ import annotations

import math

import pytest

from tldr_spark.operators.kcenter import kcenter_farthest_first

_Q = 1048576


def _d2(a, b):
    # same dot-form the engine uses (exactness is not needed here — the
    # python oracle works in the same doubles)
    da = sum(x * x for x in a)
    db = sum(x * x for x in b)
    dab = sum(x * y for x, y in zip(a, b))
    return da - 2 * dab + db


def _greedy(points: dict[int, list[float]], k: int):
    ids = sorted(points)
    chosen = [(0, ids[0], 0)]
    d2 = {i: _d2(points[i], points[ids[0]]) for i in ids}
    for step in range(1, k):
        cand = [i for i in ids if i not in {c[1] for c in chosen}]
        if not cand:
            break
        best = max(cand, key=lambda i: (d2[i], -i))
        chosen.append((step, best, math.floor(d2[best] * _Q)))
        for i in ids:
            d2[i] = min(d2[i], _d2(points[i], points[best]))
    return chosen


_PTS = {
    10: [0.0, 0.0],
    11: [1.0, 0.0],
    12: [0.0, 1.0],
    13: [10.0, 10.0],
    14: [10.0, 10.5],
    15: [-5.0, 3.0],
    16: [1.0, 0.0],  # exact duplicate of 11
}


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<float>",
    )


@pytest.mark.parametrize("k", [1, 2, 4, 6])
def test_matches_python_greedy(spark, k):
    got = [tuple(r) for r in kcenter_farthest_first(_df(spark, _PTS), k=k).collect()]
    assert got == _greedy(_PTS, k)


def test_k_exceeding_n_returns_all_points(spark):
    got = kcenter_farthest_first(_df(spark, _PTS), k=50).collect()
    assert len(got) == len(_PTS)
    assert {r["vec_id"] for r in got} == set(_PTS)


def test_radius_non_increasing_and_seed_is_min_id(spark):
    rows = kcenter_farthest_first(_df(spark, _PTS), k=5).collect()
    assert rows[0]["vec_id"] == min(_PTS) and rows[0]["d2_q"] == 0
    radii = [r["d2_q"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)


def test_duplicate_points_tie_break_by_id(spark):
    # two coincident clusters: after both cluster reps are taken, the
    # duplicate of 11 (id 16, d2=0) must be picked by id order among the
    # remaining zero/positive-distance candidates per the (d2, id) order
    pts = {1: [0.0, 0.0], 2: [0.0, 0.0], 3: [1.0, 1.0], 4: [1.0, 1.0]}
    got = [tuple(r) for r in kcenter_farthest_first(_df(spark, pts), k=4).collect()]
    assert got == _greedy(pts, 4)


def test_k_below_one_raises(spark):
    with pytest.raises(ValueError):
        kcenter_farthest_first(_df(spark, _PTS), k=0)


def test_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kcenter_farthest_first(empty, k=3).collect() == []
