"""Greedy max-coverage pinned against a pure-python greedy oracle, plus
early-stop / tie-break / k<1 contracts."""

from __future__ import annotations

import pytest

from tldr_spark.operators.maxcover import maxcover_greedy

_PAIRS = [
    (1, "a"), (1, "b"), (1, "c"),
    (2, "c"), (2, "d"), (2, "e"), (2, "f"),
    (3, "a"), (3, "d"),
    (4, "g"),
    (5, "g"),            # same gain as 4 after 4 is taken -> 5 never picked
    (6, "b"), (6, "e"), (6, "h"), (6, "i"),
]


def _greedy(pairs, k):
    sets: dict[int, set[str]] = {}
    for i, g in pairs:
        sets.setdefault(i, set()).add(g)
    covered: set[str] = set()
    out = []
    for step in range(k):
        best, gain = None, 0
        for i in sorted(sets):
            got = len(sets[i] - covered)
            if got > gain:
                best, gain = i, got
        if best is None:
            break
        out.append((step, best, gain))
        covered |= sets[best]
    return out


def _df(spark, pairs=_PAIRS):
    return spark.createDataFrame(pairs, "doc_id long, gram string")


@pytest.mark.parametrize("k", [1, 2, 3, 10])
def test_matches_python_greedy(spark, k):
    got = [tuple(r) for r in maxcover_greedy(_df(spark), k=k).collect()]
    assert got == _greedy(_PAIRS, k)


def test_stops_when_everything_covered(spark):
    # k=10 but full coverage is reached earlier; zero-gain ids never picked
    rows = maxcover_greedy(_df(spark), k=10).collect()
    assert sum(r["gain"] for r in rows) == len({g for _, g in _PAIRS})
    assert len(rows) < 10


def test_tie_breaks_by_id(spark):
    pairs = [(7, "x"), (3, "y"), (5, "z")]  # all gain 1 -> pick 3 first
    rows = maxcover_greedy(_df(spark, pairs), k=1).collect()
    assert (rows[0]["doc_id"], rows[0]["gain"]) == (3, 1)


def test_k_below_one_raises(spark):
    with pytest.raises(ValueError):
        maxcover_greedy(_df(spark), k=0)
