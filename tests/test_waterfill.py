"""Water-filling allocation: brute-force integer oracle, the maximality
law S(cap+1) > budget, budget>=total and budget=0 paths, ties, single
group, fraction budget, arg validation."""

from __future__ import annotations

import pytest

from tldr_spark.operators.waterfill import waterfill_allocation


def _brute_cap(sizes, budget):
    """Largest integer c with sum(min(n, c)) <= budget (scan up)."""
    if budget >= sum(sizes):
        return max(sizes) if sizes else 0
    c = 0
    while sum(min(n, c + 1) for n in sizes) <= budget:
        c += 1
    return c


def _run(spark, sizes, **kw):
    rows = [(f"g{i}", int(n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "grp string, sz long")
    out = waterfill_allocation(df, "grp", "sz", **kw).collect()
    return {r["grp"]: (r["n"], r["alloc"], r["cap"]) for r in out}


@pytest.mark.parametrize(
    "sizes,budget",
    [
        ([19525, 20623, 21756, 22833, 64437], 111880),
        ([5, 5, 5, 5], 13),          # ties, mid-segment cap
        ([10, 20, 30], 0),           # zero budget
        ([10, 20, 30], 60),          # exact total
        ([10, 20, 30], 1000),        # budget > total
        ([7], 3),                    # single group, capped
        ([7], 7),                    # single group, saturated
        ([1, 1, 1, 100], 52),        # one dominant source
        ([3, 3, 3, 3, 3, 9], 17),    # cap inside a tie run
    ],
)
def test_matches_brute_force(spark, sizes, budget):
    got = _run(spark, sizes, budget=budget)
    cap = _brute_cap(sizes, budget)
    assert len(got) == len(sizes)
    for i, n in enumerate(sizes):
        assert got[f"g{i}"] == (n, min(n, cap), cap)
    # maximality law: the reported cap is feasible and cap+1 is not
    assert sum(min(n, cap) for n in sizes) <= budget
    if budget < sum(sizes):
        assert sum(min(n, cap + 1) for n in sizes) > budget


def test_aggregates_rows_per_group(spark):
    rows = [("a", 4), ("a", 6), ("b", 3)]  # a=10, b=3, budget 9 -> cap 6
    df = spark.createDataFrame(rows, "grp string, sz long")
    got = {
        r["grp"]: (r["n"], r["alloc"], r["cap"])
        for r in waterfill_allocation(df, "grp", "sz", budget=9).collect()
    }
    assert got == {"a": (10, 6, 6), "b": (3, 3, 6)}


def test_fraction_budget(spark):
    sizes = [19525, 20623, 21756, 22833, 64437]
    tot = sum(sizes)
    got = _run(spark, sizes, budget_frac=(3, 4))
    cap = _brute_cap(sizes, 3 * tot // 4)
    assert got["g4"] == (64437, cap, cap)
    assert sum(a for _, a, _ in got.values()) <= 3 * tot // 4


def test_arg_validation(spark):
    df = spark.createDataFrame([("a", 1)], "grp string, sz long")
    with pytest.raises(ValueError):
        waterfill_allocation(df, "grp", "sz")
    with pytest.raises(ValueError):
        waterfill_allocation(df, "grp", "sz", budget=5, budget_frac=(1, 2))
    with pytest.raises(ValueError):
        waterfill_allocation(df, "grp", "sz", budget=-1)
    with pytest.raises(ValueError):
        waterfill_allocation(df, "grp", "sz", budget_frac=(1, 0))
