"""Trophic levels — integer-exact python oracle + closed forms."""

from __future__ import annotations

from tldr_spark.operators.trophic import UNIT, trophic_levels


def _oracle(edges, n_iter=12):
    nw: dict[tuple[int, int], int] = {}
    for s, d, w in edges:
        nw[(s, d)] = nw.get((s, d), 0) + int(w)
    verts = sorted({v for s, d, _ in edges for v in (s, d)})
    lv = {v: UNIT for v in verts}
    for _ in range(n_iter):
        num: dict[int, int] = {}
        den: dict[int, int] = {}
        for (s, d), w in nw.items():
            num[d] = num.get(d, 0) + w * lv[s]
            den[d] = den.get(d, 0) + w
        lv = {v: UNIT + (num[v] // den[v] if v in num else 0) for v in verts}
    return lv


def _run(spark, edges, n_iter=12):
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    return {
        r.vertex: r.level_units
        for r in trophic_levels(df, n_iter=n_iter).collect()
    }


def test_dag_chain_exact_depths(spark):
    # 0 -> 1 -> 2 -> 3: exact levels 1, 2, 3, 4 (DAG shallower than n_iter).
    edges = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 3.0)]
    got = _run(spark, edges)
    assert got == {0: UNIT, 1: 2 * UNIT, 2: 3 * UNIT, 3: 4 * UNIT}


def test_weighted_merge_floor_division(spark):
    # 2's in-links: 0 (level 1, weight 1) and 1 (level 2, weight 2):
    # level(2) = 1 + (1*1 + 2*2)/3 = 1 + 5/3 -> floor in units.
    edges = [(0, 2, 1.0), (1, 2, 2.0), (0, 1, 1.0)]
    got = _run(spark, edges)
    assert got[2] == UNIT + (1 * UNIT + 2 * 2 * UNIT) // 3
    assert got == _oracle(edges)


def test_cycle_grows_linearly_with_rounds(spark):
    # 2-cycle: each round adds one level; after 12 rounds s = 1 + 12.
    edges = [(0, 1, 1.0), (1, 0, 1.0)]
    got = _run(spark, edges)
    assert got == {0: 13 * UNIT, 1: 13 * UNIT}


def test_random_graph_matches_python_oracle(spark):
    edges = [
        (v, (v * 31 + 7) % 40, float(1 + (v * 11) % 3)) for v in range(40)
    ] + [(v, (v * 17 + 3) % 40, float(1 + v % 2)) for v in range(0, 40, 3)]
    edges = [(s, d, w) for s, d, w in edges if s != d]
    # duplicate multi-edges must collapse by weight-sum
    edges += edges[:5]
    assert _run(spark, edges) == _oracle(edges)


def test_plan_is_udf_free(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0)], "src long, dst long, weight double"
    )
    plan = (
        trophic_levels(df, n_iter=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
