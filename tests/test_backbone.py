"""Disparity-filter backbone — pure-Python oracle parity + conventions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tldr_spark.operators.backbone import disparity_filter

# (src, dst, weight) with multi-edges, a hub with one dominant link, a
# degree-1 vertex, and a uniform-split vertex (nothing significant).
EDGES = [
    (1, 2, 10.0),
    (1, 2, 10.0),  # multi-edge: collapses to w=20
    (1, 3, 1.0),
    (1, 4, 1.0),
    (1, 5, 1.0),
    (2, 6, 5.0),  # degree-1 source: alpha = 1 by convention
    (3, 7, 2.0),
    (3, 8, 2.0),
    (3, 9, 2.0),  # uniform split: alpha = (1-1/3)^2 for each
    (4, 1, 100.0),
    (4, 2, 1.0),
]


def _oracle(edges):
    nw: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        nw[(s, d)] = nw.get((s, d), 0.0) + w
    st: dict[int, tuple[int, float]] = {}
    for (s, _), w in nw.items():
        k, tot = st.get(s, (0, 0.0))
        st[s] = (k + 1, tot + w)
    out = {}
    for (s, d), w in nw.items():
        k, tot = st[s]
        alpha = 1.0 if k == 1 else (1.0 - w / tot) ** (k - 1)
        out[(s, d)] = (w, k, alpha)
    return out


def _df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long, weight double")


def test_scored_matches_python_oracle(spark):
    got = {
        (r.src, r.dst): (r.w, r.k, r.alpha)
        for r in disparity_filter(_df(spark), alpha_max=None).collect()
    }
    want = _oracle(EDGES)
    assert set(got) == set(want)
    for key, (w, k, alpha) in want.items():
        gw, gk, galpha = got[key]
        assert gw == w and gk == k, key
        assert math.isclose(galpha, alpha, rel_tol=1e-12), key


def test_degree_one_never_significant(spark):
    kept = disparity_filter(_df(spark), alpha_max=0.99).collect()
    assert all(r.src != 2 for r in kept)  # vertex 2 has out-degree 1


def test_filter_is_strict_threshold(spark):
    scored = _oracle(EDGES)
    for alpha_max in (0.05, 0.2, 0.5):
        kept = {
            (r.src, r.dst)
            for r in disparity_filter(_df(spark), alpha_max=alpha_max).collect()
        }
        want = {k for k, (_, _, a) in scored.items() if a < alpha_max}
        assert kept == want, alpha_max


def test_dominant_hub_edge_survives_strict_cut(spark):
    kept = {
        (r.src, r.dst)
        for r in disparity_filter(_df(spark), alpha_max=0.05).collect()
    }
    # 4 -> 1 carries 100/101 of vertex 4's strength: alpha ~ 9.8e-5.
    assert (4, 1) in kept
    # The uniform-split vertex 3 keeps nothing at alpha=0.05.
    assert all(s != 3 for s, _ in kept)


def test_plan_has_no_udfs_and_two_aggregates(spark):
    plan = (
        disparity_filter(_df(spark), alpha_max=0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "pythonUDF" not in plan
