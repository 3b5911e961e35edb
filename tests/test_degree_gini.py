"""Degree Gini — python oracle + closed forms + tie invariance."""

from __future__ import annotations

import math

import pytest

from tldr_spark.operators.stats import degree_gini


def _gini_py(degs):
    n, s = len(degs), sum(degs)
    d = sorted(degs)
    num = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(d))
    return num / (n * s)


def _run(spark, edges, direction="in"):
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    r = degree_gini(df, direction=direction).collect()[0]
    return r.n_vertices, r.total_deg, r.gini


def _in_degs(edges):
    verts = {v for s, d, _ in edges for v in (s, d)}
    out = {v: 0 for v in verts}
    for _, d, _ in edges:
        out[d] += 1
    return list(out.values())


def test_star_is_maximally_concentrated(spark):
    # k-star: one vertex holds ALL in-links -> Gini = (n-1)/n.
    edges = [(i, 99, 1.0) for i in range(9)]
    n, tot, g = _run(spark, edges)
    assert (n, tot) == (10, 9)
    assert math.isclose(g, (10 - 1) / 10, rel_tol=1e-12)


def test_uniform_ring_is_zero(spark):
    edges = [(i, (i + 1) % 8, 1.0) for i in range(8)]
    n, tot, g = _run(spark, edges)
    assert (n, tot) == (8, 8)
    assert g == 0.0


def test_matches_python_oracle_both_directions(spark):
    edges = [(v, (v * 37 + 11) % 50, 1.0) for v in range(50)]
    edges += [(v, (v * 13 + 3) % 50, 1.0) for v in range(0, 50, 2)]
    edges = [(s, d, w) for s, d, w in edges if s != d]
    n, tot, g = _run(spark, edges, "in")
    assert math.isclose(g, _gini_py(_in_degs(edges)), rel_tol=1e-12)
    out_degs = {v: 0 for v in {x for s, d, _ in edges for x in (s, d)}}
    for s, _, _ in edges:
        out_degs[s] += 1
    _, _, go = _run(spark, edges, "out")
    assert math.isclose(go, _gini_py(list(out_degs.values())), rel_tol=1e-12)


def test_direction_validation(spark):
    df = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight double")
    with pytest.raises(ValueError):
        degree_gini(df, direction="both")
