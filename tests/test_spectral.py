"""Spectral bipartition (deflated power iteration on cI - L) vs a NumPy
mirror of the exact same arithmetic, plus structural sanity checks."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tldr_spark.operators.spectral import fiedler_vector, spectral_cut_stats

_H_MULT = 2654435761
_H_MOD = 1000003


def _np_fiedler(edges: list[tuple[int, int]], iterations: int) -> dict[int, float]:
    und = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    ids = sorted({v for e in und for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in und:
        A[idx[a], idx[b]] = 1.0
        A[idx[b], idx[a]] = 1.0
    deg = A.sum(axis=1)
    c = 2 * int(deg.max())
    x = np.array([float(((v % _H_MOD) * _H_MULT) % _H_MOD) for v in ids])
    x = x - x.mean()
    for _ in range(iterations):
        y = (c - deg) * x + A @ x
        x = y - y.mean()
    nrm = np.abs(x).max()
    if nrm > 0:
        x = x / nrm
    return {v: x[idx[v]] for v in ids}


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )


TWO_CLIQUES = (
    [(a, b) for a in range(4) for b in range(4) if a < b]
    + [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
)

BARBELL = TWO_CLIQUES + [(3, 10)]  # two 4-cliques joined by one bridge


@pytest.mark.parametrize(
    "edges",
    [TWO_CLIQUES, BARBELL, [(0, 1), (1, 2), (2, 3), (3, 4)]],
    ids=["two-cliques", "barbell", "path"],
)
def test_fiedler_matches_numpy(spark, edges):
    got = {
        r["id"]: r["f"] for r in fiedler_vector(_edges_df(spark, edges), 12).collect()
    }
    want = _np_fiedler(edges, 12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_sign_cut_separates_barbell(spark):
    """On the barbell, the minimum-conductance sign cut severs the bridge."""
    row = spectral_cut_stats(_edges_df(spark, BARBELL), 12).collect()[0]
    assert row["cut_edges"] == 1
    assert row["n_pos"] == 4 and row["n_neg"] == 4
    # vol = 2*|E_side| + cut side-share: each clique side has 6 internal
    # edges + 1 bridge endpoint -> volume 13
    assert row["vol_pos"] == 13 and row["vol_neg"] == 13
    assert row["conductance"] == pytest.approx(1.0 / 13.0)


def test_disconnected_graph_zero_cut(spark):
    """On two disjoint cliques the zero-eigenspace cut has no crossing
    edges — the spectral optimum the docstring promises."""
    row = spectral_cut_stats(_edges_df(spark, TWO_CLIQUES), 12).collect()[0]
    assert row["cut_edges"] == 0
    assert {row["n_pos"], row["n_neg"]} == {4}
    assert row["conductance"] == pytest.approx(0.0)


def test_empty_graph(spark):
    df = _edges_df(spark, [])
    assert fiedler_vector(df, 5).count() == 0


def test_duplicate_and_reversed_edges_collapse(spark):
    """Symmetrization dedups (a,b)/(b,a)/repeats before the Laplacian."""
    noisy = BARBELL + [(b, a) for a, b in BARBELL] + BARBELL[:5]
    got = {
        r["id"]: r["f"] for r in fiedler_vector(_edges_df(spark, noisy), 12).collect()
    }
    want = _np_fiedler(BARBELL, 12)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_spectral_radius_matches_numpy(spark):
    from tldr_spark.operators.spectral import spectral_radius_estimate

    edges = [(0, 1), (1, 2), (2, 0), (2, 0), (0, 3), (3, 0), (1, 0)]
    df = _edges_df(spark, edges)
    got = spectral_radius_estimate(df, 12).collect()[0]

    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d in edges:
        A[idx[d], idx[s]] += 1.0  # x_{t+1}(dst) = sum over src
    x = np.full(len(ids), 1.0 / len(ids))
    for _ in range(12):
        x = A @ x
    nxt = A @ x
    lam = (x @ nxt) / (x @ x)
    assert got["lambda_est"] == pytest.approx(lam, rel=1e-12)
    # true dominant eigenvalue for sanity (power iteration ~converged)
    true = max(abs(np.linalg.eigvals(A)))
    assert got["lambda_est"] == pytest.approx(true, rel=0.05)


def test_spectral_radius_cycle_is_one(spark):
    from tldr_spark.operators.spectral import spectral_radius_estimate

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    got = spectral_radius_estimate(_edges_df(spark, cycle), 9).collect()[0]
    assert got["lambda_est"] == pytest.approx(1.0, abs=1e-9)


def test_fiedler_web_scale_ids_no_int64_wrap(spark):
    # ADVICE r4 regression: the init hash used to compute
    # (id * 2654435761) % 1000003 directly — for ids >= ~3.5e9 the
    # product wraps int64 in Spark (silently, giving wrong hash values)
    # while DuckDB/Python do not, diverging the engines. The fix
    # pre-reduces id mod 1000003 first (value-identical by modular
    # arithmetic, overflow-free). This graph's ids sit ABOVE the wrap
    # threshold, so the old expression would produce hash values
    # disagreeing with the NumPy mirror's arbitrary-precision result.
    base = 4_000_000_000  # > 2^63 / 2654435761 ≈ 3.47e9
    edges = [
        (base + a, base + b)
        for a, b in TWO_CLIQUES + [(3, 10), (10, 20), (20, 21)]
    ]
    got = {
        r["id"]: r["f"]
        for r in fiedler_vector(_edges_df(spark, edges), 12).collect()
    }
    want = _np_fiedler(edges, 12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
