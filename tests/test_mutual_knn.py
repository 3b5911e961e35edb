"""Mutual-kNN pairs vs a NumPy mirror; hub asymmetry sanity."""

from __future__ import annotations

import numpy as np

from tldr_spark.operators.similarity import mutual_knn_pairs


def _np_mutual(rows, k):
    V = {i: np.asarray(v, dtype=np.float32).astype(np.float64) for i, v in rows}
    ids = sorted(V)
    top = {}
    for a in ids:
        cos = {
            b: V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))
            for b in ids
            if b != a
        }
        top[a] = set(sorted(cos, key=lambda t: (-cos[t], t))[:k])
    return {
        (a, b) for a in ids for b in top[a] if a < b and a in top[b]
    }


def test_matches_numpy(spark):
    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 12)]) for i in range(35)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in mutual_knn_pairs(df, k=4).collect()}
    assert got == _np_mutual(rows, 4)
    assert len(got) > 0


def test_reciprocity_is_enforced(spark):
    # a hub H that everyone ranks first, but H's own top-1 is a single
    # twin: only (H, twin) survives as a mutual top-1 pair
    hub = [10.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    twin = [10.0, 0.1, 0.0, 0.0, 0.0, 0.0]
    # each spoke leans toward the hub plus its own orthogonal component:
    # every spoke's top-1 is the hub, but the hub's top-1 is its twin
    spokes = [
        [10.0 if j == 0 else (3.0 if j == i else 0.0) for j in range(6)]
        for i in range(2, 6)
    ]
    rows = [(0, hub), (1, twin)] + [(i + 2, s) for i, s in enumerate(spokes)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in mutual_knn_pairs(df, k=1).collect()}
    assert got == {(0, 1)}
