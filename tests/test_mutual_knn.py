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


def test_topk_param_matches_brute(spark):
    from tldr_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 12)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pre = brute_force_topk(df, df, 3).select("probe_id", "neighbor_id")
    got = {(r["id_a"], r["id_b"]) for r in mutual_knn_pairs(df, topk=pre).collect()}
    ref = {(r["id_a"], r["id_b"]) for r in mutual_knn_pairs(df, k=3).collect()}
    assert got == ref == _np_mutual(rows, 3)


def test_lsh_method_differential_recall_precision(spark):
    # the approximate stage both misses true pairs AND can add non-brute
    # pairs (farther candidates fill top-k slots when the true neighbors
    # miss the buckets), so the honest differential is recall+precision
    # against the exact pairs, not a subset assertion. Deterministic
    # (seeded hyperplanes, fixed data), so the floors are stable.
    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 12)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = {(r["id_a"], r["id_b"]) for r in mutual_knn_pairs(df, k=3).collect()}
    lsh = {
        (r["id_a"], r["id_b"])
        for r in mutual_knn_pairs(
            df, k=3, method="lsh", dim=12, n_planes=4, n_tables=8
        ).collect()
    }
    recall = len(lsh & brute) / len(brute)
    precision = len(lsh & brute) / len(lsh)
    print(f"mutual-kNN LSH vs brute: recall={recall:.3f} precision={precision:.3f}")
    assert recall >= 0.5
    assert precision >= 0.5


def test_ivf_method_differential_recall(spark):
    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 12)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = {(r["id_a"], r["id_b"]) for r in mutual_knn_pairs(df, k=3).collect()}
    ivf = {
        (r["id_a"], r["id_b"])
        for r in mutual_knn_pairs(
            df, k=3, method="ivf", n_cells=8, n_probe_cells=3, sample=64
        ).collect()
    }
    recall = len(ivf & brute) / len(brute)
    precision = len(ivf & brute) / max(1, len(ivf))
    print(f"mutual-kNN IVF vs brute: recall={recall:.3f} precision={precision:.3f}")
    assert recall >= 0.4
    assert precision >= 0.4


def test_unknown_method_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="unknown method"):
        mutual_knn_pairs(df, method="annoy")
