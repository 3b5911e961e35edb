"""kNN label agreement vs a NumPy brute-force mirror."""

from __future__ import annotations

import numpy as np

from tldr_spark.operators.similarity import knn_label_agreement


def _mk(spark, n=40, dim=8, seed=11):
    rng = np.random.RandomState(seed)
    # two gaussian blobs -> labels mostly agree with neighbors
    rows = []
    for i in range(n):
        lab = i % 2
        center = np.ones(dim) * (1.0 if lab else -1.0)
        v = center + rng.normal(0, 0.4, dim)
        rows.append((i, [float(x) for x in v], lab))
    # one planted mislabel: point in blob 1 labeled 0
    rows.append((n, [float(x) for x in np.ones(dim) + rng.normal(0, 0.05, dim)], 0))
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _np_agreement(rows, k):
    ids = [r[0] for r in rows]
    V = np.array([np.array(r[1], dtype=np.float32).astype(np.float64) for r in rows])
    labs = {r[0]: r[2] for r in rows}
    out = {}
    for i, vid in enumerate(ids):
        cos = {}
        for j, nid in enumerate(ids):
            if nid == vid:
                continue
            c = V[i] @ V[j] / (np.linalg.norm(V[i]) * np.linalg.norm(V[j]))
            cos[nid] = c
        top = sorted(cos, key=lambda t: (-cos[t], t))[:k]
        same = sum(1 for t in top if labs[t] == labs[vid])
        out[vid] = (labs[vid], len(top), same)
    return out


def test_matches_numpy(spark):
    rows, df = _mk(spark)
    got = {r["vec_id"]: r for r in knn_label_agreement(df, k=7).collect()}
    want = _np_agreement(rows, 7)
    assert set(got) == set(want)
    for vid, (lab, nn, same) in want.items():
        r = got[vid]
        assert (r["label"], r["n_neighbors"], r["n_same"]) == (lab, nn, same)
        assert abs(r["agreement"] - same / nn) < 1e-12


def test_planted_mislabel_flagged(spark):
    rows, df = _mk(spark)
    got = {r["vec_id"]: r["agreement"] for r in knn_label_agreement(df, k=7).collect()}
    planted = max(r[0] for r in rows)
    assert got[planted] == 0.0  # all neighbors carry the other label
    clean = [v for k_, v in got.items() if k_ != planted]
    assert sum(clean) / len(clean) > 0.8


def test_probe_subset(spark):
    rows, df = _mk(spark)
    sub = df.filter("vec_id < 5")
    got = knn_label_agreement(df, k=3, probes=sub).collect()
    assert {r["vec_id"] for r in got} == {0, 1, 2, 3, 4}
