"""Simplified (centroid-based) silhouette — numpy oracle + degenerate cases."""

import numpy as np

from tldr_spark.operators.silhouette import label_silhouette


def _np_oracle(vecs, labels):
    vecs = np.asarray(vecs, dtype=np.float64)
    labels = np.asarray(labels)
    cents = {l: vecs[labels == l].mean(axis=0) for l in set(labels.tolist())}
    out = {}
    for l in cents:
        ss = []
        for x, xl in zip(vecs, labels):
            if xl != l:
                continue
            a = float(np.linalg.norm(x - cents[xl]))
            others = [
                float(np.linalg.norm(x - c)) for g, c in cents.items() if g != xl
            ]
            if not others:
                ss.append(None)
                continue
            b = min(others)
            ss.append(0.0 if max(a, b) == 0 else (b - a) / max(a, b))
        vals = [s for s in ss if s is not None]
        out[l] = (len(ss), sum(vals) / len(vals) if vals else None)
    return out


def _run(spark, vecs, labels):
    rows = [
        (i, [float(v) for v in vec], int(l))
        for i, (vec, l) in enumerate(zip(vecs, labels))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = label_silhouette(df).collect()
    return {r["label"]: (r["n_points"], r["mean_silhouette"]) for r in got}


def test_matches_numpy(spark):
    rng = np.random.RandomState(3)
    # three separated gaussian blobs in 8-d
    vecs, labels = [], []
    for l, center in enumerate([0.0, 5.0, -5.0]):
        for _ in range(12):
            vecs.append((rng.randn(8) * 0.3 + center).astype(np.float32))
            labels.append(l)
    got = _run(spark, vecs, labels)
    want = _np_oracle([v.astype(np.float64) for v in vecs], labels)
    assert got.keys() == want.keys()
    for l in want:
        assert got[l][0] == want[l][0]
        assert abs(got[l][1] - want[l][1]) < 1e-6  # float32 inputs
    # separated blobs: silhouette near 1 everywhere
    assert all(v[1] > 0.9 for v in got.values())


def test_overlapping_blobs_score_low(spark):
    rng = np.random.RandomState(4)
    vecs, labels = [], []
    for l in (0, 1):
        for _ in range(20):
            vecs.append((rng.randn(4) * 2.0).astype(np.float32))  # same cloud
            labels.append(l)
    got = _run(spark, vecs, labels)
    assert all(v[1] < 0.3 for v in got.values())


def test_single_label_is_null(spark):
    vecs = [np.ones(3, dtype=np.float32) * i for i in range(5)]
    got = _run(spark, vecs, [7] * 5)
    assert got == {7: (5, None)}


def test_point_on_both_centroids_scores_zero(spark):
    # two labels, every vector identical: a = b = 0 -> s = 0 by convention
    vecs = [np.zeros(2, dtype=np.float32)] * 4
    got = _run(spark, vecs, [0, 0, 1, 1])
    assert got == {0: (2, 0.0), 1: (2, 0.0)}
