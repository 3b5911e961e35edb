"""Product-quantization tests: exact numpy encode mirror, ADC table sums,
recall on a clustered corpus, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from tldr_spark.operators.pq import pq_encode, pq_topk, train_pq_codebooks

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def _np_encode(vecs, books):
    m, k, sub = books.shape
    out = {}
    for vid, v in vecs.items():
        v = np.asarray(v, dtype=np.float64)
        code = []
        for j in range(m):
            d = ((books[j] - v[j * sub : (j + 1) * sub][None, :]) ** 2).sum(axis=1)
            # operator argmin = argmax of 2vc-|c|^2 via array_position:
            # FIRST index of the max -> ties break to the lowest code
            code.append(int(np.argmin(np.round(d, 12))))
        out[vid] = code
    return out


def test_encode_matches_numpy(spark, embs):
    books = train_pq_codebooks(embs, m=4, k=8, sample=256, seed=3)
    assert books.shape[0] == 4 and books.shape[1] == 8
    got = {r["id"]: list(r["code"]) for r in pq_encode(embs, books).limit(0).union(pq_encode(embs.limit(64), books)).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in embs.limit(64).collect()}
    want = _np_encode(vecs, books)
    mism = {i for i in want if got[i] != want[i]}
    # float32->float64 ulps can flip ties only when two centroids are
    # exactly equidistant — should not happen with trained codebooks
    assert not mism


def test_adc_distance_is_table_sum(spark, embs):
    books = train_pq_codebooks(embs, m=4, k=8, sample=256, seed=3)
    probes = embs.orderBy("vec_id").limit(3)
    got = {
        (r["probe_id"], r["neighbor_id"]): r["adc_dist"]
        for r in pq_topk(embs.limit(50), probes, books, k=50).collect()
    }
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in embs.limit(50).collect()}
    codes = _np_encode(vecs, books)
    m, k, sub = books.shape
    for r in probes.collect():
        q = np.asarray(r["embedding"], dtype=np.float64)
        for nid, c in codes.items():
            if nid == r["vec_id"]:
                continue
            want = sum(
                float(((books[j][c[j]] - q[j * sub : (j + 1) * sub]) ** 2).sum())
                for j in range(m)
            )
            key = (r["vec_id"], nid)
            if key in got:
                assert abs(got[key] - want) < 1e-9


def test_pq_recall_on_clustered_corpus(spark):
    # a corpus PQ can actually compress: 4 tight clusters in 8-d
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(4, 8)) * 5.0
    rows = []
    for i in range(200):
        c = i % 4
        rows.append((i, [float(x) for x in centers[c] + rng.normal(size=8) * 0.1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = train_pq_codebooks(df, m=4, k=8, sample=200, seed=1)
    probes = df.limit(8)
    got = pq_topk(df, probes, books, k=10).collect()
    # every ADC neighbor of probe i should be in probe i's cluster
    same = sum(1 for r in got if r["neighbor_id"] % 4 == r["probe_id"] % 4)
    assert same / len(got) > 0.95


def test_pq_deterministic_and_validates(spark, embs):
    b1 = train_pq_codebooks(embs, m=4, k=8, sample=128, seed=9)
    b2 = train_pq_codebooks(embs, m=4, k=8, sample=128, seed=9)
    assert np.array_equal(b1, b2)
    with pytest.raises(ValueError):
        train_pq_codebooks(embs, m=3)  # 8-d not divisible by 3
