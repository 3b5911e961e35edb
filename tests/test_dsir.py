"""DSIR importance weights: exact python mirror (same md5 buckets, same
add-1 LMs), direction sanity (target-like docs score higher), empty
target degradation, zero-token drop, bucket validation."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from pyspark.sql import functions as F

from tldr_spark.operators.dsir import dsir_logweights


def _bucket(feature, B):
    return int(hashlib.md5(feature.encode()).hexdigest()[:8], 16) % B


def _feats(text):
    toks = [t for t in re.split(r"[ \t\n\r\f]+", text.strip())]
    # mirror the array path: unigrams filter '', bigrams from the raw list
    uni = [t for t in toks if t != ""]
    big = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    return uni + big


def _py(rows, targets, B):
    docf = {}
    for did, text in rows:
        counts = {}
        for f in _feats(text):
            b = _bucket(f, B)
            counts[b] = counts.get(b, 0) + 1
        if counts:
            docf[did] = counts
    cq, cp = {}, {}
    for did, counts in docf.items():
        for b, c in counts.items():
            cq[b] = cq.get(b, 0) + c
            if did in targets:
                cp[b] = cp.get(b, 0) + c
    nq, np_ = sum(cq.values()), sum(cp.values())
    out = {}
    for did, counts in docf.items():
        n = sum(counts.values())
        s = sum(
            c * (math.log(cp.get(b, 0) + 1.0) - math.log(cq[b] + 1.0))
            for b, c in counts.items()
        )
        out[did] = (n, s + n * (math.log(nq + B) - math.log(np_ + B)))
    return out


ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "quantum flux capacitor array"),
    (3, "cat mat cat mat"),
    (4, "   "),
    (5, "solo"),
]


def _run(spark, rows, targets, B):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_logweights(df, F.col("doc_id").isin(list(targets)), buckets=B)
    return {r["id"]: (r["n_feats"], r["logw"]) for r in out.collect()}


@pytest.mark.parametrize("B", [16, 1024])
def test_matches_python(spark, B):
    targets = {0, 3}
    got, exp = _run(spark, ROWS, targets, B), _py(ROWS, targets, B)
    assert set(got) == set(exp)  # doc 4 (whitespace only) drops in both
    assert 4 not in got
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], rel=1e-12, abs=1e-12)


def test_target_like_docs_rank_higher(spark):
    # target = cat/mat docs; doc 3 (pure cat-mat) must outscore doc 2
    got = _run(spark, ROWS, {0, 3}, 4096)
    per = {k: v[1] / v[0] for k, v in got.items()}  # length-normalized
    assert per[3] > per[2]
    assert per[0] > per[2]


def test_empty_target_uniform_lm(spark):
    got, exp = _run(spark, ROWS, set(), 64), _py(ROWS, set(), 64)
    for k in exp:
        assert got[k][1] == pytest.approx(exp[k][1], rel=1e-12, abs=1e-12)


def test_bucket_validation(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_logweights(df, F.lit(True), buckets=1)
