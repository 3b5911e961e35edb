"""Log-histogram quantiles: exact python mirror (same bucket floor,
same ceil-rank), the GUARANTEE LAW exact <= est < exact * 2^(1/k) on
random skewed data, bucket-edge values, k sensitivity, raises."""

from __future__ import annotations

import math
import random

import pytest

from tldr_spark.operators.histq import log_histogram_quantiles

QS = ((50, 100), (95, 100), (99, 100))


def _py(rows, k, qs=QS):
    by = {}
    for g, v in rows:
        if v > 0:
            by.setdefault(g, []).append(v)
    out = {}
    for g, vs in by.items():
        vs.sort()
        n = len(vs)
        hist = {}
        for v in vs:
            b = math.floor(math.log(float(v)) / math.log(2.0) * k)
            hist[b] = hist.get(b, 0) + 1
        for qn, qd in qs:
            rank = (n * qn + qd - 1) // qd
            cum = 0
            for b in sorted(hist):
                cum += hist[b]
                if cum >= rank:
                    out[(g, qn)] = (n, b, 2.0 ** ((b + 1) / k), vs[rank - 1])
                    break
    return out


def _got(spark, rows, k):
    # column names deliberately differ from the operator's internal
    # aliases (a rename-shadowing bug once passed with name "v")
    df = spark.createDataFrame(rows, "grp string, cents long")
    return {
        (r.group, r.q_num): (r.n, r.bucket, r.est, r.exact)
        for r in log_histogram_quantiles(df, "cents", "grp", k=k).collect()
    }


def _rows():
    rng = random.Random(5)
    rows = [("pareto", int(1000 / (rng.random() ** 1.2)) + 1) for _ in range(400)]
    rows += [("uniform", rng.randrange(1, 10_000)) for _ in range(300)]
    rows += [("tiny", v) for v in (1, 2, 3)]
    rows += [("edges", 1), ("edges", 2), ("edges", 4), ("edges", 1024)]
    rows += [("skip", 0), ("skip", -5)]  # non-positive: excluded entirely
    return rows


@pytest.mark.parametrize("k", [4, 16])
def test_matches_python(spark, k):
    rows = _rows()
    got = _got(spark, rows, k)
    want = _py(rows, k)
    assert set(got) == set(want)
    for key in want:
        assert got[key][:2] == want[key][:2], key
        assert abs(got[key][2] - want[key][2]) < 1e-9
        assert got[key][3] == want[key][3], key


def test_guarantee_law(spark):
    k = 16
    got = _got(spark, _rows(), k)
    for (g, qn), (n, b, est, exact) in got.items():
        assert exact <= est * (1 + 1e-12), (g, qn)
        assert est < exact * 2 ** (1 / k) * (1 + 1e-12), (g, qn)


def test_nonpositive_excluded(spark):
    got = _got(spark, _rows(), 16)
    assert not any(g == "skip" for g, _ in got)


def test_raises(spark):
    df = spark.createDataFrame([("a", 1)], "grp string, cents long")
    with pytest.raises(ValueError):
        log_histogram_quantiles(df, "cents", "grp", k=0)
    with pytest.raises(ValueError):
        log_histogram_quantiles(df, "cents", "grp", quantiles=((0, 100),))
