"""AMS F2 sketch: exact python mirror (same md5 signs), the LINEARITY
LAW (sketch of concatenated streams == elementwise sum of sketches),
estimate accuracy on a skewed stream, multiplicity sensitivity,
empty-stream zeros, raises."""

from __future__ import annotations

import hashlib

import pytest

from tldr_spark.operators.ams import ams_f2_estimate, ams_sketch


def _sign(j, tok):
    return 1 - 2 * (int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[0], 16) % 2)


def _py_sketch(stream, k):
    return [sum(_sign(j, t) for t in stream) for j in range(k)]


STREAM = (["apple"] * 10) + (["banana"] * 5) + (["cherry"] * 3) + ["d", "e", "f"]


def _df(spark, stream):
    return spark.createDataFrame([(t,) for t in stream], "token string")


@pytest.mark.parametrize("k", [1, 8, 32])
def test_matches_python(spark, k):
    got = {r.counter: r.x for r in ams_sketch(_df(spark, STREAM), k=k).collect()}
    want = dict(enumerate(_py_sketch(STREAM, k)))
    assert got == want


def test_linearity(spark):
    a, b = STREAM[:9], STREAM[9:]
    ka = {r.counter: r.x for r in ams_sketch(_df(spark, a), k=16).collect()}
    kb = {r.counter: r.x for r in ams_sketch(_df(spark, b), k=16).collect()}
    kall = {r.counter: r.x for r in ams_sketch(_df(spark, STREAM), k=16).collect()}
    assert kall == {j: ka[j] + kb[j] for j in ka}


def test_estimate_tracks_f2(spark):
    # skewed synthetic stream: F2 exactly computable; 64 counters keep
    # the relative error modest with overwhelming probability
    stream = []
    freqs = {f"t{i}": (i % 7) + 1 for i in range(60)}
    for t, f in freqs.items():
        stream += [t] * f
    f2 = sum(f * f for f in freqs.values())
    (est,) = ams_f2_estimate(ams_sketch(_df(spark, stream), k=64)).collect()
    assert est.k == 64
    assert abs(est.f2_est - f2) / f2 < 0.5
    # mirror the exact estimate too
    py = _py_sketch(stream, 64)
    assert est.sum_x2 == sum(x * x for x in py)


def test_multiplicity_matters(spark):
    one = {r.counter: r.x for r in ams_sketch(_df(spark, ["z"]), k=4).collect()}
    three = {r.counter: r.x for r in ams_sketch(_df(spark, ["z"] * 3), k=4).collect()}
    assert three == {j: 3 * x for j, x in one.items()}


def test_empty_stream_zeros(spark):
    got = {r.counter: r.x for r in ams_sketch(_df(spark, []), k=5).collect()}
    assert got == {j: 0 for j in range(5)}


def test_raises(spark):
    with pytest.raises(ValueError):
        ams_sketch(_df(spark, STREAM), k=0)
