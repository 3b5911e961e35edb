"""Gries DP dispersion: exact python oracle (dense per-part loop —
proving the absent-part closed form), perfectly-even zero pin,
single-part-concentration pin, min_freq prune, single-part corpus
degenerate, raises."""

from __future__ import annotations

import pytest

from tldr_spark.operators.dispersion import token_dispersion

PARTS = {
    "p1": "alpha beta gamma alpha shared shared",
    "p2": "alpha beta delta shared shared shared",
    "p3": "alpha only3 only3 only3 shared shared shared shared",
}


def _rows(parts=PARTS):
    return [(p, t) for p, text in parts.items() for t in text.split()]


def _py(parts, min_freq=1):
    sizes = {p: len(t.split()) for p, t in parts.items()}
    big_n = sum(sizes.values())
    min_n = min(sizes.values())
    freqs: dict[str, dict[str, int]] = {}
    for p, text in parts.items():
        for t in text.split():
            by = freqs.setdefault(t, {})
            by[p] = by.get(p, 0) + 1
    out = {}
    for tok, by in freqs.items():
        f_tot = sum(by.values())
        if f_tot < min_freq:
            continue
        numer = sum(
            abs(by.get(p, 0) * big_n - sizes[p] * f_tot) for p in sizes
        )
        dp = numer / (2.0 * f_tot * big_n)
        dpn = 0.0 if big_n == min_n else numer / (2.0 * f_tot * (big_n - min_n))
        out[tok] = (f_tot, numer, dp, dpn)
    return out


def _got(spark, rows, **kw):
    df = spark.createDataFrame(rows, "part string, token string")
    return {
        r.token: (r.f_total, r.numer, r.dp, r.dp_norm)
        for r in token_dispersion(df, **kw).collect()
    }


@pytest.mark.parametrize("mf", [1, 3])
def test_matches_python(spark, mf):
    got = _got(spark, _rows(), min_freq=mf)
    want = _py(PARTS, min_freq=mf)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2], k
        assert abs(got[k][2] - want[k][2]) < 1e-12
        assert abs(got[k][3] - want[k][3]) < 1e-12


def test_pins(spark):
    got = _got(spark, _rows())
    # "only3" lives entirely in p3: DP = 1 - s_p3 = 1 - 8/20
    assert abs(got["only3"][2] - (1 - 8 / 20)) < 1e-12
    # dispersion ordering: the source-specific token is far less evenly
    # spread than the everywhere token
    assert got["only3"][2] > got["shared"][2]
    assert got["only3"][2] > got["alpha"][2]


def test_perfectly_even_token(spark):
    parts = {"a": "x y", "b": "x y", "c": "x y"}
    got = _got(spark, _rows(parts))
    assert got["x"][1] == 0 and got["x"][2] == 0.0


def test_single_part_degenerate(spark):
    got = _got(spark, _rows({"solo": "a a b"}))
    for tok in ("a", "b"):
        assert got[tok][2] == 0.0 and got[tok][3] == 0.0


def test_raises(spark):
    df = spark.createDataFrame(_rows(), "part string, token string")
    with pytest.raises(ValueError):
        token_dispersion(df, min_freq=0)
