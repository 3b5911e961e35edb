"""MATTR: brute-force python oracle (enumerate every window, count
distinct — proving the interval-arithmetic closed form), all-distinct
and all-same pins, short-doc TTR fallback, window=1 identity, raises."""

from __future__ import annotations

import re

import pytest

from tldr_spark.operators.mattr import mattr

DOCS = [
    (1, "a b c d e f g h"),
    (2, "a a a a a a"),
    (3, "the cat sat on the mat the cat ran"),
    (4, "x y"),  # shorter than the window -> single-window TTR
    (5, "solo"),
    (6, "  "),  # zero tokens -> drops out
    (7, "p q p q p q p q p q p q"),
]


def _py(rows, w):
    out = {}
    for did, text in rows:
        toks = [t for t in re.split(r"[ \t\n\r\f]+", text.strip()) if t != ""]
        n = len(toks)
        if n == 0:
            continue
        ew = min(w, n)
        m = n - ew + 1
        sd = sum(len(set(toks[s : s + ew])) for s in range(m))
        out[did] = (n, ew, m, sd, sd / (ew * m))
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("w", [1, 3, 5, 25])
def test_matches_bruteforce(spark, w):
    got = {
        r.doc_id: (r.n_tokens, r.eff_window, r.n_windows, r.sum_distinct, r.mattr)
        for r in mattr(_df(spark), window=w).collect()
    }
    want = _py(DOCS, w)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:4] == want[k][:4], (k, w)
        assert abs(got[k][4] - want[k][4]) < 1e-12, (k, w)


def test_pins(spark):
    got = {r.doc_id: r.mattr for r in mattr(_df(spark), window=3).collect()}
    assert abs(got[1] - 1.0) < 1e-15  # all distinct
    assert abs(got[2] - 1 / 3) < 1e-15  # all same: 1 distinct per 3-window
    assert abs(got[7] - 2 / 3) < 1e-15  # alternating pair
    assert 6 not in got


def test_short_doc_ttr_fallback(spark):
    got = {
        r.doc_id: (r.eff_window, r.n_windows, r.mattr)
        for r in mattr(_df(spark), window=25).collect()
    }
    assert got[4] == (2, 1, 1.0)
    assert got[5] == (1, 1, 1.0)


def test_window_one_is_unity(spark):
    for r in mattr(_df(spark), window=1).collect():
        assert r.mattr == 1.0


def test_raises(spark):
    with pytest.raises(ValueError):
        mattr(_df(spark), window=0)
