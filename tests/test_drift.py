"""PSI drift audit vs a pure-Python mirror."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tldr_spark.operators.drift import psi_by_group


def _py_psi(rows):
    buckets = lambda v: (v + 1).bit_length()  # noqa: E731
    chist = Counter(buckets(v) for _, v in rows)
    B, ntot = len(chist), len(rows)
    out = {}
    per = defaultdict(list)
    for g, v in rows:
        per[g].append(buckets(v))
    for g, bs in per.items():
        gh = Counter(bs)
        n = len(bs)
        psi = 0.0
        for bkt, cc in chist.items():
            p = (2 * gh.get(bkt, 0) + 1) / (2 * n + B)
            q = (2 * cc + 1) / (2 * ntot + B)
            psi += (p - q) * math.log(p / q)
        out[g] = (n, psi)
    return out


def _rows():
    rows = []
    # three sources matching the corpus shape, one drifted to huge docs
    for i in range(300):
        rows.append((f"s{i % 3}", 50 + (i * 37) % 400))
    for i in range(100):
        rows.append(("drifted", 5000 + (i * 113) % 3000))
    return rows


def test_matches_python(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["grp"]: (r["n"], r["psi"]) for r in psi_by_group(df, "source", "n_chars").collect()}
    want = _py_psi(rows)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert abs(got[g][1] - want[g][1]) < 1e-12


def test_drifted_source_flagged(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["grp"]: r["psi"] for r in psi_by_group(df, "source", "n_chars").collect()}
    assert got["drifted"] > 0.25  # the classic "significant shift" bar
    # the drifted dump (0% overlap with the corpus mode) outranks the
    # clean sources (which drift only by the corpus's 25% blended tail)
    for g in ("s0", "s1", "s2"):
        assert got[g] < got["drifted"]


def test_identical_distribution_near_zero(spark):
    rows = [("a", v) for v in range(64)] + [("b", v) for v in range(64)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["grp"]: r["psi"] for r in psi_by_group(df, "source", "n_chars").collect()}
    # identical halves: only the smoothing term differs from 0
    assert abs(got["a"]) < 0.01 and abs(got["b"]) < 0.01
