"""Jensen-Shannon divergence between group LMs: exact python oracle
(dense two-sided KL-to-mixture, NOT the operator's shared-mass closed
form — proving the algebraic fold), identical-LM zero, disjoint-vocab
ln 2 ceiling, symmetry-by-construction, bounds."""

from __future__ import annotations

import math

from tldr_spark.operators.lmdiv import group_js_divergence

DOCS = [
    ("news", "the quick brown fox jumps over the lazy dog"),
    ("news", "the dog barks at the quick fox"),
    ("web", "click here to buy cheap deals now the best deals"),
    ("web", "best cheap deals click now"),
    ("wiki", "the fox is a small omnivorous mammal of the dog family"),
    ("zz_disjoint", "xylophone quetzal vortex"),
]


def _py_jsd(rows):
    lms: dict[str, dict[str, int]] = {}
    for g, text in rows:
        for t in text.split():
            lms.setdefault(g, {})[t] = lms.get(g, {}).get(t, 0) + 1
    out = {}
    for a in lms:
        for b in lms:
            if a >= b:
                continue
            na, nb = sum(lms[a].values()), sum(lms[b].values())
            jsd = 0.0
            for t in set(lms[a]) | set(lms[b]):
                p = lms[a].get(t, 0) / na
                q = lms[b].get(t, 0) / nb
                m = (p + q) / 2.0
                if p:
                    jsd += 0.5 * p * math.log(p / m)
                if q:
                    jsd += 0.5 * q * math.log(q / m)
            out[(a, b)] = (na, nb, jsd)
    return out


def _tokens(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "group string, text string")
    return df.select("group", F.explode(F.split("text", " ")).alias("token"))


def test_matches_python(spark):
    got = {
        (r.group_a, r.group_b): (r.n_a, r.n_b, r.jsd)
        for r in group_js_divergence(_tokens(spark, DOCS)).collect()
    }
    want = _py_jsd(DOCS)
    assert set(got) == set(want)
    for k, (na, nb, jsd) in want.items():
        gna, gnb, gjsd = got[k]
        assert (gna, gnb) == (na, nb), k
        assert abs(gjsd - jsd) < 1e-12, (k, gjsd, jsd)


def test_identical_lms_zero(spark):
    rows = [("a", "x y z x"), ("b", "x y z x")]
    (r,) = group_js_divergence(_tokens(spark, rows)).collect()
    assert abs(r.jsd) < 1e-15


def test_disjoint_ln2(spark):
    rows = [("a", "x y z"), ("b", "p q r")]
    (r,) = group_js_divergence(_tokens(spark, rows)).collect()
    assert abs(r.jsd - math.log(2.0)) < 1e-15


def test_bounds_and_pair_count(spark):
    res = group_js_divergence(_tokens(spark, DOCS)).collect()
    assert len(res) == 6  # C(4,2) unordered pairs
    for r in res:
        assert -1e-15 <= r.jsd <= math.log(2.0) + 1e-15
        assert r.group_a < r.group_b
