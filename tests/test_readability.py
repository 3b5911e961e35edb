"""Readability: exact python mirror of the counting rules, known-text
pins (monosyllabic simple text scores high FRE / low grade, polysyllabic
scores low FRE), headline one-sentence convention, zero-word drop."""

from __future__ import annotations

import re

from tldr_spark.operators.readability import readability

DOCS = [
    (1, "The cat sat on the mat. The dog ran to the man."),
    (2, "Incomprehensibility characterizes bureaucratic organizational documentation."),
    (3, "Breaking news headline with no terminal punctuation"),
    (4, "One. Two! Three? Four."),
    (5, "  "),
    (6, "Ellipses... and?! mixed!!! punctuation."),
]


def _py(rows):
    out = {}
    for did, text in rows:
        words = [t for t in re.split(r"[ \t\n\r\f]+", text.strip()) if t]
        if not words:
            continue
        segs = [s for s in re.split(r"[.!?]+", text.lower()) if re.search("[a-z0-9]", s)]
        n_s = max(len(segs), 1)
        syl = sum(max(len(re.findall("[aeiouy]+", w.lower())), 1) for w in words)
        w, s = len(words), n_s
        fre = 206.835 - 1.015 * w / s - 84.6 * syl / w
        fkgl = 0.39 * w / s + 11.8 * syl / w - 15.59
        out[did] = (w, s, syl, fre, fkgl)
    return out


def test_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_sents, r.n_syll, r.fre, r.fkgl)
        for r in readability(df).collect()
    }
    want = _py(DOCS)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert abs(got[k][3] - want[k][3]) < 1e-12
        assert abs(got[k][4] - want[k][4]) < 1e-12


def test_pins(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in readability(df).collect()}
    assert got[1].fre > 90  # monosyllabic, short sentences
    assert got[2].fre < 0  # heavy polysyllables in one sentence
    assert got[1].fkgl < 2 < got[2].fkgl
    assert got[3].n_sents == 1  # headline convention
    assert got[4].n_sents == 4
    assert 5 not in got
    assert got[6].n_sents == 4  # "ellipses", "and", "mixed", "punctuation"
