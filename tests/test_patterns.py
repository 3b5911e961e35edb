"""Pattern scan / profile / redaction: python `re` oracle on a handcrafted
PII-bearing fixture (the synthetic corpus has no PII — the pytest fixture
is where the actual email/url/ip semantics get exercised), plus the
zero-hit-row-kept contract and global-replace redaction."""

from __future__ import annotations

import re

import pytest

from tldr_spark.operators.patterns import (
    DEFAULT_PATTERNS,
    pattern_counts,
    pattern_profile,
    redact,
)

DOCS = [
    (1, "contact alice@example.com or bob.smith+tag@sub.domain.org today"),
    (2, "see https://example.com/a?b=1&c=2 and http://x.io/p_q panel 10.0.0.1"),
    (3, "card 1234567890123456 ip 192.168.1.254 and short 12345678"),
    (4, "no personal data here at all"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_counts():
    out = {}
    for doc_id, text in DOCS:
        out[doc_id] = {
            name: len(re.findall(pat, text)) for name, pat in DEFAULT_PATTERNS.items()
        }
    return out

def test_pattern_counts_matches_re(spark):
    got = {r["doc_id"]: r.asDict() for r in pattern_counts(_df(spark)).collect()}
    exp = _py_counts()
    for doc_id, counts in exp.items():
        for name, n in counts.items():
            assert got[doc_id][name] == n, (doc_id, name)
    # Spot-pins so the oracle itself is sanity-checked:
    assert got[1]["email"] == 2
    assert got[2]["url"] == 2 and got[2]["ipv4"] == 1
    assert got[3]["digit_run9"] == 1 and got[3]["ipv4"] == 1
    assert got[4] == {"doc_id": 4, "email": 0, "url": 0, "ipv4": 0, "digit_run9": 0}


def test_pattern_profile_keeps_zero_rows(spark):
    got = {r["pattern"]: r for r in pattern_profile(_df(spark)).collect()}
    assert set(got) == set(DEFAULT_PATTERNS)
    exp = _py_counts()
    for name in DEFAULT_PATTERNS:
        per_doc = [exp[d][name] for d, _ in DOCS]
        assert got[name]["docs_hit"] == sum(1 for n in per_doc if n > 0)
        assert got[name]["total_hits"] == sum(per_doc)
        assert got[name]["max_per_doc"] == max(per_doc)


def test_redact_global_and_count(spark):
    got = {r["doc_id"]: r for r in redact(_df(spark), DEFAULT_PATTERNS["email"]).collect()}
    assert got[1]["n_hits"] == 2
    assert got[1]["redacted"] == "contact <MASK> or <MASK> today"
    assert got[4]["redacted"] == "no personal data here at all"
    # python-re differential on every doc for the url pattern too
    pat = DEFAULT_PATTERNS["url"]
    got = {r["doc_id"]: r for r in redact(_df(spark), pat, mask="#").collect()}
    for doc_id, text in DOCS:
        assert got[doc_id]["redacted"] == re.sub(pat, "#", text)
        assert got[doc_id]["n_hits"] == len(re.findall(pat, text))


def test_pattern_counts_empty_patterns_raises(spark):
    with pytest.raises(ValueError):
        pattern_counts(_df(spark), patterns={})
