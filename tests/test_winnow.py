"""Winnowing fingerprints: exact python mirror of the SIGMOD'03
selection (same md5 gram hashes, rightmost-min tie rule, short-doc
single-window convention), the paper's coverage guarantee (a shared
substring of length >= w + k - 1 always shares a fingerprint), density
~ 2/(w+1), shared-pair symmetry/prune behavior, arg validation."""

from __future__ import annotations

import hashlib
import re

import pytest

from tldr_spark.operators.winnow import winnow_fingerprints, winnow_shared_pairs


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    s = re.sub(r"[^a-z0-9]", "", text.lower())
    g = len(s) - (k - 1)
    if g < 1:
        return set()
    hs = [int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:8], 16) for i in range(g)]
    out = set()
    for i in range(max(g - (w - 1), 1)):
        win = hs[i : i + w]
        m = min(win)
        p = max(j for j, h in enumerate(win) if h == m) + i
        out.add((p + 1, hs[p]))
    return out


DOCS = [
    (1, "A do run run run, a do run run"),
    (2, "a do run run run a do run run"),  # sanitizes identically to doc 1
    (3, "completely different content with many words flowing onward"),
    (4, "tiny"),  # 4 sanitized chars < k=5 -> no grams
    (5, "exact"),  # exactly k chars -> one gram, one fingerprint
    (6, ""),
    (7, "do run run run, a different tail that still shares the head a do run run run"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("k,w", [(5, 8), (3, 4), (5, 1), (1, 2)])
def test_matches_python(spark, k, w):
    got = {(r.id, r.pos, r.fp) for r in winnow_fingerprints(_df(spark), k=k, w=w).collect()}
    want = {(d, p, h) for d, t in DOCS for (p, h) in _py_winnow(t, k, w)}
    assert got == want


def test_coverage_guarantee(spark):
    # the paper's theorem: any common substring of length >= w + k - 1
    # shares at least one selected fingerprint hash. Docs 1/2/7 share
    # long sanitized spans; build many random-ish pairs and check it.
    k, w = 5, 8
    texts = {d: re.sub(r"[^a-z0-9]", "", t.lower()) for d, t in DOCS}
    fps = winnow_fingerprints(_df(spark), k=k, w=w).collect()
    by_doc: dict[int, set[int]] = {}
    for r in fps:
        by_doc.setdefault(r.id, set()).add(r.fp)
    for a in texts:
        for b in texts:
            if a >= b:
                continue
            sa, sb = texts[a], texts[b]
            shares_span = any(
                sa[i : i + w + k - 1] in sb
                for i in range(len(sa) - (w + k - 1) + 1)
            )
            if shares_span:
                assert by_doc.get(a, set()) & by_doc.get(b, set()), (a, b)


def test_density(spark):
    # expected density 2/(w+1); on a long pseudo-random doc the observed
    # density should be within a loose factor of it
    text = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(200)
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n = winnow_fingerprints(df, k=5, w=8).count()
    g = len(re.sub(r"[^a-z0-9]", "", text.lower())) - 4
    density = n / g
    assert 1.2 / 9 < density < 3.5 / 9, density


def test_shared_pairs(spark):
    pairs = {
        (r.id_a, r.id_b): r.shared_fps
        for r in winnow_shared_pairs(_df(spark), min_shared=1).collect()
    }
    fps = winnow_fingerprints(_df(spark)).collect()
    by_doc: dict[int, set[int]] = {}
    for r in fps:
        by_doc.setdefault(r.id, set()).add(r.fp)
    want = {}
    for a in by_doc:
        for b in by_doc:
            if a < b and by_doc[a] & by_doc[b]:
                want[(a, b)] = len(by_doc[a] & by_doc[b])
    assert pairs == want
    # identical sanitized text -> identical fingerprint sets
    assert pairs[(1, 2)] == len(by_doc[1])


def test_max_df_prunes_boilerplate(spark):
    # a fingerprint present in >max_df docs must not generate pairs
    rows = [(i, "shared boilerplate chrome line") for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert winnow_shared_pairs(df, min_shared=1, max_df=4).count() == 0
    assert winnow_shared_pairs(df, min_shared=1, max_df=5).count() == 10


def test_raises(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)
    with pytest.raises(ValueError):
        winnow_shared_pairs(df, min_shared=0)
    with pytest.raises(ValueError):
        winnow_shared_pairs(df, max_df=1)
