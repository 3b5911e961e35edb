"""Suffix-array construction + LCP longest-repeated-substring vs a
pure-Python sorted-suffix oracle."""

from __future__ import annotations

from tldr_spark.operators.suffix import longest_repeated_substring, suffix_array_ranks


def _py_lrs(text):
    n = len(text)
    suf = sorted(range(n), key=lambda i: text[i:])
    best = 0
    for a, b in zip(suf, suf[1:]):
        k = 0
        while a + k < n and b + k < n and text[a + k] == text[b + k]:
            k += 1
        best = max(best, k)
    return best


DOCS = [
    (0, "banana"),                       # lrs "ana" -> 3
    (1, "abcdefgh"),                     # all distinct -> 0
    (2, "abab abab abab"),               # long template repeat
    (3, "x"),                            # single char -> 0
    (4, ""),                             # no row
    (5, "mississippi river mississippi"),
    (6, "aaaaaaaa"),                     # run: lrs = 7
]


def test_suffix_order_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    final, tables, _ = suffix_array_ranks(df)
    got = {}
    for r in final.collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["pos"]))
    for d, text in DOCS:
        if not text:
            assert d not in got
            continue
        order = [p for _, p in sorted(got[d])]
        want = sorted(range(len(text)), key=lambda i: text[i:])
        assert order == want, (d, order, want)
    for t in tables:
        t.unpersist()


def test_lrs_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["doc_len"], r["lrs_len"])
           for r in longest_repeated_substring(df).collect()}
    for d, text in DOCS:
        if not text:
            assert d not in got
            continue
        assert got[d] == (len(text), _py_lrs(text)), (d, got[d])


def test_max_len_truncation(spark):
    df = spark.createDataFrame([(0, "abcabc" + "z" * 50)], "doc_id long, text string")
    got = longest_repeated_substring(df, max_len=6).collect()[0]
    assert (got["doc_len"], got["lrs_len"]) == (6, 3)


def _py_cross_lrs(docs):
    """Longest substring shared by two different docs (brute force)."""
    best = 0
    items = [(d, t) for d, t in docs if t]
    for i, (da, ta) in enumerate(items):
        for db, tb in items[i + 1:]:
            for ln in range(min(len(ta), len(tb)), best, -1):
                subs = {ta[k:k + ln] for k in range(len(ta) - ln + 1)}
                if any(tb[k:k + ln] in subs for k in range(len(tb) - ln + 1)):
                    best = max(best, ln)
                    break
    return best


def test_cross_doc_longest_repeat(spark):
    from tldr_spark.operators.suffix import cross_doc_longest_repeat

    docs = [
        (0, "the quick brown fox jumps"),
        (1, "a lazy dog saw the quick brown cat"),   # shares "the quick brown "
        (2, "zzz completely different yyy"),
        (3, "xx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = cross_doc_longest_repeat(df).collect()[0]
    want = _py_cross_lrs(docs)
    assert got["lrs_len"] == want
    # the witness pair must actually realize the length
    texts = dict(docs)
    a = texts[got["doc_a"]][got["pos_a"]:got["pos_a"] + got["lrs_len"]]
    b = texts[got["doc_b"]][got["pos_b"]:got["pos_b"] + got["lrs_len"]]
    assert a == b and len(a) == want


def test_cross_doc_no_overlap(spark):
    from tldr_spark.operators.suffix import cross_doc_longest_repeat

    df = spark.createDataFrame(
        [(0, "abc"), (1, "xyz")], "doc_id long, text string"
    )
    got = cross_doc_longest_repeat(df).collect()[0]
    assert got["lrs_len"] == 0


def test_bwt_runs_match_python(spark):
    from tldr_spark.operators.suffix import bwt_run_stats

    def _py_bwt_runs(text):
        n = len(text)
        sa = sorted(range(n), key=lambda i: text[i:])
        bwt = [text[i - 1] if i > 0 else "\x00" for i in sa]
        return 1 + sum(1 for x, y in zip(bwt, bwt[1:]) if x != y)

    docs = [(d, t) for d, t in DOCS if t]
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["doc_len"], r["bwt_runs"])
           for r in bwt_run_stats(df).collect()}
    for d, t in docs:
        assert got[d] == (len(t), _py_bwt_runs(t)), (d, got[d])
    # repetitive text compresses: runs far below doc_len
    assert got[6][1] <= 3  # "aaaaaaaa"
