"""Scale-path Jaro dedup (length-bucketed + pandas-UDF reference kernel)
vs exhaustive reference Jaro."""

from __future__ import annotations

import itertools

from tldr_spark.functions.reference import jaro_distance
from tldr_spark.operators.dedup import jaro_pairs


def test_jaro_pairs_match_exhaustive(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dogs"),
        (2, "the quick brown fox leaps over the lazy dog"),
        (3, "completely different content with other words"),
        (4, "short one"),
        (5, "short two"),
        (6, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in jaro_pairs(df, threshold=0.85).collect()}
    texts = dict(rows)
    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(texts), 2)
        if jaro_distance(texts[a], texts[b]) >= 0.85
    }
    assert got == expected
    assert (0, 6) in got  # identical texts caught


def test_jaro_bucket_bound_sound(spark):
    # a pair passing tau=0.85 can never span more than adjacent log-length
    # buckets: score <= (2m/|short| + 1)/3 <= (2|short|/|short| + 1)/3 only
    # if lengths comparable; sanity: wildly different lengths filtered out
    df = spark.createDataFrame(
        [(0, "ab"), (1, "ab" * 200)], "doc_id long, text string"
    )
    assert jaro_pairs(df, threshold=0.85).count() == 0


def test_textbook_jaro_matches_duckdb_bitwise():
    # the textbook variant is the SQL-oracle-checkable one: it must agree
    # with DuckDB's jaro_similarity to the last ulp
    import random

    import duckdb

    from tldr_spark.operators.dedup import textbook_jaro

    con = duckdb.connect()
    rng = random.Random(123)
    words = "the quick brown fox jumps over lazy dog ein zwei drei le la".split()
    for _ in range(500):
        a = " ".join(rng.choices(words, k=rng.randint(1, 25)))
        b = " ".join(rng.choices(words, k=rng.randint(1, 25)))
        d = con.execute("select jaro_similarity(?, ?)", [a, b]).fetchone()[0]
        assert textbook_jaro(a, b) == d, (a, b)


def test_jaro_pairs_textbook_variant(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dogs"),
        (2, "entirely different words appear here instead"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaro"]
        for r in jaro_pairs(df, threshold=0.9, variant="textbook").collect()
    }
    from tldr_spark.operators.dedup import textbook_jaro

    assert set(got) == {(0, 1)}
    assert got[(0, 1)] == textbook_jaro(rows[0][1], rows[1][1])


def test_fast_jaro_kernels_bit_match_straight_ports():
    """The optimized kernels (candidate-skipping reference variant,
    per-character two-pointer textbook variant) must reproduce the straight
    ports bit-for-bit — including the Go port's fast-path double-count,
    scan-overrun flagging, and transposition-stall quirks — across random
    ASCII and non-ASCII inputs and the degenerate cases."""
    import random

    from tldr_spark.functions.jaro_fast import jaro_distance_fast, textbook_jaro_fast
    from tldr_spark.functions.reference import jaro_distance
    from tldr_spark.operators.dedup import textbook_jaro

    rng = random.Random(20260817)
    alph = "abcdefg xyz.,'- éü漢"
    words = "the quick brown fox jumps over lazy dog museum star".split()
    cases = [("", ""), ("", "a"), ("a", ""), ("abc", "abc"), ("a", "b"),
             ("aaaa", "aaa"), ("ab" * 40, "ba" * 40)]
    for _ in range(1500):
        n1, n2 = rng.randint(0, 60), rng.randint(0, 60)
        cases.append((
            "".join(rng.choice(alph) for _ in range(n1)),
            "".join(rng.choice(alph) for _ in range(n2)),
        ))
    for _ in range(300):
        cases.append((
            " ".join(rng.choices(words, k=rng.randint(1, 60))),
            " ".join(rng.choices(words, k=rng.randint(1, 60))),
        ))
    for a, b in cases:
        assert jaro_distance_fast(a, b) == jaro_distance(a, b), (repr(a), repr(b))
        assert textbook_jaro_fast(a, b) == textbook_jaro(a, b), (repr(a), repr(b))


def test_batch_scorers_match_scalars():
    import pandas as pd

    from tldr_spark.functions.jaro_fast import (
        jaro_reference_batch,
        textbook_jaro_batch,
    )
    from tldr_spark.functions.reference import jaro_distance
    from tldr_spark.operators.dedup import textbook_jaro

    a = pd.Series(["the quick brown fox", "éàü wörds", None, "", "same text"])
    b = pd.Series(["the quick brown fix", "éàü words", "x", None, "same text"])
    tb = textbook_jaro_batch(a, b)
    ref = jaro_reference_batch(a, b)
    for i in range(len(a)):
        x, y = a[i] or "", b[i] or ""
        assert tb[i] == textbook_jaro(x, y), i
        assert ref[i] == jaro_distance(x, y), i
