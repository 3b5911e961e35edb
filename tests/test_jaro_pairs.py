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
