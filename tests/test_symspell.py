"""SymSpell edit-1 pairs: brute-force levenshtein oracle (proving the
deletion-neighborhood candidate set is complete), per-edit-kind pins
(substitution / insertion / deletion), equal-string exclusion, empty
string edge, duplicate-row insensitivity, random differential."""

from __future__ import annotations

import random

from tldr_spark.operators.symspell import edit1_pairs


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py(tokens):
    toks = sorted(set(tokens))
    return {
        (a, b)
        for i, a in enumerate(toks)
        for b in toks[i + 1 :]
        if _lev(a, b) == 1
    }


def _got(spark, tokens):
    df = spark.createDataFrame([(t,) for t in tokens], "s string")
    return {(r.s_a, r.s_b) for r in edit1_pairs(df, col="s").collect()}


TOKENS = ["cat", "cut", "cats", "at", "dog", "dot", "do", "", "a", "abc", "axc", "abcd"]


def test_matches_bruteforce(spark):
    got = _got(spark, TOKENS)
    want = _py(TOKENS)
    assert got == want
    # each edit kind is represented
    assert ("cat", "cut") in got  # substitution
    assert ("cat", "cats") in got  # insertion
    assert ("at", "cat") in got  # deletion
    assert ("", "a") in got  # empty vs single char


def test_no_equal_or_far_pairs(spark):
    got = _got(spark, ["same", "same", "same", "far", "blah"])
    assert got == set()


def test_duplicate_rows_insensitive(spark):
    assert _got(spark, TOKENS * 3) == _got(spark, TOKENS)


def test_random_differential(spark):
    rng = random.Random(99)
    alphabet = "abc"
    toks = {
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 5)))
        for _ in range(60)
    }
    assert _got(spark, sorted(toks)) == _py(toks)
