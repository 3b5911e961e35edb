"""BPE induction vs an exact python mirror (greedy left-to-right merge)."""

from __future__ import annotations

import random

import pytest

from tldr_spark.operators.bpe import bpe_learn, bpe_segment, merge_pair


def _py_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(vocab, n_merges):
    vocab = {w: (n, [c for c in w]) for w, n in vocab.items() if w}
    merges = []
    for r in range(1, n_merges + 1):
        counts = {}
        for n, syms in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, cnt))
        vocab = {w: (n, _py_merge(s, a, b)) for w, (n, s) in vocab.items()}
    return merges, {w: s for w, (n, s) in vocab.items()}


def _run(spark, vocab, n_merges):
    df = spark.createDataFrame(sorted(vocab.items()), "word string, n long")
    res = bpe_learn(df, n_merges)
    merges = [
        (r["merge_rank"], r["a"], r["b"], r["pair_count"])
        for r in res.merges.orderBy("merge_rank").collect()
    ]
    syms = {r["word"]: list(r["syms"]) for r in res.vocab.collect()}
    return merges, syms


def test_textbook_example(spark):
    # the classic Sennrich toy vocabulary
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got_m, got_v = _run(spark, vocab, 4)
    want_m, want_v = _py_bpe(vocab, 4)
    assert got_m == want_m
    assert got_v == want_v
    # first merge on this vocab is (e, s) with count 9 — pin it hard
    assert got_m[0][1:] == ("e", "s", 9)


def test_repeated_symbol_runs_merge_greedily(spark):
    # aaaa -> [aa, aa]; aaa -> [aa, a]: the a == b parity path
    vocab = {"aaaa": 3, "aaa": 2}
    got_m, got_v = _run(spark, vocab, 1)
    want_m, want_v = _py_bpe(vocab, 1)
    assert got_m == want_m and got_v == want_v
    assert got_v["aaaa"] == ["aa", "aa"]
    assert got_v["aaa"] == ["aa", "a"]


def test_merged_symbols_chain_across_rounds(spark):
    vocab = {"abab": 4, "abc": 1}
    got_m, got_v = _run(spark, vocab, 3)
    want_m, want_v = _py_bpe(vocab, 3)
    assert got_m == want_m and got_v == want_v
    assert got_v["abab"] == ["abab"]  # (a,b) then (ab,ab)


@pytest.mark.parametrize("seed", [0, 1])
def test_random_vocab_matches_python(spark, seed):
    rnd = random.Random(seed)
    alpha = "abcde"
    vocab = {}
    for _ in range(60):
        w = "".join(rnd.choice(alpha) for _ in range(rnd.randrange(1, 9)))
        vocab[w] = vocab.get(w, 0) + rnd.randrange(1, 6)
    got_m, got_v = _run(spark, vocab, 6)
    want_m, want_v = _py_bpe(vocab, 6)
    assert got_m == want_m
    assert got_v == want_v


def test_early_stop_and_validation(spark):
    # single-char vocab: zero pairs, zero merges
    df = spark.createDataFrame([("a", 5), ("b", 3)], "word string, n long")
    res = bpe_learn(df, 4)
    assert res.merges.count() == 0
    seg = {r["word"]: r["segmented"] for r in bpe_segment(res.vocab).collect()}
    assert seg == {"a": "a", "b": "b"}
    with pytest.raises(ValueError):
        bpe_learn(df, 0)


def test_merge_pair_unit(spark):
    df = spark.createDataFrame(
        [("xaax", 1)], "word string, n long"
    ).selectExpr(
        "word", "n",
        "transform(sequence(1, char_length(word)), i -> substring(word, i, 1)) AS syms",
    )
    out = {r["word"]: list(r["syms"]) for r in merge_pair(df, "a", "a").collect()}
    assert out == {"xaax": ["x", "aa", "x"]}
