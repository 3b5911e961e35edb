"""Prefix-filtered exact Jaccard join == brute-force gram join, plus
candidate-pruning sanity."""

from __future__ import annotations

from tldr_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_candidates,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _corpus():
    docs = []
    for i in range(30):
        toks = [WORDS[(i * 3 + k * 7) % len(WORDS)] for k in range(6 + i % 5)]
        docs.append((i, " ".join(toks)))
    # exact and near duplicates that MUST survive the filter
    docs.append((100, docs[4][1]))
    docs.append((101, docs[7][1] + " extra"))
    docs.append((102, "alpha beta gamma delta epsilon zeta"))
    docs.append((103, "alpha beta gamma delta epsilon eta"))
    return docs


def _pairs(df_rows):
    return {(r["id_a"], r["id_b"]) for r in df_rows}


def test_prefix_filter_complete_and_exact(spark):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    brute = ngram_jaccard_pairs(docs, n=3, threshold=0.6)
    cand = prefix_filter_candidates(docs, n=3, t_num=3, t_den=5)
    verified = ngram_jaccard_pairs(docs, n=3, threshold=0.6, candidates=cand)
    bset = {(r["id_a"], r["id_b"]): r["jaccard"] for r in brute.collect()}
    vset = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert bset.keys() == vset.keys()
    for k in bset:
        assert abs(bset[k] - vset[k]) < 1e-12
    assert (4, 100) in bset  # the planted exact duplicate survived


def test_candidates_are_pruned_superset(spark):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    n_docs = docs.count()
    cand = _pairs(prefix_filter_candidates(docs, n=3, t_num=3, t_den=5).collect())
    answers = _pairs(ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect())
    assert answers <= cand  # completeness (the prefix lemma)
    assert len(cand) < n_docs * (n_docs - 1) // 2  # and it actually prunes


def test_threshold_one_keeps_exact_dups(spark):
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    cand = prefix_filter_candidates(docs, n=3, t_num=1, t_den=1)
    verified = _pairs(
        ngram_jaccard_pairs(docs, n=3, threshold=1.0, candidates=cand).collect()
    )
    assert (4, 100) in verified
