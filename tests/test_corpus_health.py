"""Corpus-health wave: per-group dup profile + boilerplate gram probe.

Pinned against hand-computed oracles on a fixture small enough to check
by eye (the driver's DuckDB oracle re-checks both at sf0.01).
"""

from __future__ import annotations

from tldr_spark.operators.dedup import group_dup_stats
from tldr_spark.operators.textstats import boilerplate_top_grams

DOCS = [
    # (doc_id, text, lang, source)
    (0, "the cat sat on the mat", "en", "srcA"),
    (1, "the cat sat on the mat", "en", "srcA"),  # exact dup of 0
    (2, "a dog ran in the park", "en", "srcA"),
    (3, "le chat dort", "fr", "srcB"),
    (4, "le chat dort", "fr", "srcB"),  # dup of 3
    (5, "le chien court", "fr", "srcB"),
    (6, "le chat dort", "fr", "srcB"),  # another dup of 3
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )


def test_group_dup_stats_by_lang(spark):
    got = {
        r["grp"]: (r["n_docs"], r["n_distinct"], r["dup_docs"], r["dup_ratio"])
        for r in group_dup_stats(_docs(spark), group_col="lang").collect()
    }
    assert got["en"] == (3, 2, 1, 1 / 3)
    assert got["fr"] == (4, 2, 2, 0.5)


def test_group_dup_stats_scoped_within_group(spark):
    # the same text in TWO groups is not a cross-group dup
    docs = spark.createDataFrame(
        [(0, "same text here", "en", "x"), (1, "same text here", "fr", "y")],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["grp"]: r["dup_docs"] for r in group_dup_stats(docs, group_col="lang").collect()}
    assert got == {"en": 0, "fr": 0}


def test_boilerplate_top_grams_handcrafted(spark):
    # srcB: "le chat dort" appears (distinct per doc) in docs 3,4,6 -> df=3;
    # "le chien court" in doc 5 -> df=1. srcB has 4 docs.
    out = boilerplate_top_grams(_docs(spark), n=3, top_k=5)
    rows = {(r["source"], r["gram"]): (r["df"], r["n_docs_source"], r["rk"]) for r in out.collect()}
    assert rows[("srcB", "le chat dort")] == (3, 4, 1)
    assert rows[("srcB", "le chien court")] == (1, 4, 2)
    # srcA rank-1 gram is the dup'd doc's grams (each df=2); tie broken
    # gram-ascending: "cat sat on" < "on the mat" < "sat on the" < "the cat sat"
    src_a = sorted(
        [(v[2], k[1]) for k, v in rows.items() if k[0] == "srcA" and v[0] == 2]
    )
    assert [g for _, g in src_a] == sorted(g for _, g in src_a)
    assert rows[("srcA", "cat sat on")][2] == 1


def test_boilerplate_top_k_clamps(spark):
    out = boilerplate_top_grams(_docs(spark), n=3, top_k=2)
    per_src: dict[str, int] = {}
    for r in out.collect():
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
        assert r["rk"] <= 2
    assert per_src == {"srcA": 2, "srcB": 2}
