"""Quality-aware dedup survivor selection on a planted cluster."""

from __future__ import annotations

from tldr_spark.operators.dedup import near_dup_clusters, quality_dedup_survivors

BASE = (
    "the quick brown fox jumps over the lazy dog and it was a fine day "
    "in the meadow with many other animals around"
)


def _docs(spark):
    rows = [
        (0, BASE),                                   # high quality dup
        (1, BASE + " extra tail words here"),        # longer dup, same quality
        (2, "!!! ??? ... ;;; ***"),                  # junk singleton
        (3, "completely different text about graphs and spark engines "
            "that is long enough to have the stopwords the and of it"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_survivor_prefers_quality_then_length(spark):
    docs = _docs(spark)
    clusters = {r["doc_id"]: r["canonical_id"]
                for r in near_dup_clusters(docs, n=3, threshold=0.5).collect()}
    assert clusters[0] == clusters[1] != clusters[2]
    got = {r["canonical_id"]: r for r in
           quality_dedup_survivors(docs, n=3, threshold=0.5).collect()}
    dup_cluster = got[clusters[0]]
    # doc 1 wins: same quality bucket as doc 0, more chars
    assert dup_cluster["survivor_doc"] == 1
    assert dup_cluster["cluster_size"] == 2 and dup_cluster["n_removed"] == 1
    # singletons survive themselves with n_removed 0
    assert got[clusters[2]]["survivor_doc"] == 2
    assert got[clusters[2]]["n_removed"] == 0
    # every cluster emits exactly one survivor row
    assert len(got) == len(set(clusters.values()))
