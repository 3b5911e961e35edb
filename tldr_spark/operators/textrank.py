"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04) — the direct
generalization of the reference's LexRank core from sentence graphs to
word graphs: vertices are corpus words, edges connect words co-occurring
within a ±window token distance, scores come from the SAME weighted
PageRank fixpoint the reference pins (operators/pagerank.py implements
alixaxel/pagerank semantics, /root/reference/tldr.go:233-243), and the
top-ranked words are the corpus keywords.

Spark-first shape: the co-occurrence pairs come from a shift-and-equi-join
— each token row is exploded to the ``window`` positions it reaches
(pos+1..pos+window) and equi-joined on (doc_id, position), so the join is
a plain hash join doing O(total_tokens · window) work. (The obvious
``pos2 - pos1 <= window`` self-join on doc_id alone would evaluate
O(len²) candidate pairs per document inside the join.)
The graph itself is vocabulary-sized (tiny next to the corpus), after
which the shared PageRank machinery — one V-row aggregate per iteration —
runs on word keys directly; no word→int dictionary pass is needed because
the engine's PageRank treats vertex ids as opaque join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_graph(
    docs: DataFrame,
    window: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(src, dst, weight): the undirected co-occurrence graph, both
    directions materialized, weight = co-occurrence count. Self-pairs
    (the same word twice within the window) are dropped."""
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""
    )
    tp = docs.select(F.col(id_col).alias("d"), F.posexplode(toks).alias("pos", "w"))
    reach = tp.select(
        "d",
        F.col("w").alias("src_w"),
        F.explode(
            F.sequence(F.col("pos") + 1, F.col("pos") + window)
        ).alias("pos"),
    )
    pairs = (
        reach.join(tp, ["d", "pos"])
        .where(F.col("src_w") != F.col("w"))
        .select(F.col("src_w").alias("src"), F.col("w").alias("dst"))
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return sym.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def textrank_keywords(
    docs: DataFrame,
    window: int = 2,
    n_iter: int = 12,
    damping: float = 0.85,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(word, rank): every vocabulary word with its fixed-``n_iter``
    TextRank score. Callers top-k AFTER quantizing (the driver query
    returns all words 2^-20-quantized, so there is no cutoff to disagree
    about cross-engine)."""
    from pyspark.sql import Window

    from tldr_spark.operators.pagerank import pagerank

    g = word_graph(docs, window=window, id_col=id_col, text_col=text_col)
    # The engine PageRank is long-id typed (prepare_edges casts); assign
    # dense word ids. The row_number window is a single-partition sort of
    # the VOCABULARY — orders of magnitude smaller than the corpus; swap
    # for the range-partition+offset id assigner (nullmodel.py) if a
    # corpus's vocabulary ever rivals its token count.
    vocab = (
        g.select(F.col("src").alias("word"))
        .union(g.select("dst"))
        .distinct()
        .withColumn("wid", F.row_number().over(Window.orderBy("word")).cast("long"))
    )
    ge = (
        g.join(vocab.withColumnRenamed("word", "src"), "src")
        .withColumnRenamed("wid", "src_id")
        .join(vocab.withColumnRenamed("word", "dst"), "dst")
        .withColumnRenamed("wid", "dst_id")
        .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"), "weight")
    )
    res = pagerank(ge, damping=damping, tolerance=-1.0, max_iter=n_iter)
    return res.ranks.join(vocab, res.ranks.id == vocab.wid).select("word", "rank")
