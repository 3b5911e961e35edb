"""Ranking-quality evaluation — per-query nDCG@k (exponential gain),
MRR@k, and AP@k over a (query, item, predicted score, relevance grade)
frame: the offline recommender/retrieval scorecard a ranking pipeline
(BM25, link recommendation, popularity) is judged by.

Pure window algebra: ONE hash exchange on the query key feeds both the
prediction-order and the ideal-order sorts plus the running relevant
count; the aggregate collapses to one row per query. No UDFs, no
driver rows, no joins — evaluates 10^9 (query, item) rows with a single
shuffle. Ties in predicted score break on item id (deterministic
cross-engine); ideal-order ties are between equal gains, so tie order
cannot change IDCG.

Conventions: queries with no relevant item get NULL nDCG and NULL AP
(undefined — distinguishes "ranked badly" from "nothing to find") and
MRR 0.0; AP@k divides by min(R, k) (the standard trec_eval choice), so
a perfect top-k earns 1.0 even when R > k."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int,
) -> DataFrame:
    """(query, n_items, n_rel, ndcg_k, mrr_k, ap_k). ``rel_col`` is an
    integer grade >= 0 (gain 2^rel - 1); rel > 0 counts as relevant for
    MRR/AP. k must be >= 1."""
    if k < 1:
        raise ValueError("k must be >= 1")
    q, item = F.col(query_col), F.col(item_col)
    rel = F.col(rel_col).cast("long")
    w_pred = Window.partitionBy(q).orderBy(F.col(score_col).desc(), item)
    w_ideal = Window.partitionBy(q).orderBy(rel.desc(), item)
    w_cum = w_pred.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    gain = F.pow(F.lit(2.0), rel) - F.lit(1.0)
    i = F.row_number().over(w_pred)
    j = F.row_number().over(w_ideal)
    hit = (rel > 0).cast("long")
    cum_hits = F.sum(hit).over(w_cum)

    terms = df.select(
        q.alias("query"),
        rel.alias("rel"),
        i.alias("i"),
        j.alias("j"),
        gain.alias("gain"),
        cum_hits.alias("cum_hits"),
    )
    topk = F.col("i") <= k
    relevant = F.col("rel") > 0
    agg = terms.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(relevant.cast("long")).alias("n_rel"),
        F.sum(F.when(topk, F.col("gain") / F.log2(F.col("i") + 1))).alias("dcg"),
        F.sum(
            F.when(F.col("j") <= k, F.col("gain") / F.log2(F.col("j") + 1))
        ).alias("idcg"),
        F.min(F.when(topk & relevant, F.col("i"))).alias("first_hit"),
        F.sum(
            F.when(topk & relevant, F.col("cum_hits").cast("double") / F.col("i"))
        ).alias("prec_sum"),
    )
    denom = F.least(F.col("n_rel"), F.lit(k)).cast("double")
    return agg.select(
        "query",
        "n_items",
        "n_rel",
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).alias("ndcg_k"),
        F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0)).alias("mrr_k"),
        F.when(
            F.col("n_rel") > 0, F.coalesce(F.col("prec_sum"), F.lit(0.0)) / denom
        ).alias("ap_k"),
    )
