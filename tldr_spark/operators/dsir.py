"""DSIR-style importance weights for data selection (Xie et al.,
NeurIPS'23 "Data Selection for Language Models via Importance
Resampling"): score every document by how much more likely its hashed
n-gram bag is under a target-domain multinomial LM than under the raw
corpus LM — log w(d) = sum_f c_d(f) * [log p_target(f) - log q_raw(f)]
with add-1 smoothing over B hash buckets. Ranking/resampling by w is
the published recipe for "select the 1% of the crawl that looks like
the target domain".

Spark shape: features (unigrams + bigrams, WITH multiplicity) come from
pure array expressions over one corpus scan — no window, no UDF; each
LM is a map-side-combined aggregate that collapses to <= B rows and
BROADCASTS (B is a constant, default 1024 — the bucket table is tiny by
construction, unlike a vocabulary); the per-doc weight is one doc-keyed
aggregate. Total: two tiny broadcast frames + two shuffles (doc-bucket
counts, per-doc sum) regardless of corpus size.

Cross-engine determinism: bucket = first-8-hex md5(feature) mod B (the
repo's established md5 bridge, dedup.py simhash), counts and totals are
exact integers, and the only floats are the final ln/× terms.

Docs with zero tokens contribute no features and drop out of the
output. An empty target subset degrades to a uniform target LM (all
cp = 0) — defined, and exactly what add-1 smoothing should do."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _features(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, feature) with multiplicity: whitespace unigrams + adjacent
    bigrams, built entirely from array expressions (no window shuffle)."""
    l = F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+")
    uni = F.filter(l, lambda t: t != "")
    big = F.when(
        F.size(l) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(l) - 1),
            lambda i: F.concat_ws(" ", F.element_at(l, i), F.element_at(l, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.concat(uni, big)).alias("feature"),
    )


def dsir_logweights(
    docs: DataFrame,
    is_target: Column,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_feats, logw). ``is_target`` is a boolean Column over
    ``docs`` selecting the target-domain subset; ``buckets`` the hashed
    feature space size B (>= 2)."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    tagged = docs.withColumn("_tgt", is_target)
    bucket = (
        F.conv(F.substring(F.md5("feature"), 1, 8), 16, 10).cast("long") % buckets
    )
    feats = _features(tagged, id_col, text_col).select("id", bucket.alias("b"))
    docf = feats.groupBy("id", "b").agg(F.count(F.lit(1)).alias("c"))

    tgt_ids = tagged.where(F.col("_tgt")).select(F.col(id_col).alias("id"))
    lm_q = docf.groupBy("b").agg(F.sum("c").alias("cq"))
    lm_p = (
        docf.join(tgt_ids, "id", "left_semi")
        .groupBy("b")
        .agg(F.sum("c").alias("cp"))
    )
    tot = (
        lm_q.agg(F.coalesce(F.sum("cq"), F.lit(0)).alias("nq"))
        .join(lm_p.agg(F.coalesce(F.sum("cp"), F.lit(0)).alias("np")))
    )

    scored = (
        docf.join(F.broadcast(lm_q), "b")
        .join(F.broadcast(lm_p), "b", "left")
        .select(
            "id",
            "c",
            (
                F.col("c")
                * (
                    F.log(F.coalesce(F.col("cp"), F.lit(0)) + 1.0)
                    - F.log(F.col("cq") + 1.0)
                )
            ).alias("term"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.sum("c").alias("n_feats"), F.sum("term").alias("ratio_sum"))
        .join(F.broadcast(tot))
        .select(
            "id",
            "n_feats",
            (
                F.col("ratio_sum")
                + F.col("n_feats")
                * (
                    F.log(F.col("nq") + float(buckets))
                    - F.log(F.col("np") + float(buckets))
                )
            ).alias("logw"),
        )
    )
