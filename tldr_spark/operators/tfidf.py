"""TF-IDF weighting + sparse cosine document similarity.

The relational formulation (nothing dense, nothing driver-side):

  term frequencies   explode tokens → count per (doc, token)   [1 shuffle]
  document freqs     count distinct docs per token             [1 shuffle]
  tfidf              tf · idf, idf = ln((N + 1)/(df + 1)) + 1  (smoothed,
                     so unseen/ubiquitous terms never divide by zero)
  cosine pairs       self-join on token — the classic sparse similarity
                     join: sum(w_a · w_b) / (‖a‖ ‖b‖) over SHARED tokens
                     only, so the join fan-out per token is df², never V².

Scale controls (the 100-TB story):
  * ``max_df_ratio`` drops stop-like tokens before the pair join — a token
    in half the corpus contributes df²/4 candidate pairs and near-zero
    idf weight, so pruning it changes scores negligibly while removing the
    quadratic hot key (the same reason every production sparse-similarity
    system — e.g. Spark's own CountVectorizer(maxDF) — exposes the knob).
    The cap is on the CANDIDATE GENERATION only; norms keep every token so
    retained pairs still use exact full-vector norms. Off by default (1.0)
    so the driver oracle compares the exact all-token semantics.
  * ``candidates=`` restricts the pair join to an externally supplied
    candidate set (e.g. MinHash-LSH buckets), the same contract as
    ``dedup.embedding_near_dups``.

Tokenization matches the engine-wide explicit class [ \\t\\n\\r\\f]+
(identical in Java regex and DuckDB RE2 — ADVICE r2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _term_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != "")
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_vectors(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, token, tf, df, tfidf) — one row per distinct (doc, token);
    the sparse TF-IDF matrix in COO form. N = total document count
    (a 1-row broadcast, not a driver collect)."""
    tc = _term_counts(docs, id_col, text_col)
    df_ = tc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    return (
        tc.join(df_, "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1.0)
            ).alias("tfidf"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_ratio: float = 1.0,
    candidates: DataFrame | None = None,
    weighting: str = "tfidf",
) -> DataFrame:
    """(doc_a, doc_b, cosine) for doc_a < doc_b with cosine >= threshold
    under ``weighting`` = "tfidf" (default) or "tf" (raw term counts — every
    arithmetic op is then an integer sum or an IEEE-exactly-rounded
    sqrt/division, so results are bit-identical across engines; the tfidf
    weighting goes through ln(), whose last-ulp behavior is libm-specific).
    Exact when ``max_df_ratio=1.0`` and ``candidates=None``; both knobs only
    PRUNE candidate generation (norms stay exact), which lower-bounds the
    reported cosine of surviving pairs."""
    if weighting not in ("tfidf", "tf"):
        raise ValueError(f"unknown weighting {weighting!r}")
    vec = tfidf_vectors(docs, id_col, text_col)
    if weighting == "tf":
        vec = vec.withColumn("tfidf", F.col("tf").cast("double"))
    vec = vec.persist()
    norms = vec.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("norm")
    )
    joinable = vec
    if max_df_ratio < 1.0:
        n = docs.select(F.count(F.lit(1)).alias("n_docs"))
        joinable = vec.join(F.broadcast(n)).filter(
            F.col("df") <= F.col("n_docs") * F.lit(float(max_df_ratio))
        )
    a = joinable.select(
        F.col("doc_id").alias("doc_a"), "token", F.col("tfidf").alias("wa")
    )
    b = joinable.select(
        F.col("doc_id").alias("doc_b"), "token", F.col("tfidf").alias("wb")
    )
    pairs = a.join(b, "token").filter(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        pairs = pairs.join(
            candidates.select("doc_a", "doc_b").distinct(), ["doc_a", "doc_b"], "left_semi"
        )
    dots = pairs.groupBy("doc_a", "doc_b").agg(
        F.sum(F.col("wa") * F.col("wb")).alias("dot")
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("norm_b"))
    out = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("dot") / (F.col("norm_a") * F.col("norm_b"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= float(threshold))
        .localCheckpoint(eager=True)
    )
    vec.unpersist()
    return out


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, mean_logprob) — per-document mean log-probability
    under the corpus's own add-one-smoothed unigram model:

        P(t) = (c(t) + 1) / (T + V)

    with c(t) the corpus count, T total tokens, V vocabulary size. This is
    the cheap stand-in for CCNet's KenLM perplexity filter (Wenzek et al.
    2020): machine-garbage and boilerplate pages land far below the corpus
    mode, natural text lands near it, and the score needs only two corpus
    aggregates (token counts; the (T, V) scalar pair) joined back onto the
    per-doc token counts — three shuffles total, independent of corpus
    size. Empty documents get n_tokens = 0 and NULL mean_logprob."""
    tc = _term_counts(docs, id_col, text_col).persist()
    corpus = tc.groupBy("token").agg(F.sum("tf").alias("c"))
    totals = corpus.agg(
        F.sum("c").alias("t_tokens"), F.count(F.lit(1)).alias("v_vocab")
    )
    scored = (
        tc.join(corpus, "token")
        .join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(
                    F.col("tf")
                    * F.log(
                        (F.col("c") + 1).cast("double")
                        / (F.col("t_tokens") + F.col("v_vocab"))
                    )
                )
                / F.sum("tf")
            ).alias("mean_logprob"),
        )
    )
    # docs with zero tokens have no term rows: restore them with NULL score
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    out = (
        all_docs.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "mean_logprob",
        )
        .localCheckpoint(eager=True)
    )
    tc.unpersist()
    return out


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_transitions, mean_logprob) — per-document mean bigram
    log-probability under the corpus's own add-one-smoothed model:

        P(t_i | t_{i-1}) = (c(t_{i-1}, t_i) + 1) / (ctx(t_{i-1}) + V)

    with c the corpus bigram count, ctx(w) = w's occurrences as a bigram
    CONTEXT (non-final position — the exact row-stochastic normalizer),
    V the vocabulary size. One order sharper than
    :func:`unigram_logprob` as the CCNet/KenLM perplexity stand-in:
    unigram scores are blind to scrambled word order; this is not.

    Shape: per-doc bigram extraction is ONE doc-partitioned lead()
    window; corpus bigram counts and context counts are two map-side-
    combined aggregates (the second derived from the first — no second
    pass over the corpus); V rides along as a 1-row broadcast. Documents
    with fewer than 2 tokens have no transitions: NULL mean_logprob.
    """
    from pyspark.sql import Window

    from tldr_spark.operators.index import _tokens

    t = _tokens(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        t.select(
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    corpus = big.groupBy("w1", "w2").agg(F.sum("tf").alias("c"))
    ctx = corpus.groupBy("w1").agg(F.sum("c").alias("cw"))
    vocab = t.agg(F.count_distinct("token").alias("v_vocab"))
    scored = (
        big.join(corpus, ["w1", "w2"])
        .join(ctx, "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_transitions"),
            (
                F.sum(
                    F.col("tf")
                    * F.log(
                        (F.col("c") + 1).cast("double")
                        / (F.col("cw") + F.col("v_vocab"))
                    )
                )
                / F.sum("tf")
            ).alias("mean_logprob"),
        )
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_transitions", F.lit(0)).alias("n_transitions"),
            "mean_logprob",
        )
        .localCheckpoint(eager=True)
    )
    big.unpersist()
    return out


def trigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_transitions, mean_logprob) — per-document mean TRIGRAM
    log-probability under the corpus's own add-one-smoothed model:

        P(t_i | t_{i-2}, t_{i-1}) = (c(t_{i-2}, t_{i-1}, t_i) + 1)
                                    / (ctx(t_{i-2}, t_{i-1}) + V)

    with c the corpus trigram count, ctx(w1, w2) = the bigram's
    occurrences as a trigram CONTEXT (non-final, i.e. followed by at
    least one token — the exact row-stochastic normalizer), V the
    unigram vocabulary size. One Markov order sharper than
    :func:`bigram_logprob`: the bigram model cannot tell "the the the"
    loops from text once each adjacent pair is plausible; the trigram
    penalizes locally-repetitive machine spam that per-pair statistics
    miss (the CCNet-style quality ladder's next rung).

    Shape is bigram_logprob's with a wider key: trigram extraction is
    the SAME single doc-partitioned window pass (two lead() offsets, no
    self-join); corpus trigram counts and context counts are two
    map-side-combined aggregates, the second derived from the first;
    V rides along as a 1-row broadcast. Documents with fewer than 3
    tokens have no transitions: n_transitions = 0, NULL mean_logprob.
    At web scale the trigram table is the cost (O(corpus tokens) rows,
    hapax-heavy like any n-gram table) — it is born partitioned by its
    own hash key and never collected or broadcast.
    """
    from pyspark.sql import Window

    from tldr_spark.operators.index import _tokens

    t = _tokens(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        t.select(
            "doc_id",
            F.col("token").alias("w1"),
            F.lead("token", 1).over(w).alias("w2"),
            F.lead("token", 2).over(w).alias("w3"),
        )
        .filter(F.col("w3").isNotNull())
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    corpus = tri.groupBy("w1", "w2", "w3").agg(F.sum("tf").alias("c"))
    ctx = corpus.groupBy("w1", "w2").agg(F.sum("c").alias("cw"))
    vocab = t.agg(F.count_distinct("token").alias("v_vocab"))
    scored = (
        tri.join(corpus, ["w1", "w2", "w3"])
        .join(ctx, ["w1", "w2"])
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_transitions"),
            (
                F.sum(
                    F.col("tf")
                    * F.log(
                        (F.col("c") + 1).cast("double")
                        / (F.col("cw") + F.col("v_vocab"))
                    )
                )
                / F.sum("tf")
            ).alias("mean_logprob"),
        )
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_transitions", F.lit(0)).alias("n_transitions"),
            "mean_logprob",
        )
        .localCheckpoint(eager=True)
    )
    tri.unpersist()
    return out
