"""LSA top singular component via distributed power iteration.

The doc-term count matrix A (docs x terms, entries = integer tf) has
its dominant singular pair found by power iteration on the Gram matrix:

    v_0 = 1/sqrt(|T|) * ones;   repeat K times:
    u = A v          (per-doc projection)
    w = A^T u        (per-term back-projection)
    v = w / ||w||_2  (normalize)

After K rounds, u is the (unnormalized) dominant left singular vector —
the "principal topic" axis of the corpus; per-document scores u_d are
the LSA/topic-strength coordinate (Deerwester et al. 1990), and
per-term loadings v_t rank the vocabulary along it.

Spark shape, per iteration: TWO map-side-combined aggregates (one
shuffle each — groupBy doc, groupBy token), both joins co-keyed with
the term-count table; the normalizer rides as a 1-row broadcast frame
(crossJoin), never a changing literal, so whole-stage codegen compiles
once across all K rounds — the identical discipline to the PageRank
loop, with per-round lazy localCheckpoint lineage truncation. No
entry of the iteration is collected; driver traffic is zero rows.

Determinism: A's entries are integers and v starts uniform; the only
float nondeterminism is summation order inside the aggregates (ulp-
level), absorbed by the driver query's 2^-14 output quantization —
the same argument the fixed-iteration PageRank oracles rely on at
2^-20 over 150 rounds.

Reference semantics scope: didasy/tldr ranks sentences by graph
centrality, not spectral decomposition; LSA is part of this engine's
retrieval/embedding layer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class LsaResult:
    doc_scores: DataFrame     # (doc_id, score) — u, final iteration
    term_loadings: DataFrame  # (token, loading) — v (unit L2), final
    iterations: int


def lsa_top_component(
    docs: DataFrame,
    iterations: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> LsaResult:
    if iterations < 1:
        raise ValueError(f"iterations must be positive, got {iterations}")
    from tldr_spark.operators.tfidf import _term_counts

    tc = (
        _term_counts(docs, id_col, text_col)
        .select("doc_id", "token", F.col("tf").cast("double").alias("tf"))
        .localCheckpoint(eager=True)
    )
    nt = tc.select("token").distinct().count()
    if nt == 0:
        spark = docs.sparkSession
        return LsaResult(
            spark.createDataFrame([], "doc_id long, score double"),
            spark.createDataFrame([], "token string, loading double"),
            0,
        )
    import math

    # math.sqrt = IEEE-754 sqrt, bit-identical to SQL SQRT (x**0.5 would
    # route through pow(), which is not guaranteed correctly rounded)
    v = tc.select("token").distinct().select(
        "token", F.lit(1.0 / math.sqrt(float(nt))).alias("v")
    )
    u = None
    for _ in range(iterations):
        u = (
            tc.join(v, "token")
            .groupBy("doc_id")
            .agg(F.sum(F.col("tf") * F.col("v")).alias("u"))
        )
        w = (
            tc.join(u, "doc_id")
            .groupBy("token")
            .agg(F.sum(F.col("tf") * F.col("u")).alias("w"))
        )
        norm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("_n"))
        v = (
            w.crossJoin(F.broadcast(norm))
            .select("token", (F.col("w") / F.col("_n")).alias("v"))
            .localCheckpoint(eager=False)
        )
    return LsaResult(
        u.select("doc_id", F.col("u").alias("score")),
        v.select("token", F.col("v").alias("loading")),
        iterations,
    )
