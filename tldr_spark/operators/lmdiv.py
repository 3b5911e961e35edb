"""Pairwise Jensen-Shannon divergence between per-group unigram
language models — the standard corpus-drift / source-mix distance
(symmetric, bounded by ln 2, no smoothing needed since the mixture
M = (P+Q)/2 is positive wherever either side is).

Spark shape: token counts collapse map-side to a vocabulary-sized
(group, token, c) frame (ONE shuffle); the pairwise term needs only
tokens present in BOTH groups — an inner equi-join on token — because
the one-sided mass has the closed form

    JSD(P,Q) = (ln 2 / 2) * (2 - sum_shared (p + q))
             + 0.5 * sum_shared [ p ln(2p/(p+q)) + q ln(2q/(p+q)) ]

(a token with q = 0 contributes 0.5 * p * ln 2, so all absent-token
terms fold into the first line via the shared probability mass). No
outer join, no dense vocabulary materialization, no broadcast of an
unbounded side; fan-out per token is (#groups on that token)^2 with
#groups a small constant (sources/languages), never corpus-sized.

Cross-engine determinism: counts and totals are exact integers; p and
q are single DOUBLE divisions of those integers, and the only
transcendental is the final ln — same IEEE sequence in DuckDB. Sums of
doubles are order-sensitive, so callers quantize (the repo convention:
round * 2^14)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def group_js_divergence(
    tokens: DataFrame,
    group_col: str = "group",
    token_col: str = "token",
) -> DataFrame:
    """(group_a, group_b, n_a, n_b, jsd) for every unordered group pair
    (group_a < group_b), from a (group, token) frame WITH multiplicity.
    Groups with zero tokens never appear. Disjoint vocabularies give
    exactly jsd = ln 2."""
    cnt = (
        tokens.groupBy(
            F.col(group_col).alias("g"), F.col(token_col).alias("tok")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("g").agg(F.sum("c").alias("n"))
    lm = cnt.join(tot, "g").select(
        "g", "tok", (F.col("c").cast("double") / F.col("n")).alias("p"), "n"
    )
    a = lm.select(
        F.col("g").alias("group_a"), "tok", F.col("p").alias("pa"), F.col("n").alias("n_a")
    )
    b = lm.select(
        F.col("g").alias("group_b"), "tok", F.col("p").alias("pb"), F.col("n").alias("n_b")
    )
    shared = (
        a.join(b, "tok")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b", "n_a", "n_b")
        .agg(
            F.sum(F.col("pa") + F.col("pb")).alias("mass"),
            F.sum(
                F.col("pa") * F.log(2.0 * F.col("pa") / (F.col("pa") + F.col("pb")))
                + F.col("pb") * F.log(2.0 * F.col("pb") / (F.col("pa") + F.col("pb")))
            ).alias("core"),
        )
    )
    # pairs with entirely disjoint vocabularies produce no shared rows;
    # recover them from the (tiny) totals frame so jsd = ln 2 appears
    pairs = (
        tot.select(F.col("g").alias("group_a"), F.col("n").alias("n_a"))
        .join(tot.select(F.col("g").alias("group_b"), F.col("n").alias("n_b")))
        .where(F.col("group_a") < F.col("group_b"))
    )
    ln2 = math.log(2.0)
    return (
        pairs.join(shared, ["group_a", "group_b", "n_a", "n_b"], "left")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            (
                F.lit(ln2 / 2.0)
                * (F.lit(2.0) - F.coalesce(F.col("mass"), F.lit(0.0)))
                + F.lit(0.5) * F.coalesce(F.col("core"), F.lit(0.0))
            ).alias("jsd"),
        )
    )
