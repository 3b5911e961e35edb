"""Group diversity indices — Shannon entropy H = -Σ p·ln p, its
normalized form H/ln(categories), and Simpson's index 1 - Σ p² — the
corpus-mix health numbers ("how language-diverse is each source?") a
curation dashboard tracks per snapshot.

One (group, category) count shuffle + one group-keyed aggregate; p is an
exact integer ratio (count/total) so the only float ops are the final
ln/×, identical IEEE sequences per row cross-engine. Single-category
groups get H = 0 and NULL normalized entropy (ln 1 = 0 denominator), the
convention that distinguishes "no diversity" from "undefined"."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_diversity(
    df: DataFrame, group_col: str, cat_col: str
) -> DataFrame:
    """(group, n_rows, n_cats, shannon, shannon_norm, simpson). NULL
    category rows are excluded (a missing label is not a category)."""
    cnt = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(group_col, cat_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy(group_col).agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("k")
    )
    p = F.col("c").cast("double") / F.col("n")
    per = cnt.join(tot, group_col).select(
        group_col,
        "n",
        "k",
        (-p * F.log(p)).alias("h_term"),
        (p * p).alias("s_term"),
    )
    return per.groupBy(group_col).agg(
        F.max("n").cast("long").alias("n_rows"),
        F.max("k").cast("long").alias("n_cats"),
        F.sum("h_term").alias("shannon"),
        F.when(
            F.max("k") > 1, F.sum("h_term") / F.log(F.max("k").cast("double"))
        ).alias("shannon_norm"),
        (F.lit(1.0) - F.sum("s_term")).alias("simpson"),
    )
