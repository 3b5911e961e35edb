"""MATTR — moving-average type-token ratio (Covington & McFall 2010),
the windowed lexical-diversity measure that, unlike raw TTR, does not
shrink with document length: the mean over all sliding windows of
``window`` consecutive tokens of (distinct tokens in window) / window.

The sum of per-window distinct counts is computed WITHOUT enumerating
windows: token occurrence p (1-based) with previous occurrence of the
same token at prev[p] (0 if none) is counted by window start s iff
s > prev[p] (p is the window's first occurrence) and the window covers
p. The number of such s is the length of the interval

    [ max(1, p - W + 1, prev[p] + 1) , min(p, n - W + 1) ]

so sum_distinct = sum over p of max(0, hi - lo + 1) — pure arithmetic
on the lag() of positions. Documents shorter than ``window`` use one
window of size n (TTR), the standard fallback.

Spark shape: one (doc, token)-keyed sort for the lag, one doc-keyed
aggregate. No window enumeration, no distinct-per-window blowup, no
UDFs: a 10^12-token corpus costs two shuffles of the token rows, and
per-doc work is O(tokens), not O(tokens * window)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def mattr(
    docs: DataFrame,
    window: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, eff_window, n_windows, sum_distinct, mattr):
    moving-average TTR per document. Zero-token documents drop out."""
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""
            )
        ).alias("p0", "token"),
    ).select("id", (F.col("p0") + 1).alias("p"), "token")
    prev = F.lag("p", 1, 0).over(Window.partitionBy("id", "token").orderBy("p"))
    n = F.count(F.lit(1)).over(Window.partitionBy("id"))
    marked = toks.select("id", "p", prev.alias("prev"), n.alias("n"))
    eff_w = F.least(F.lit(window), F.col("n"))
    m = F.col("n") - eff_w + 1
    lo = F.greatest(F.lit(1), F.col("p") - eff_w + 1, F.col("prev") + 1)
    hi = F.least(F.col("p"), m)
    contrib = F.greatest(hi - lo + 1, F.lit(0))
    return (
        marked.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.max("n").alias("n_tokens"),
            F.max(eff_w).alias("eff_window"),
            F.max(m).alias("n_windows"),
            F.sum(contrib).alias("sum_distinct"),
        )
        .withColumn(
            "mattr",
            F.col("sum_distinct")
            / (F.col("eff_window").cast("double") * F.col("n_windows")),
        )
    )
