"""Multiscale backbone extraction: the disparity filter of Serrano,
Boguñá & Vespignani ("Extracting the multiscale backbone of complex
weighted networks", PNAS 106(16), 2009).

For a vertex of (out-)degree k and strength s, a uniformly random split
of s into k weights gives each normalized weight p = w/s the null
distribution P(x > p) = (1 - p)^(k-1). An edge is SIGNIFICANT at level
``alpha_max`` when its observed p is improbably large under that null:

    alpha(src, dst) = (1 - w/s)^(k-1)  <  alpha_max

Degree-1 vertices carry their whole strength on one edge (p = 1 by
construction), so their edge gets alpha = 1 and is never significant —
the convention of the paper's footnote (such edges carry no multiscale
information).

Web-graph use: a 100-TB crawl's host graph is dense with boilerplate
links; the disparity filter keeps each host's statistically dominant
out-links at EVERY strength scale (unlike a global weight threshold,
which erases all structure below the cut). Reference semantics scope:
the tldr reference exposes edge-threshold filtering only as a global
weight cut (didasy/tldr summarize.go:199 `threshold`); this operator is
the scale-aware generalization a web-scale pipeline needs.

Plan shape (fully JVM-side, two shuffles total):
  1. groupBy(src, dst) SUM(weight)        — multi-edge collapse
  2. groupBy(src) count/sum               — per-vertex k, s
  3. join back on src                     — both sides already
     hash-partitioned by src from their aggregates, so AQE plans this
     without a third full exchange of the big side
No UDFs, no windows over unbounded frames; `pow` is whole-stage-codegen.
At 100 TB the only wide ops are the two aggregates, both map-side
combinable; skewed hub sources are bounded because the per-src group is
(k, s) scalars, never a collected list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def disparity_filter(edges: DataFrame, alpha_max: float | None = 0.05) -> DataFrame:
    """(src, dst, w, k, alpha) for every collapsed out-edge; filtered to
    alpha < ``alpha_max`` when given (pass ``None`` for the full scored
    table). ``w`` is the summed multi-edge weight, ``k`` the source's
    collapsed out-degree, ``alpha`` the disparity p-value above."""
    w = (
        edges.select("src", "dst", "weight")
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    st = w.groupBy("src").agg(
        F.count(F.lit(1)).alias("k"), F.sum("w").alias("s")
    )
    scored = w.join(st, "src").select(
        "src",
        "dst",
        "w",
        "k",
        F.when(F.col("k") == 1, F.lit(1.0))
        .otherwise(F.pow(F.lit(1.0) - F.col("w") / F.col("s"), F.col("k") - 1))
        .alias("alpha"),
    )
    if alpha_max is not None:
        scored = scored.filter(F.col("alpha") < F.lit(float(alpha_max)))
    return scored
