"""Bipartite butterfly counting — the bipartite analogue of triangle
counting (Sanei-Mehri et al., KDD'18): a butterfly is a complete 2x2
biclique (two users sharing two items), THE clustering primitive for
user-item / doc-term bipartite graphs where triangles cannot exist.

  butterflies = sum over user pairs (u1, u2) of C(co_items, 2)
  caterpillars (3-paths) = sum over edges (u, i) of (deg u - 1)(deg i - 1)
  bipartite clustering coefficient = 4 * butterflies / caterpillars

All integer arithmetic; the only ratio is quantized at the output.

Scale shape: co-item counts come from the item-keyed wedge join — the
same df^2-per-hot-key concern as every pair join, so the wedge join is
performed from the SMALLER side's perspective and a ``max_degree``
prune (documented estimator bias: dropped hubs are reported) caps the
fan-out; caterpillars are a pure degree-product aggregate (one edge
join against two degree frames, no pair materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def butterfly_stats(
    edges: DataFrame,
    left_col: str = "u",
    right_col: str = "i",
    max_degree: int | None = None,
) -> DataFrame:
    """1-row (n_edges, butterflies, caterpillars, bcc_q-ready bcc):
    exact when ``max_degree`` is None; with a cap, wedges through
    right-side vertices of degree > max_degree are excluded (and the
    count of excluded vertices reported as n_pruned_hubs)."""
    e = edges.select(
        F.col(left_col).alias("u"), F.col(right_col).alias("i")
    ).distinct().persist()
    du = e.groupBy("u").agg(F.count(F.lit(1)).alias("du"))
    di = e.groupBy("i").agg(F.count(F.lit(1)).alias("di"))
    if max_degree is not None:
        keep = di.filter(F.col("di") <= max_degree).select("i")
        n_pruned = di.count() - keep.count()
        wedge_src = e.join(keep, "i", "left_semi")
    else:
        n_pruned = 0
        wedge_src = e
    a = wedge_src.select(F.col("u").alias("u1"), "i")
    b = wedge_src.select(F.col("u").alias("u2"), "i")
    co = (
        a.join(b, "i")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # per-row integer div (c*(c-1) is always even) keeps the sum exact in
    # int64 — the previous double-division sum lost exactness above 2^53
    # while the module claims all-integer arithmetic and the DuckDB
    # oracle uses integer // (ADVICE r4)
    bf = co.agg(
        F.coalesce(F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0))
        .cast("long")
        .alias("butterflies")
    )
    cat = (
        e.join(du, "u")
        .join(di, "i")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.coalesce(
                F.sum((F.col("du") - 1) * (F.col("di") - 1)), F.lit(0)
            ).alias("caterpillars"),
        )
    )
    out = cat.crossJoin(F.broadcast(bf)).select(
        "n_edges",
        "butterflies",
        "caterpillars",
        F.when(
            F.col("caterpillars") > 0,
            F.lit(4.0) * F.col("butterflies") / F.col("caterpillars"),
        ).alias("bcc"),
        F.lit(n_pruned).cast("long").alias("n_pruned_hubs"),
    )
    e.unpersist()
    return out
