"""Trophic levels of the link graph (Levine 1980; MacKay-Johnson-Rodgers
2020 use it to measure how hierarchical a directed network is).

A page's trophic level is 1 + the weighted mean level of its in-link
sources; pages with no in-links are basal (level 1). On a web graph this
is the "crawl hierarchy depth": hubs that are only linked FROM deep
content float high, root-ish pages stay near 1, and the level spread is
a one-number hierarchy measure (flat link farms vs deep taxonomies).

Semantics here are the FIXED-ITERATION truncation (12 Jacobi rounds from
s=1): on a DAG of depth < 12 this IS the exact solution; through cycles
levels keep growing linearly with rounds, so the truncation acts as a
bounded "depth within 12 hops of evidence" — deterministic, and exactly
reproducible by the DuckDB oracle's unrolled recursion.

Cross-engine exactness: each round computes

    s'(v) = UNIT + floor( sum_in w*s / sum_in w )        (integer units)

entirely in BIGINT (weights are small integers; UNIT = 2^20), so the
two engines cannot diverge by float-summation order — the established
integer-mass-units pattern (see ppr_push).

Scale shape: per round ONE hash join (edges x levels on src, the same
key the collapsed edge table is already partitioned on) + ONE partial-
aggregated groupBy(dst) + a V-row left join — identical to the PageRank
iteration's cost envelope, linear state, no per-vertex lists. Lineage is
truncated each round with a lazy localCheckpoint.

Reference semantics scope: didasy/tldr ranks vertices by degree
centrality only (tldr.go rank loop); trophic structure is part of the
link-graph generalization this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNIT = 1 << 20


def trophic_levels(edges: DataFrame, n_iter: int = 12) -> DataFrame:
    """(vertex, level_units): trophic level after ``n_iter`` Jacobi rounds,
    in exact integer units of 2^-20 (level 1.0 == 1048576)."""
    nw = (
        edges.select("src", "dst", "weight")
        .groupBy("src", "dst")
        .agg(F.sum("weight").cast("long").alias("w"))
        .localCheckpoint(eager=False)
    )
    verts = (
        nw.select(F.col("src").alias("v"))
        .union(nw.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    s = verts.select("v", F.lit(UNIT).cast("long").alias("s"))
    for _ in range(n_iter):
        contrib = (
            nw.join(s.select(F.col("v").alias("src"), "s"), "src")
            .groupBy("dst")
            .agg(
                F.sum(F.col("w") * F.col("s")).alias("num"),
                F.sum("w").alias("den"),
            )
        )
        s = (
            verts.join(contrib, verts["v"] == contrib["dst"], "left")
            .select(
                "v",
                (
                    F.lit(UNIT)
                    + F.coalesce(F.expr("num div den"), F.lit(0))
                )
                .cast("long")
                .alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    return s.select(F.col("v").alias("vertex"), F.col("s").alias("level_units"))
