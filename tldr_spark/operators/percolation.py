"""Bond-percolation profile: component structure under random edge removal.

The robustness diagnostic for a crawl-derived link graph (Callaway et al.,
PRL 85:5468 (2000)): keep each edge independently with probability p and
watch the giant component — a web graph whose giant fraction collapses at
high p is held together by a thin backbone (often one hub family), while a
percolation-stable graph keeps its connectivity under crawler loss, link
rot, or spam-edge removal. Scanning a few p levels brackets the transition.

"Random" is a deterministic per-edge hash so the profile is reproducible
run-to-run and cross-engine (the DuckDB oracle computes the identical
selector): an edge is kept at level ``p`` iff

    ((src % 100003)*31 + (dst % 100003)*17) % 100 < p

— pure BIGINT arithmetic with no overflow for nonnegative ids, identical
in Spark and ANSI SQL, and monotone in p (the kept sets are nested), so
the profile is a true percolation curve, not independent resamples.

Scale shape: each level is one filter (pushed to the scan — the selector
is a deterministic column predicate) + one connected-components pass over
the SURVIVING edges only. Levels are independent jobs over shrinking
inputs; the per-level output is a single aggregate row. Nothing about the
full graph is ever materialized beyond what connected_components itself
needs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

#: modulus pair kept small so (id % 100003) * 31 never overflows int64
_M, _A, _B = 100003, 31, 17


def bond_keep(p_pct: int, src: str = "src", dst: str = "dst") -> Column:
    """Deterministic per-edge keep predicate at level ``p_pct`` (0-100)."""
    sel = ((F.col(src) % _M) * _A + (F.col(dst) % _M) * _B) % 100
    return sel < F.lit(int(p_pct))


def bond_percolation_profile(
    edges: DataFrame, keep_pcts: tuple[int, ...] = (30, 60, 90)
) -> DataFrame:
    """(keep_pct, n_vertices, n_components, giant_size) per level.

    ``n_vertices`` counts vertices touched by at least one surviving edge
    (isolated vertices have left the percolated graph); ``giant_size`` is
    the largest component's vertex count. Levels with zero surviving
    edges contribute a (p, 0, 0, 0) row.
    """
    from tldr_spark.operators.components import connected_components

    spark = edges.sparkSession
    outs = []
    for p in keep_pcts:
        sub = edges.filter(bond_keep(int(p)))
        res = connected_components(sub)
        prof = (
            res.assignments.groupBy("component")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.coalesce(F.sum("sz"), F.lit(0)).cast("long").alias("n_vertices"),
                F.count(F.lit(1)).cast("long").alias("n_components"),
                F.coalesce(F.max("sz"), F.lit(0)).cast("long").alias("giant_size"),
            )
            .select(
                F.lit(int(p)).cast("long").alias("keep_pct"),
                "n_vertices",
                "n_components",
                "giant_size",
            )
        )
        outs.append(prof)
    if not outs:
        return spark.createDataFrame(
            [], "keep_pct long, n_vertices long, n_components long, giant_size long"
        )
    return reduce(DataFrame.unionByName, outs)
