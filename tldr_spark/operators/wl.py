"""Weisfeiler-Leman (1-WL) color refinement — structural role classes.

Iterated neighborhood-signature partitioning: all vertices start in one
color class; each round a vertex's new color is determined by the pair
(own color, SORTED multiset of neighbor colors), and classes are
renamed canonically to the MINIMUM member vertex id. After k rounds two
vertices share a color iff their k-hop unfolded neighborhoods are
1-WL-indistinguishable — the standard structural-role / graph-kernel
primitive (Shervashidze et al., JMLR'11 WL kernels). Link-graph use:
grouping pages by link-structure role (hub shapes, leaf templates,
navigation spines) independent of identity — e.g. template detection
across mirrored sites.

Determinism: signatures are exact sorted arrays and the class
representative is a MIN aggregate, so the refinement is independent of
partitioning and engine (the DuckDB oracle runs the identical
unrolled rounds with LIST(... ORDER BY) signatures).

Scale shape per round: ONE edge join against the V-row color frame, a
groupBy(vertex) building the sorted signature (shuffle volume = E color
ids — same as any edge aggregate), then a groupBy(signature) whose key
width is the vertex degree. Hub vertices make wide keys: at web scale
pass ``hash_signatures=True`` to fold each signature to a 64-bit
xxhash64 first (engine-internal; collision-safe whp) — the exact-array
default is what the cross-engine oracle compares.

Reference parity note: the reference (didasy/tldr) has no structural
equivalence operator; this extends the §2.7 iteration skeleton with the
partition-refinement family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wl_colors(
    edges: DataFrame, rounds: int = 3, hash_signatures: bool = False
) -> DataFrame:
    """(id, color) — 1-WL color classes of the undirected simple graph
    of ``edges`` after ``rounds`` refinement rounds; color = minimum
    vertex id of the class."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(
            F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    col = sym.select(F.col("u").alias("id")).distinct().select(
        "id", F.lit(0).cast("long").alias("color")
    )
    for _ in range(rounds):
        ns = (
            sym.join(col.select(F.col("id").alias("v"), "color"), "v")
            .groupBy("u")
            .agg(F.sort_array(F.collect_list("color")).alias("ns"))
            .withColumnRenamed("u", "id")
        )
        sigs = col.join(ns, "id")  # sym has no isolated vertices — inner is total
        if hash_signatures:
            sigs = sigs.select(
                "id", F.xxhash64("color", F.to_json(F.col("ns"))).alias("sig")
            )
            reps = sigs.groupBy("sig").agg(F.min("id").alias("rep"))
            col = sigs.join(reps, "sig").select("id", F.col("rep").alias("color"))
        else:
            reps = sigs.groupBy("color", "ns").agg(F.min("id").alias("rep"))
            col = sigs.join(reps, ["color", "ns"]).select(
                "id", F.col("rep").alias("color")
            )
        col = col.localCheckpoint(eager=True)
    sym.unpersist()
    return col
