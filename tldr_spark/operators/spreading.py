"""Seeded label spreading — semi-supervised class propagation with
clamped seeds.

The semi-supervised cousin of community LPA (operators/labelprop.py):
instead of every vertex starting in its own community, a small labeled
SEED set carries class labels (spam/ham, topic ids, language families),
and labels diffuse synchronously outward:

    cls_0(v)     = seed class     v ∈ seeds, else ⊥ (unlabeled)
    cls_{k+1}(v) = seed class                       v ∈ seeds (clamped)
                 = argmax count of neighbour classes (ties → smallest
                   class id), over neighbours labeled at round k
                 = cls_k(v)       if no labeled neighbour yet

After K rounds every vertex within K hops of a seed holds a class; the
rest stay unlabeled (omitted from the output). Deterministic: the
argmax is the same (count, −class) algebraic aggregate LPA uses, so the
result is partition-order independent and identical to the unrolled SQL
oracle and the python mirror.

Scale shape: identical to one LPA round — ONE edge join against the
V-row label frame + one (u, cls) partial-aggregated count + one
per-vertex max-struct aggregate, K rounds, lineage truncated per round.
Seeds ride as two V-row columns, never a driver structure.

Reference parity note: the reference (didasy/tldr) has no
semi-supervised propagation; this extends the §2.7 iteration skeleton
with the clamped-boundary label-diffusion family (the discrete cousin
of hitting.py's absorbing value iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def seeded_label_spreading(
    edges: DataFrame, seeds: DataFrame, iterations: int = 8
) -> DataFrame:
    """(id, cls) for every vertex of the undirected simple graph of
    ``edges`` labeled within ``iterations`` synchronous rounds.
    ``seeds`` needs (id, cls) columns; duplicate seed rows collapse to
    their MINIMUM class; seeds outside the graph are ignored."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    sd = (
        seeds.select(F.col("id").cast("long"), F.col("cls").cast("long"))
        .groupBy("id")
        .agg(F.min("cls").alias("seed_cls"))
    )
    verts = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .join(sd, "id", "left")
        .persist()
    )  # (id, seed_cls nullable)
    cur = verts.select("id", F.col("seed_cls").alias("cls"))
    for _ in range(iterations):
        msgs = (
            sym.join(
                cur.filter(F.col("cls").isNotNull()).select(
                    F.col("id").alias("v"), "cls"
                ),
                "v",
            )
            .groupBy("u", "cls")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = (
            msgs.groupBy("u")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("cls")).alias("nc"))).alias("s"))
            .select(F.col("u").alias("id"), (-F.col("s.nc")).alias("bcls"))
        )
        cur = (
            verts.join(cur.select("id", F.col("cls").alias("prev")), "id", "left")
            .join(best, "id", "left")
            .select(
                "id",
                F.coalesce("seed_cls", "bcls", "prev").alias("cls"),
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    verts.unpersist()
    return cur.filter(F.col("cls").isNotNull())
