"""Deterministic random walks over the edge table — the corpus generator
for graph-embedding training (DeepWalk/node2vec's input stage).

Determinism instead of an RNG: step t of walk (start, k) moves to the
neighbor ranked ``1 + H(start,k,t) mod outdeg(cur)`` where H is the first
32 bits of md5 over 'start-k-t' and neighbors are ranked by dst within each
src. The walk distribution is uniform-per-step like the classic sampler,
but every engine — Spark, the SQL oracle, a NumPy reference — reproduces
the identical walk table bit-for-bit, which is what makes a 10^12-edge walk
corpus auditable.

Shape per step: one join of the frontier against the ranked adjacency
(equi-join on (vertex, rank) — no skew beyond the adjacency's own, since
each walk row matches exactly one edge row). Walks ending on a dangling
vertex terminate early, as in the reference samplers. Lineage truncated per
step.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def _hash32(*cols) -> "F.Column":
    # first 8 md5 hex chars as a non-negative int — identical in DuckDB via
    # CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)
    return F.conv(F.substring(F.md5(F.concat_ws("-", *cols)), 1, 8), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 2,
    starts: DataFrame | None = None,
) -> DataFrame:
    """(start, walk, step, vertex): step 0 is the start vertex; walks stop
    early at vertices with no out-edges. ``starts``: optional (id) DataFrame
    (default: every vertex with at least one out-edge)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("dst")
    adj = e.select("src", "dst", F.row_number().over(w).alias("rn")).persist()
    deg = adj.groupBy("src").agg(F.max("rn").alias("outdeg")).persist()
    adj.count()

    if starts is None:
        starts = deg.select(F.col("src").alias("id"))
    ks = F.explode(F.array(*[F.lit(k) for k in range(walks_per_vertex)])).alias("walk")
    # eagerly checkpointed like every later frame: the returned union must
    # not lazily depend on adj/deg after they are unpersisted below
    state = (
        starts.select(F.col("id").cast("long").alias("start"), ks)
        .select("start", "walk", F.lit(0).alias("step"), F.col("start").alias("vertex"))
        .localCheckpoint(eager=True)
    )

    degj = deg.select(F.col("src").alias("dv"), "outdeg")
    adjj = adj.select(F.col("src").alias("av"), F.col("dst").alias("nxt"), "rn")
    frames = [state]
    for _ in range(walk_length):
        nxt = (
            state.join(degj, state["vertex"] == degj["dv"])
            .withColumn(
                "pick", F.lit(1) + F.pmod(_hash32("start", "walk", "step"), F.col("outdeg"))
            )
            .join(
                adjj,
                (F.col("vertex") == adjj["av"]) & (F.col("pick") == adjj["rn"]),
            )
            .select(
                "start",
                "walk",
                (F.col("step") + 1).alias("step"),
                F.col("nxt").alias("vertex"),
            )
            .localCheckpoint(eager=True)
        )
        frames.append(nxt)
        state = nxt
        if nxt.isEmpty():
            break

    out = reduce(DataFrame.unionByName, frames)
    adj.unpersist()
    deg.unpersist()
    return out
