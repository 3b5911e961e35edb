"""Strongly connected components — the bow-tie decomposition primitive of
web-graph analysis (Broder et al., WWW'00).

Coloring algorithm (Orzan 2004, as used in distributed SCC systems):

  1. forward MAX-color propagation to fixpoint over the remaining
     subgraph: every vertex's color becomes the largest vertex id that
     reaches it
  2. vertices with color == own id are roots; the SCC of root r is the set
     of vertices with color r that reach r BACKWARD through vertices of the
     same color — collected by a backward flood seeded at the roots
  3. peel those SCCs off and repeat on the remainder

Every pass settles at least the root SCC of every color class, so the
outer loop runs few passes on web graphs (most mass sits in one giant SCC
+ singletons). Inner floods are O(diameter-of-SCC-subgraph) rounds of one
join + max-aggregate each — the same per-round shape as PageRank, lineage
truncated per round. Component labels are normalized to the SCC's MIN
vertex id (deterministic, orientation-free).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class SccResult:
    assignments: DataFrame  # (id: long, component: long) component = min id in SCC
    passes: int


def _propagate_max(er: DataFrame, color: DataFrame) -> DataFrame:
    """Fixpoint of color(v) = max(color(v), max color over in-neighbors)
    following src→dst edges. Returns (id, color)."""
    color = color.persist()
    color.count()
    while True:
        upd = (
            color.join(er, color["id"] == er["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.max("color").alias("in_color"))
        )
        # missing in-neighbor aggregate is a NO-OP (coalesce to own color),
        # not a -1 sentinel: a sentinel would clamp negative vertex ids'
        # colors up to -1 and corrupt components for the hashed-64-bit id
        # domain where negatives are legal
        new = (
            color.join(upd, "id", "left")
            .select(
                "id",
                F.greatest(F.col("color"), F.coalesce("in_color", F.col("color"))).alias("color"),
                (F.col("in_color").isNotNull() & (F.col("in_color") > F.col("color"))).alias("chg"),
            )
            .localCheckpoint(eager=False)
            .persist()
        )
        n_chg = new.filter("chg").count()
        color.unpersist()
        color = new.drop("chg")
        if n_chg == 0:
            return color


def strongly_connected_components(edges: DataFrame, max_passes: int = 100) -> SccResult:
    """(id, component): component = min vertex id of the SCC. Vertices in
    no cycle are singleton components (their own id)."""
    spark = edges.sparkSession
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    e.count()
    remaining = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )

    # per-pass member frames accumulate in a list and union ONCE after the
    # loop — unioning into a growing eagerly-checkpointed frame would
    # re-materialize all previously assigned rows every pass (O(P·V))
    member_frames: list[DataFrame] = []
    passes = 0
    while passes < max_passes and not remaining.isEmpty():
        passes += 1
        er = (
            e.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        color = _propagate_max(er, remaining.select("id", F.col("id").alias("color")))

        # backward flood from roots within each color class: member(v) iff
        # color(v) = c and v reaches root c via same-colored vertices
        cl = color.persist()
        member = cl.filter(F.col("id") == F.col("color")).select("id", F.col("color").alias("root")).persist()
        member.count()
        frontier = member
        while True:
            step = (
                frontier.join(er, frontier["id"] == er["dst"])
                .select(F.col("src").alias("id"), "root")
                .distinct()
                .join(cl, "id")
                .filter(F.col("color") == F.col("root"))
                .select("id", "root")
                .join(member, "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if step.isEmpty():
                break
            nm = member.union(step).localCheckpoint(eager=False).persist()
            nm.count()
            member.unpersist()
            member = nm
            frontier = step

        member_frames.append(member)  # stays materialized for the final union
        new_remaining = remaining.join(member.select("id"), "id", "left_anti").localCheckpoint(eager=False).persist()
        new_remaining.count()
        remaining.unpersist()
        cl.unpersist()
        remaining = new_remaining

    if not remaining.isEmpty():
        n_left = remaining.count()
        raise RuntimeError(
            f"SCC did not settle within max_passes={max_passes}: {n_left} vertices "
            "unassigned. Pathological long-chain graphs peel O(1) roots per pass — "
            "raise max_passes for such inputs."
        )

    if member_frames:
        from functools import reduce

        assigned = reduce(DataFrame.union, member_frames)
    else:
        assigned = spark.createDataFrame([], "id long, root long")
    # normalize: component label = min member id per root group
    mins = assigned.groupBy("root").agg(F.min("id").alias("component"))
    out = assigned.join(mins, "root").select("id", "component").localCheckpoint(eager=True)
    for m in member_frames:
        m.unpersist()
    e.unpersist()
    remaining.unpersist()
    return SccResult(out, passes)
