"""Distributed greedy graph coloring — Jones-Plassmann (1993) with
deterministic hash priorities, the symmetry-breaking workhorse next to
Luby MIS (operators/mis.py): color web-graph vertices so no link joins two
same-colored endpoints (conflict-free scheduling of per-vertex updates,
register allocation for hub partitions, A/B cell assignment).

Round: every uncolored vertex whose (hash, id) priority beats all its
UNCOLORED neighbors picks the minimum color unused by its already-colored
neighbors. Priorities are the same Lehmer hash as operators/sampling.py
(salt-keyed, cross-engine reproducible), so runs are bit-deterministic —
the pytest differential mirrors the whole algorithm in pure Python.

Per round: one join of the shrinking uncolored adjacency (max-neighbor-
priority aggregate), one join against the colored frame (used-color sets),
and a mex fold over each sorted color set via F.aggregate — JVM-side
array algebra, zero Python UDFs. Expected O(log n) rounds under random
priorities (Jones-Plassmann's martingale argument); web-scale state is the
V-row color frame, lineage truncated per round.

Relationship to operators/mis.py:greedy_coloring: that one colors by
ITERATED MIS (each color class is a maximal independent set of the
residual — rounds = colors × MIS-rounds, colors trend higher); this one is
the classic single-cascade JP with a mex color choice — fewer rounds and
tighter color counts on power-law graphs. Both are kept: the MIS variant
reuses the Luby machinery and emits equal-size-ish classes (useful for
balanced scheduling), this one optimizes color count.

Reference parity note: the reference (didasy/tldr) has no coloring; this
extends the MIS-style symmetry-breaking family the engine already ships.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from tldr_spark.operators.sampling import hash_bucket_ppm


@dataclass
class ColoringResult:
    colors: DataFrame  # (id: long, color: int)
    rounds: int
    n_colors: int


def jones_plassmann_coloring(
    edges: DataFrame,
    salt: int = 0,
    max_rounds: int = 500,
) -> ColoringResult:
    """(id, color) — proper coloring of the undirected simple graph via
    Jones-Plassmann; deterministic for a given ``salt``. Self-loops raise
    (no proper coloring exists). Colors are dense from 0; n_colors is
    bounded by maxdegree+1."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if e.filter(F.col("src") == F.col("dst")).limit(1).count():
        raise ValueError("self-loop: no proper coloring exists")
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .select(F.col("src").alias("v"), F.col("dst").alias("w"))
        .persist()
    )
    und.count()
    verts = und.select(F.col("v").alias("id")).distinct()
    # priority = (hash bucket, id): unique, reproducible, engine-neutral
    unc = verts.select("id", hash_bucket_ppm(F.col("id"), salt).alias("pb")).persist()
    unc.count()
    spark = edges.sparkSession
    colored = spark.createDataFrame([], "id long, color int").persist()

    rounds = 0
    done = False
    while rounds < max_rounds:
        n_unc = unc.count()
        if n_unc == 0:
            done = True
            break
        rounds += 1
        # max uncolored-neighbor priority per uncolored vertex
        nbr = (
            und.join(unc.select(F.col("id").alias("v")), "v")
            .join(
                unc.select(F.col("id").alias("w"), F.col("pb").alias("wpb")), "w"
            )
            .groupBy("v")
            .agg(F.max(F.struct(F.col("wpb"), F.col("w"))).alias("mx"))
        )
        winners = (
            unc.join(nbr, unc["id"] == nbr["v"], "left")
            .filter(
                F.col("mx").isNull()
                | (F.struct(F.col("pb"), F.col("id")) > F.col("mx"))
            )
            .select("id")
        )
        # smallest color unused by already-colored neighbors (mex fold over
        # the sorted distinct color set — JVM array algebra, no UDF)
        used = (
            winners.join(und, winners["id"] == und["v"])
            .join(
                colored.select(F.col("id").alias("w"), F.col("color").alias("nc")),
                "w",
            )
            .groupBy(winners["id"])
            .agg(F.array_sort(F.collect_set("nc")).alias("ncs"))
        )
        newly = (
            winners.join(used, "id", "left")
            .select(
                "id",
                F.aggregate(
                    F.coalesce("ncs", F.array()),
                    F.lit(0),
                    lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
                )
                .cast("int")
                .alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        new_colored = colored.union(newly).localCheckpoint(eager=False).persist()
        new_colored.count()
        colored.unpersist()
        colored = new_colored
        new_unc = (
            unc.join(newly.select("id"), "id", "left_anti")
            .localCheckpoint(eager=False)
            .persist()
        )
        new_unc.count()
        unc.unpersist()
        unc = new_unc
    if not done and unc.count() > 0:
        raise RuntimeError(f"coloring did not finish in {max_rounds} rounds")
    und.unpersist()
    unc.unpersist()
    n_colors_row = colored.agg(
        F.coalesce(F.max("color") + 1, F.lit(0)).alias("nc")
    ).collect()
    return ColoringResult(colored, rounds, int(n_colors_row[0]["nc"]))
