"""Distributed minimum spanning forest — Borůvka hook-and-contract.

The classic O(log V)-round distributed MSF: every round, each component
picks its minimum-weight outgoing edge (cut property ⇒ that edge is in
the MSF), components hook along the chosen edges, and pointer jumping
contracts the hook forest to new component labels. With weights made
TOTALLY ordered by the (w, a, b) lexicographic key, the forest is
unique, so Spark, the pure-python Kruskal mirror in the tests, and the
DuckDB cycle-property oracle (edge ∈ MSF ⇔ its endpoints are NOT
connected by strictly-lighter edges) all produce the identical edge set.
Default weights are the same Lehmer/MINSTD hash the matching and
sampling operators use (operators/matching.py:edge_priority) — bounded
integer arithmetic shared bit-for-bit with the oracle's SQL fragment.
Link-graph use: skeletonizing a host/domain graph down to V−1 edges for
visualization, hierarchical clustering (single-linkage = MSF), and
cheapest-backbone selection over crawl-cost-weighted edges.

Per-round shape at scale: the E-row canonical edge set joins the V-row
label frame twice (broadcast-or-shuffle, AQE decides), cross edges
partial-aggregate map-side into one min-struct per component (≤V rows,
halving every round — Borůvka guarantees #components at least halves),
hook-cycle breaking is a self-join of the ≤C-row hook frame, and
pointer jumping runs O(log depth) self-joins over ≤C rows. No step
materializes anything larger than E; lineage is truncated per round
with eager localCheckpoints.

Why the 2-cycle break suffices: in the hook functional graph each
component points along its min incident cross edge; around any cycle
the hook weights are non-increasing (each hop's edge is incident to the
next component, bounding its min), so all are equal — impossible under
a total order unless every hop uses the SAME edge, i.e. the cycle has
length 2. Keeping the smaller label as root breaks exactly those.

Reference parity note: the reference (didasy/tldr) has no spanning-tree
operator; this extends the §2.7 iteration skeleton with the
hook-and-contract family (as components.py does for small-star/
large-star CC).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from tldr_spark.operators.matching import edge_priority


@dataclass
class MSFResult:
    edges: DataFrame  # (a: long, b: long, w: long, boruvka_round: int), a < b
    rounds: int       # Borůvka rounds executed (≤ ceil(log2 V))


def _pointer_jump(p: DataFrame) -> DataFrame:
    """Collapse the hook forest: parent := parent(parent) until fixpoint.
    O(log depth) iterations; the frame is ≤ C rows (components this
    round), so the convergence count() is a cheap partial aggregate."""
    while True:
        g = p.select(F.col("c").alias("gc"), F.col("parent").alias("gp"))
        j = (
            p.join(g, p["parent"] == g["gc"])
            .select("c", F.col("gp").alias("parent"), (F.col("parent") != F.col("gp")).alias("moved"))
            .localCheckpoint(eager=True)
        )
        moved = j.filter("moved").limit(1).count()
        p = j.select("c", "parent")
        if moved == 0:
            return p


def minimum_spanning_forest(
    edges: DataFrame, max_rounds: int = 40, weight_col: str | None = None
) -> MSFResult:
    """Unique minimum spanning forest of the undirected simple graph of
    ``edges`` (direction/multiplicity ignored, self-loops dropped), under
    the total edge order (w, a, b). With ``weight_col`` the real weights
    are used (parallel/reversed duplicates collapse to their MINIMUM —
    the cheapest realization of the link); otherwise w is the
    deterministic Lehmer hash edge_priority(a, b). Ties on w are broken
    by (a, b), so the forest is unique either way. Deterministic: same
    edge set ⇒ same forest AND same per-edge boruvka_round, on any
    partitioning (round membership depends only on the component
    partition, never on label representatives)."""
    s, d = F.col("src").cast("long"), F.col("dst").cast("long")
    base = edges.select(
        F.least(s, d).alias("a"), F.greatest(s, d).alias("b"), "*"
    ).filter(F.col("a") != F.col("b"))
    if weight_col is not None:
        ce = (
            base.groupBy("a", "b")
            .agg(F.min(F.col(weight_col).cast("double")).alias("w"))
            .persist()
        )
        w_type = "double"
    else:
        ce = (
            base.select("a", "b")
            .distinct()
            .withColumn("w", edge_priority(F.col("a"), F.col("b")))
            .persist()
        )
        w_type = "long"
    spark = edges.sparkSession
    forest = spark.createDataFrame(
        [], f"a long, b long, w {w_type}, boruvka_round int"
    )
    labels = (
        ce.select(F.col("a").alias("v"))
        .union(ce.select("b"))
        .distinct()
        .withColumn("lbl", F.col("v"))
        .persist()
    )

    def cross_edges(lbls: DataFrame) -> DataFrame:
        la = lbls.select(F.col("v").alias("a"), F.col("lbl").alias("la"))
        lb = lbls.select(F.col("v").alias("b"), F.col("lbl").alias("lb"))
        return (
            ce.join(la, "a").join(lb, "b").filter(F.col("la") != F.col("lb"))
        )

    cross = cross_edges(labels).persist()
    rounds = 0
    while not cross.isEmpty():
        if rounds >= max_rounds:
            raise RuntimeError(f"MSF did not finish in {max_rounds} rounds")
        rounds += 1
        # each component's minimum outgoing edge under the (w, a, b) order;
        # t = the component on the other side (never a tie-break field)
        inc = cross.selectExpr("la AS c", "struct(w, a, b, lb AS t) AS k").union(
            cross.selectExpr("lb AS c", "struct(w, a, b, la AS t) AS k")
        )
        chosen = inc.groupBy("c").agg(F.min("k").alias("k")).localCheckpoint(eager=True)
        picked = (
            chosen.select(F.col("k.a").alias("a"), F.col("k.b").alias("b"), F.col("k.w").alias("w"))
            .distinct()  # a mutual-min edge is chosen by both its components
        )
        forest = forest.union(
            picked.withColumn("boruvka_round", F.lit(rounds).cast("int"))
        ).localCheckpoint(eager=True)
        # hook c → t, breaking the (only possible) 2-cycles toward the
        # smaller label so the result is a forest
        hooks = chosen.select("c", F.col("k.t").alias("t"))
        back = hooks.select(F.col("c").alias("bc"), F.col("t").alias("bt"))
        p = (
            hooks.join(back, hooks["t"] == back["bc"], "left")
            .select(
                "c",
                F.when(
                    (F.col("bt") == F.col("c")) & (F.col("c") < F.col("t")), F.col("c")
                )
                .otherwise(F.col("t"))
                .alias("parent"),
            )
        )
        roots = _pointer_jump(p.localCheckpoint(eager=True))
        # relabel: components with no cross edge this round keep their label
        relab = roots.select(F.col("c").alias("lbl"), F.col("parent").alias("newlbl"))
        nxt = (
            labels.join(relab, "lbl", "left")
            .select("v", F.coalesce("newlbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        labels.unpersist()
        labels = nxt.persist()
        cross.unpersist()
        cross = cross_edges(labels).persist()
    cross.unpersist()
    labels.unpersist()
    ce.unpersist()
    return MSFResult(forest, rounds)
