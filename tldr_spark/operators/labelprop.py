"""Synchronous label propagation over an undirected link graph.

Generalizes the reference's iterate-to-fixpoint skeleton
(/root/reference/tldr.go:222-256) to community detection (SURVEY.md §2
"North-rule generalization operators"). Deterministic by construction:
labels initialize to vertex id; each round every vertex adopts the label
with the highest neighbor count, ties broken by the SMALLEST label — the
argmax is a single algebraic aggregate ``max(struct(cnt, -label))`` so it
partial-aggregates map-side (hub-skew safe) instead of a window sort.

Synchronous LPA can oscillate on bipartite structures, so the operator has
a hard round cap plus early exit when no label changes; per-round lineage
truncation via localCheckpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class LabelPropResult:
    labels: DataFrame  # (id: long, label: long)
    rounds: int
    converged: bool


def label_propagation(
    edges: DataFrame,
    max_rounds: int = 10,
    vertices: DataFrame | None = None,
    weight_col: str | None = None,
    checkpoint=None,
    checkpoint_every: int = 5,
) -> LabelPropResult:
    """Unweighted by default (labels counted per neighbor, duplicate edges
    collapsed); with ``weight_col`` the argmax runs over SUMMED edge
    weights per label — duplicate and reciprocal edge weights add, the
    weighted-community variant.

    ``checkpoint``: an :class:`tldr_spark.plans.checkpoint.IterativeCheckpoint`
    — the label vector is durably snapshotted every ``checkpoint_every``-th
    round (and at convergence) and a restarted call resumes from the newest
    committed round; same commit protocol as the PageRank and
    connected-components loops."""
    if weight_col is not None:
        e = (
            edges.select(
                F.col("src").cast("long").alias("u"),
                F.col("dst").cast("long").alias("v"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .filter(F.col("u") != F.col("v"))
        )
        sym = (
            e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w"))
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
            .persist()
        )
    else:
        e = (
            edges.select(F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()

    verts = sym.select(F.col("u").alias("id")).distinct()
    if vertices is not None:
        verts = verts.union(
            vertices.select(F.col(vertices.columns[0]).cast("long").alias("id"))
        ).distinct()

    rounds, converged = 0, False
    resumed = checkpoint.latest() if checkpoint else None
    if resumed:
        rounds, labels, last_m = resumed
        labels = labels.localCheckpoint(eager=True)
        if last_m.get("n_changed") == 0:
            sym.unpersist()
            return LabelPropResult(labels, rounds, True)
    else:
        labels = verts.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
    while rounds < max_rounds:
        rounds += 1
        if weight_col is not None:
            msgs = sym.join(labels, sym["v"] == labels["id"]).select(
                sym["u"], labels["label"], sym["w"]
            )
            counts = msgs.groupBy("u", "label").agg(F.sum("w").alias("cnt"))
        else:
            msgs = sym.join(labels, sym["v"] == labels["id"]).select(sym["u"], labels["label"])
            counts = msgs.groupBy("u", "label").agg(F.count(F.lit(1)).alias("cnt"))
        # argmax(cnt) with min-label tie-break, as one algebraic aggregate
        best = counts.groupBy("u").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("s")
        ).select(F.col("u").alias("id"), (-F.col("s.nl")).alias("new_label"))
        new_labels = (
            labels.join(best, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            converged = True
        if checkpoint and (rounds % checkpoint_every == 0 or converged):
            labels = checkpoint.save(rounds, labels, {"n_changed": n_changed})
        if converged:
            break

    sym.unpersist()
    return LabelPropResult(labels, rounds, converged)
