"""Simplified (centroid-based) silhouette over a labeled embedding table.

The classic silhouette is O(N²) pairwise distances; the SIMPLIFIED
silhouette (Hruschka, de Castro & Campello, ICDM'04 — the form every
large-scale library ships, e.g. Spark MLlib's ClusteringEvaluator)
replaces mean-distance-to-group with distance-to-group-CENTROID:

    a(i) = ||x_i - c_own||        b(i) = min over other groups ||x_i - c_g||
    s(i) = (b - a) / max(a, b)    (0 when a = b = 0)

cost O(N·k·d) with k = |labels| — embarrassingly parallel, no pairwise
term anywhere. Used here on the ground-truth ``label`` column it audits
how separated the labeled clusters are IN EMBEDDING SPACE (a low label
silhouette means the embedding does not support the labels — the check
a training pipeline runs before trusting labels for hard-negative
mining or stratified sampling).

Scale shape: centroids are ONE posexplode + (label, dim) aggregate
(k·d output rows — tiny), re-assembled into k dense arrays and
BROADCAST; per-point scores are a single N·k-row pass of vectorized
JVM array math (zip_with + aggregate — no Python, no UDF); the final
per-label mean is one map-side-combined aggregate. Nothing driver-side,
nothing O(N²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def label_silhouette(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(label, n_points, mean_silhouette) — per-label mean simplified
    silhouette. With a single label there is no "other" centroid:
    mean_silhouette is NULL (the metric is undefined, not zero)."""
    pts = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    cent = pts.groupBy("label", "pos").agg(
        F.avg(F.col("x").cast("double")).alias("c")
    )
    cents = cent.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    d = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("label"),
            F.col(vec_col).alias("vec"),
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "label",
            "clabel",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        "vec",
                        "cvec",
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("dist"),
        )
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dist"))).alias("b"),
    )
    sil = ab.select(
        "label",
        F.when(F.col("b").isNull(), F.lit(None).cast("double"))
        .when(F.greatest("a", "b") == 0, F.lit(0.0))
        .otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
        .alias("s"),
    )
    return sil.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.avg("s").alias("mean_silhouette"),
    )
