"""Link-prediction training-set builder — the graph-ML counterpart of
the corpus pipeline: emit labeled (vertex pair, structural features)
examples with deterministic hash-based NEGATIVE SAMPLING (the standard
1:k positive:negative recipe for training link predictors / GNN edge
decoders).

Negatives are drawn WITHOUT randomness: vertex ids get dense positions
via the range-partitioned global prefix-sum (fusion.rank_positions — no
single-partition window), and candidate j for vertex a is the vertex at
position ((pos_a - 1) * 2654435761 + j * 1000003) mod n, + 1 — pure
integer arithmetic any engine reproduces. Candidates that collide with
a real edge (either orientation) or with self are anti-joined away, so
label-0 rows are true non-edges; canonicalized (a < b) and deduplicated.

Features: common-neighbor count (the join that link predictors start
from) and endpoint degrees — computed for positives and negatives by
the same pair-restricted adjacency join (cost ~ sum of candidate-pair
neighborhoods, never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M1 = 2654435761
_M2 = 1000003


def link_prediction_dataset(
    edges: DataFrame,
    neg_per_vertex: int = 2,
) -> DataFrame:
    """(id_a, id_b, label, cn, deg_a, deg_b): every undirected edge as a
    label-1 row plus up to ``neg_per_vertex`` hash-sampled true
    non-edges per vertex as label-0 rows."""
    from tldr_spark.operators.fusion import rank_positions

    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("a"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias("b"),
        )
        .distinct()
        .persist()
    )
    verts = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .distinct()
    )
    pos_tab = rank_positions(verts.select("id", F.lit(0).alias("s")), "s", "id").persist()
    n = pos_tab.count()
    if n == 0:
        und.unpersist()
        pos_tab.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "id_a long, id_b long, label int, cn long, deg_a long, deg_b long"
        )
    j = F.explode(F.sequence(F.lit(1), F.lit(neg_per_vertex))).alias("j")
    cand_pos = (
        pos_tab.select(F.col("id").alias("id_a"), F.col("pos").alias("pa"), j)
        .select(
            "id_a",
            (((F.col("pa") - 1) * _M1 + F.col("j") * _M2) % n + 1).alias("nbpos"),
        )
    )
    cand = (
        cand_pos.join(
            pos_tab.select(F.col("id").alias("id_b"), F.col("pos").alias("nbpos")),
            "nbpos",
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
        )
        .distinct()
        .join(und, ["a", "b"], "left_anti")
    )
    pairs = und.select("a", "b", F.lit(1).alias("label")).union(
        cand.select("a", "b", F.lit(0).alias("label"))
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("u")).union(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    na = adj.select(F.col("v").alias("a"), F.col("u").alias("w"))
    nb = adj.select(F.col("v").alias("b"), F.col("u").alias("w"))
    cn = (
        pairs.select("a", "b")
        .join(na, "a")
        .join(nb, ["b", "w"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    deg = adj.groupBy(F.col("v")).agg(F.count(F.lit(1)).alias("deg"))
    out = (
        pairs.join(cn, ["a", "b"], "left")
        .join(deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            F.col("a").alias("id_a"),
            F.col("b").alias("id_b"),
            "label",
            F.coalesce("cn", F.lit(0)).alias("cn"),
            "deg_a",
            "deg_b",
        )
    )
    und.unpersist()
    pos_tab.unpersist()
    return out
