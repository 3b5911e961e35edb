"""SCAN structural graph clustering (Xu et al., KDD'07) — clusters by
NEIGHBORHOOD AGREEMENT rather than modularity: two vertices are
structurally similar when their closed neighborhoods overlap,

    sigma(u,v) = (|N(u) ∩ N(v)| + 2) / sqrt((deg(u)+1) * (deg(v)+1)),

cores are vertices with >= mu epsilon-similar neighbors, clusters are
connected components of the core epsilon-graph, non-cores attach as
borders, and the remainder splits into HUBS (touching >= 2 clusters —
the brokers Louvain-family methods force into one side) vs OUTLIERS.
That hub/outlier distinction is what SCAN adds over LPA/Louvain here.

Determinism (driver-oracle grade): the epsilon test is INTEGER-EXACT —
sigma >= e_num/e_den  iff  (cn+2)^2 * e_den^2 >= e_num^2 * (da+1)*(db+1)
— no sqrt, no float boundary; cluster ids are min-vertex-id components;
border ties attach to the smallest cluster id.

Scale shape: common-neighbor counts per EXISTING edge come from the
degree-ordered oriented triangle enumeration (hub-safe, O(E^1.5) like
triangle counting — never a per-pair neighborhood join); the rest is
degree aggregates, one CC pass over the (sparse) core epsilon-graph,
and two label joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scan_clusters(
    edges: DataFrame,
    e_num: int = 7,
    e_den: int = 10,
    mu: int = 3,
) -> DataFrame:
    """(vertex, role, cluster): role in {'core','border','hub','outlier'};
    cluster = min-core-id label (NULL for hubs/outliers)."""
    from tldr_spark.operators.components import connected_components
    from tldr_spark.operators.linksim import edge_embeddedness

    if not (0 < e_num <= e_den):
        raise ValueError("epsilon must satisfy 0 < e_num/e_den <= 1")
    ee = edge_embeddedness(edges).select("a", "b", "support").persist()
    und = ee.select("a", "b")
    adj = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = adj.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    # decimal(38,0) keeps the squared-support product exact: (cn+2)^2 *
    # e_den^2 wraps int64 once support exceeds ~3e9/e_den (dense web
    # graphs), which would silently flip the filter (ADVICE r4). DuckDB
    # raises on BIGINT overflow instead of wrapping; 38-digit decimals
    # hold both sides exactly for any int64-valued support/degree.
    dec = "decimal(38,0)"
    cn2 = (F.col("support") + 2).cast(dec)
    eps = (
        ee.join(da, "a")
        .join(db, "b")
        .filter(
            cn2 * cn2 * F.lit(e_den * e_den).cast(dec)
            >= F.lit(e_num * e_num).cast(dec)
            * (F.col("da") + 1).cast(dec)
            * (F.col("db") + 1).cast(dec)
        )
        .select("a", "b")
        .persist()
    )
    eps_adj = eps.union(eps.select(F.col("b").alias("a"), F.col("a").alias("b")))
    eps_deg = eps_adj.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("eps_deg")
    )
    # closed-neighborhood count: the vertex itself is epsilon-similar to
    # itself (sigma(v,v) = 1), hence the +1
    cores = eps_deg.filter(F.col("eps_deg") + 1 >= mu).select("id").persist()
    core_eps = (
        eps.join(cores.withColumnRenamed("id", "a"), "a", "left_semi")
        .join(cores.withColumnRenamed("id", "b"), "b", "left_semi")
    )
    cc = connected_components(
        core_eps.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        vertices=cores,
    ).assignments
    core_lab = cc.select(F.col("id").alias("vertex"), F.col("component").alias("cluster"))

    # borders: non-core vertices epsilon-adjacent to a core; min cluster id
    core_side = core_lab.withColumnRenamed("vertex", "a")
    border = (
        eps_adj.join(core_side, "a")
        .join(cores.withColumnRenamed("id", "b"), "b", "left_anti")
        .groupBy(F.col("b").alias("vertex"))
        .agg(F.min("cluster").alias("cluster"))
    )

    verts = deg.select(F.col("id").alias("vertex"))
    labeled = core_lab.select("vertex", "cluster", F.lit("core").alias("role")).union(
        border.select("vertex", "cluster", F.lit("border").alias("role"))
    )
    rest = verts.join(labeled.select("vertex"), "vertex", "left_anti")
    # hub vs outlier: does the vertex's PLAIN neighborhood touch >= 2 clusters?
    lab_b = labeled.select(F.col("vertex").alias("b"), F.col("cluster").alias("nb_cluster"))
    touch = (
        adj.withColumnRenamed("a", "vertex")
        .join(rest, "vertex", "left_semi")
        .join(lab_b, "b")
        .groupBy("vertex")
        .agg(F.countDistinct("nb_cluster").alias("nclusters"))
    )
    rest_roles = rest.join(touch, "vertex", "left").select(
        "vertex",
        F.lit(None).cast("long").alias("cluster"),
        F.when(F.coalesce(F.col("nclusters"), F.lit(0)) >= 2, F.lit("hub"))
        .otherwise(F.lit("outlier"))
        .alias("role"),
    )
    out = labeled.select("vertex", "role", "cluster").union(
        rest_roles.select("vertex", "role", "cluster")
    )
    ee.unpersist()
    eps.unpersist()
    cores.unpersist()
    return out
