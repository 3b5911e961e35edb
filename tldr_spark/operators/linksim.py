"""Link-structure similarity & local-density analytics over the edge table:

  clustering_coefficient   per-vertex local density 2T/(d(d-1)) — triangle
                           counts from the degree-oriented wedge join
                           (operators/triangles.py) joined to degrees
  cocitation               pairs of pages cited BY the same sources
                           (Small 1973) — the similarity signal behind
                           "related pages"; one self-join on src
  bibliographic_coupling   pairs of pages citing the same targets
                           (Kessler 1963) — dual of co-citation; one
                           self-join on dst
  common_neighbor_jaccard  |N(a)∩N(b)| / |N(a)∪N(b)| over undirected
                           neighbor sets — link-prediction similarity

All pure DataFrame algebra (no UDFs, whole-stage codegen end to end). The
pair joins shuffle on the shared endpoint — sparse (only vertices with a
common neighbor meet), never an all-pairs product; hub endpoints are the
skew axis, mitigated by AQE skew-join or pre-filtering `max_degree`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _simple_directed(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _undirected_neighbors(edges: DataFrame) -> DataFrame:
    """(id, nb) — distinct undirected adjacency."""
    e = _simple_directed(edges)
    return (
        e.select(F.col("src").alias("id"), F.col("dst").alias("nb"))
        .union(e.select(F.col("dst").alias("id"), F.col("src").alias("nb")))
        .distinct()
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, coeff) for vertices with degree >= 2;
    coeff = 2·triangles / (degree·(degree−1)) on the undirected simple
    graph; vertices in no triangle get coeff 0."""
    from tldr_spark.operators.triangles import triangle_count

    nb = _undirected_neighbors(edges)
    deg = nb.groupBy("id").agg(F.count(F.lit(1)).alias("degree")).filter("degree >= 2")
    tri = triangle_count(edges).per_vertex
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            (
                2.0 * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1))
            ).alias("coeff"),
        )
    )


def cocitation(edges: DataFrame, min_count: int = 2) -> DataFrame:
    """(id_a, id_b, n_common_sources), id_a < id_b: pages cited together by
    at least ``min_count`` distinct sources."""
    e = _simple_directed(edges)
    a = e.select("src", F.col("dst").alias("id_a"))
    b = e.select("src", F.col("dst").alias("id_b"))
    return (
        a.join(b, "src")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common_sources"))
        .filter(F.col("n_common_sources") >= min_count)
    )


def bibliographic_coupling(edges: DataFrame, min_count: int = 2) -> DataFrame:
    """(id_a, id_b, n_common_targets), id_a < id_b: pages whose out-links
    overlap in at least ``min_count`` targets."""
    e = _simple_directed(edges)
    a = e.select("dst", F.col("src").alias("id_a"))
    b = e.select("dst", F.col("src").alias("id_b"))
    return (
        a.join(b, "dst")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common_targets"))
        .filter(F.col("n_common_targets") >= min_count)
    )


def common_neighbor_jaccard(edges: DataFrame, threshold: float = 0.0) -> DataFrame:
    """(id_a, id_b, jaccard), id_a < id_b, over undirected neighbor sets;
    only pairs with >= 1 common neighbor appear (Jaccard 0 pairs are
    meaningless for link prediction and would be all-pairs)."""
    # no persist: the result is lazy and a pinned cache would outlive it;
    # within one action Catalyst's ReuseExchange dedupes the shared
    # distinct-neighbors exchange across the three branches
    nb = _undirected_neighbors(edges)
    sz = nb.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = nb.select(F.col("id").alias("id_a"), "nb")
    b = nb.select(F.col("id").alias("id_b"), "nb")
    inter = (
        a.join(b, "nb")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sz.select(F.col("id").alias("id_a"), F.col("sz").alias("sa")), "id_a")
        .join(sz.select(F.col("id").alias("id_b"), F.col("sz").alias("sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("i") / (F.col("sa") + F.col("sb") - F.col("i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def _weighted_common_neighbors(edges: DataFrame, weight_expr) -> DataFrame:
    """(id_a, id_b, score), id_a < id_b: sum of ``weight_expr`` (a function
    of the common neighbor's undirected degree, column ``dz``) over common
    neighbors. The degree attaches to the SHARED endpoint before the pair
    join, so the join shape (and skew axis) is identical to
    :func:`common_neighbor_jaccard` — sparse via the shared neighbor, never
    all-pairs. Any common neighbor has >= 2 distinct neighbors, so dz >= 2
    in every surviving row."""
    nb = _undirected_neighbors(edges)
    deg = nb.groupBy("id").agg(F.count(F.lit(1)).alias("dz"))
    nbd = nb.join(deg.withColumnRenamed("id", "nb"), "nb")
    a = nbd.select(F.col("id").alias("id_a"), "nb", "dz")
    b = nb.select(F.col("id").alias("id_b"), "nb")
    return (
        a.join(b, "nb")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(weight_expr(F.col("dz"))).alias("score"))
    )


def adamic_adar(edges: DataFrame, threshold: float = 0.0) -> DataFrame:
    """Adamic-Adar link-prediction index (Adamic & Adar 2003):
    AA(a,b) = sum over common undirected neighbors z of 1/ln(deg(z)).
    Rare shared neighbors count more than hubs. dz >= 2 for every common
    neighbor, so ln(dz) > 0 always."""
    return _weighted_common_neighbors(edges, lambda dz: 1.0 / F.log(dz)).filter(
        F.col("score") >= threshold
    )


def resource_allocation(edges: DataFrame, threshold: float = 0.0) -> DataFrame:
    """Resource-allocation index (Zhou, Lu, Zhang 2009):
    RA(a,b) = sum over common undirected neighbors z of 1/deg(z) — the
    harsher hub discount; empirically the strongest simple predictor on
    web-ish graphs."""
    return _weighted_common_neighbors(edges, lambda dz: 1.0 / dz).filter(
        F.col("score") >= threshold
    )


# ---------------------------------------------------------------------------
# Neighborhood MinHash + LSH — the 100 TB scale path for
# common_neighbor_jaccard. The exact pair join above shuffles one row per
# (common neighbor, pair) — on a web graph a degree-10^7 hub contributes
# ~10^14 wedge rows, which no amount of AQE splitting saves. MinHashing the
# neighbor SET first caps per-vertex state at `num_hashes` values, the
# bucket join meets only vertices sharing a minimum (expected bucket size
# is governed by signature diversity, not hub degree), and the exact
# verification join runs only over the candidate pairs — the same
# candidates→verify shape as dedup.minhash_lsh_pairs → ngram_jaccard_pairs.
# ---------------------------------------------------------------------------

def neighbor_minhash_signatures(
    edges: DataFrame, num_hashes: int = 4, neighbors: DataFrame | None = None
) -> DataFrame:
    """(id, h0..h{k-1}) — minhash signature of each vertex's undirected
    neighbor set. hash_i(nb) = 8-hex-char slice i of md5(cast(nb as
    string)); lexicographic min of fixed-width hex == numeric min, and md5
    is available verbatim in ANSI SQL/DuckDB so the whole signature is
    oracle-checkable. All JVM built-ins; one shuffle (the groupBy)."""
    assert 1 <= num_hashes <= 4
    nb = neighbors if neighbors is not None else _undirected_neighbors(edges)
    d = F.md5(F.col("nb").cast("string"))
    aggs = [
        F.min(F.substring(d, 1 + 8 * i, 8)).alias(f"h{i}") for i in range(num_hashes)
    ]
    return nb.groupBy("id").agg(*aggs)


def neighbor_minhash_candidates(
    edges: DataFrame, num_hashes: int = 4, neighbors: DataFrame | None = None
) -> DataFrame:
    """(id_a, id_b, n_common_bands), id_a < id_b — vertex pairs whose
    neighbor-set minhash signatures collide in >= 1 of `num_hashes` bands
    (band size 1: recall-oriented; P[collide in band i] = Jaccard). The
    pair join is per-(band, value) bucket — never all-pairs, and hub degree
    does not inflate bucket size."""
    sig = neighbor_minhash_signatures(edges, num_hashes, neighbors)
    bands = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"h{i}").alias("val"))
                for i in range(num_hashes)
            ])
        ).alias("bv"),
    ).select("id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(F.col("id").alias("id_a"), "band", "val")
    b = bands.select(F.col("id").alias("id_b"), "band", "val")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common_bands"))
    )


def neighbor_minhash_jaccard(
    edges: DataFrame, threshold: float = 0.5, num_hashes: int = 4
) -> DataFrame:
    """(id_a, id_b, jaccard) — exact neighbor-set Jaccard >= threshold,
    restricted to LSH candidate pairs. The candidate restriction reaches
    every expensive stage: the neighbor table is semi-joined down to ids in
    some candidate pair BEFORE the wedge join, and wedge rows are
    semi-restricted to candidate pairs BEFORE the aggregation — a hub
    vertex in no candidate pair contributes zero wedge rows. Same
    guarantees as the exact operator on the pairs it emits; recall vs the
    exact operator is 1-(1-J)^k per pair (e.g. J=0.5, k=4 → 94%)."""
    nb = _undirected_neighbors(edges).persist()
    cand = neighbor_minhash_candidates(edges, num_hashes, neighbors=nb).select(
        "id_a", "id_b"
    )
    ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    nbr = nb.join(ids, "id", "left_semi")
    sz = nbr.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = nbr.select(F.col("id").alias("id_a"), "nb")
    b = nbr.select(F.col("id").alias("id_b"), "nb")
    inter = (
        a.join(b, "nb")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(cand, ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sz.select(F.col("id").alias("id_a"), F.col("sz").alias("sa")), "id_a")
        .join(sz.select(F.col("id").alias("id_b"), F.col("sz").alias("sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("i") / (F.col("sa") + F.col("sb") - F.col("i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # thresholded result is small; pin it, then release the shared cache
    out = out.localCheckpoint(eager=True)
    nb.unpersist()
    return out


def link_recommendations(
    edges: DataFrame, k: int = 5, quant: int = 1048576
) -> DataFrame:
    """(id, rec, score_q, rk) — top-k link predictions per vertex: the
    "related pages you don't already link" surface. Candidates and scores
    come from resource_allocation (strongest simple predictor on web-ish
    graphs); pairs already adjacent (undirected) are anti-joined away;
    ranking is per-vertex (window partitioned by id — no global sort) over
    the QUANTIZED score so cross-engine tie order is exact: ties break by
    candidate id ascending.

    Scale shape: the RA pair join is the wedge join (sparse, hub-skew via
    AQE); the anti-join and the per-vertex top-k window both partition by
    vertex — nothing global anywhere."""
    from pyspark.sql import Window

    ra = resource_allocation(edges)
    both = ra.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("rec"), "score"
    ).union(ra.select(F.col("id_b").alias("id"), F.col("id_a").alias("rec"), "score"))
    nb = _undirected_neighbors(edges).select(
        F.col("id"), F.col("nb").alias("rec")
    )
    cand = both.join(nb, ["id", "rec"], "left_anti").select(
        "id", "rec", F.round(F.col("score") * quant).cast("long").alias("score_q")
    )
    w = Window.partitionBy("id").orderBy(F.col("score_q").desc(), F.col("rec").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def edge_embeddedness(edges: DataFrame) -> DataFrame:
    """(a, b, support, embeddedness), a < b, one row per undirected edge:
    the Granovetter tie-strength signal (Easley & Kleinberg ch. 3).
    ``support`` = common neighbors of the endpoints (triangles the edge
    closes), ``embeddedness`` = support / |N(a) ∪ N(b) \\ {a,b}| =
    support / (deg_a + deg_b - 2 - support) — neighborhood Jaccard
    restricted to EXISTING edges (``common_neighbor_jaccard`` scores
    candidate pairs instead and drops zero-overlap pairs; here zero-support
    bridges are the interesting rows). Support comes from the same
    degree-ordered oriented triangle enumeration as :func:`triangle_count`
    (out-degree O(sqrt E), hub-safe) with the 3 member edges exploded —
    never a per-pair neighbor-set join."""
    from tldr_spark.operators.triangles import _oriented

    und = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("a"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    und.count()
    o = _oriented(und.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    closer = o.select(F.col("a").alias("y"), F.col("b").alias("z")).union(
        o.select(F.col("b").alias("y"), F.col("a").alias("z"))
    )
    tris = wedges.join(closer, ["y", "z"])
    sup = (
        tris.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .union(tris.select(F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")))
        .union(tris.select(F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    out = (
        und.join(sup, ["a", "b"], "left")
        .join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.when(
                F.col("da") + F.col("db") - F.lit(2) - F.coalesce("support", F.lit(0))
                == F.lit(0),
                F.lit(0.0),  # isolated edge: neighbor union is empty
            )
            .otherwise(
                F.coalesce("support", F.lit(0)).cast("double")
                / (F.col("da") + F.col("db") - F.lit(2) - F.coalesce("support", F.lit(0)))
            )
            .alias("embeddedness"),
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out


def clustering_by_degree(edges: DataFrame) -> DataFrame:
    """c(k) curve (Vazquez, Pastor-Satorras & Vespignani PRE'02): one row
    per degree class k >= 2 with

      n_vertices     vertices of undirected degree k
      sum_triangles  total triangles those vertices sit in
      coeff          2·sum_triangles / (n_vertices·k·(k−1)) — the mean
                     local clustering coefficient of a degree-k vertex

    A falling c(k) ~ k^-1 is the hierarchical-modularity signature
    (Ravasz-Barabasi) crawl analyses look for; companion curve to
    ``stats.avg_neighbor_degree``. Exact integer numerators, one final
    division; cost = one triangle count + two key-partitioned aggregates."""
    from tldr_spark.operators.triangles import triangle_count

    nb = _undirected_neighbors(edges)
    deg = nb.groupBy("id").agg(F.count(F.lit(1)).alias("degree")).filter("degree >= 2")
    tri = triangle_count(edges).per_vertex
    return (
        deg.join(tri, "id", "left")
        .groupBy("degree")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum(F.coalesce("triangles", F.lit(0))).alias("sum_triangles"),
        )
        .select(
            F.col("degree").cast("long").alias("degree"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.col("sum_triangles").cast("long").alias("sum_triangles"),
            (
                F.lit(2.0) * F.col("sum_triangles")
                / (F.col("n_vertices") * F.col("degree") * (F.col("degree") - F.lit(1)))
            ).alias("coeff"),
        )
    )


def forman_curvature(edges: DataFrame) -> DataFrame:
    """(a, b, support, curvature), a < b, one row per undirected edge —
    the augmented Forman-Ricci curvature of an unweighted graph edge
    (Samal et al., Sci. Rep. 2018, the triangle-augmented form):

        F#(a,b) = 4 - deg(a) - deg(b) + 3 * t(a,b)

    t = triangles through the edge (= embeddedness support). Strongly
    negative edges are the network's BRIDGES/bottlenecks (information
    highways between communities), positive edges sit inside dense
    clusters — the geometric complement of edge betweenness at a tiny
    fraction of its cost. Pure integer arithmetic on top of the same
    degree-ordered triangle enumeration as :func:`edge_embeddedness`;
    one extra degree join."""
    ee = edge_embeddedness(edges).select("a", "b", "support")
    und = ee.select("a", "b")
    adj = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = adj.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        ee.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            "support",
            (
                F.lit(4) - F.col("da") - F.col("db") + 3 * F.col("support")
            ).alias("curvature"),
        )
    )
