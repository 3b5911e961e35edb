"""Whole-graph summary statistics — the one-row profile a crawl operator
reads before anything else:

  n_vertices / n_edges    simple directed graph size
  reciprocity             fraction of directed edges whose reverse also
                          exists (link-exchange signal on the web)
  transitivity            global clustering coefficient 3·triangles/wedges
  density                 |E| / (|V|·(|V|−1))

Everything is single-pass aggregates + the existing triangle machinery;
the scalars meet in broadcast crossJoins (all 1-row), so the result is one
dataflow — no driver-side collect-and-recombine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row: (m, sxy, sx, sy, sxx, syy, assortativity) — Pearson
    correlation of (out-degree(src), in-degree(dst)) across the simple
    directed edges (Newman 2002, the out-in convention for directed webs).
    The five sums are exact integers (degrees are ints), so cross-engine
    parity holds bit-for-bit up to the final division."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("x"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("y"))
    pairs = e.join(outd, "src").join(ind, "dst")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    m, sxy, sx, sy, sxx, syy = (F.col(c) for c in ["m", "sxy", "sx", "sy", "sxx", "syy"])
    num = (m * sxy - sx * sy).cast("double")
    den = F.sqrt((m * sxx - sx * sx).cast("double") * (m * syy - sy * sy).cast("double"))
    # 1-row result: checkpoint it, release the cached edge set
    out = agg.select(
        "m", "sxy", "sx", "sy", "sxx", "syy",
        F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("assortativity"),
    ).localCheckpoint(eager=True)
    e.unpersist()
    return out


def graph_summary(edges: DataFrame) -> DataFrame:
    """One row: (n_vertices, n_edges, n_reciprocal, n_und_edges, triangles,
    wedges, reciprocity, transitivity, density)."""
    from tldr_spark.operators.triangles import _oriented

    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    ecnt = e.agg(F.count(F.lit(1)).alias("n_edges"))
    vcnt = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )

    und = _oriented(e, by_degree=False).persist()
    undcnt = und.agg(F.count(F.lit(1)).alias("n_und_edges"))
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.coalesce(F.sum(F.col("d") * (F.col("d") - 1) / 2), F.lit(0.0))
        .cast("long")
        .alias("wedges")
    )
    # one triangle closes 3 wedges; count triangles with the oriented wedge
    # join directly (id order suffices for a count — no skew concern in the
    # one-shot stats pass at test scale; swap _oriented(by_degree=True) on
    # power-law graphs)
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    closer = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tris = (
        e1.join(e2, "x")
        .filter(F.col("y") < F.col("z"))
        .join(closer, ["y", "z"], "left_semi")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )

    out = (
        ecnt.crossJoin(vcnt)
        .crossJoin(recip)
        .crossJoin(undcnt)
        .crossJoin(tris)
        .crossJoin(wedges)
        .select(
            "n_vertices",
            "n_edges",
            "n_reciprocal",
            "n_und_edges",
            "triangles",
            "wedges",
            (F.col("n_reciprocal") / F.col("n_edges")).alias("reciprocity"),
            F.when(F.col("wedges") > 0, 3.0 * F.col("triangles") / F.col("wedges"))
            .otherwise(0.0)
            .alias("transitivity"),
            (
                F.col("n_edges")
                / (F.col("n_vertices") * (F.col("n_vertices") - F.lit(1.0)))
            ).alias("density"),
        )
        .localCheckpoint(eager=True)  # 1-row result; then release caches
    )
    e.unpersist()
    und.unpersist()
    return out


def vertex_reciprocity(edges: DataFrame) -> DataFrame:
    """(vertex, out_deg, n_reciprocal, reciprocity) — per-vertex fraction
    of out-links whose reverse edge also exists (the whole-graph
    reciprocity of :func:`graph_summary`, broken out per vertex: the
    link-exchange / spam-farm signal). One self-semi-join of the simple
    edge set on the flipped key + one aggregate; exact integer counts,
    one final division."""
    sd = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    rev = sd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = sd.join(rev, ["src", "dst"], "left_semi").groupBy(
        F.col("src").alias("vertex")
    ).agg(F.count(F.lit(1)).alias("n_reciprocal"))
    outd = sd.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    out = (
        outd.join(recip, "vertex", "left")
        .select(
            "vertex",
            F.col("out_deg").cast("long").alias("out_deg"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias("n_reciprocal"),
            (
                F.coalesce("n_reciprocal", F.lit(0)).cast("double")
                / F.col("out_deg")
            ).alias("reciprocity"),
        )
        .localCheckpoint(eager=True)
    )
    sd.unpersist()
    return out


def powerlaw_alpha(
    edges: DataFrame, d_min: int = 2, direction: str = "in"
) -> DataFrame:
    """One row: (n_tail, d_min, alpha) — the Clauset-Shalizi-Newman (SIAM
    Review 2009) discrete-MLE approximation for the degree-distribution
    power-law exponent, α ≈ 1 + n·[Σ ln(dᵢ/(d_min−½))]⁻¹ over the tail
    dᵢ ≥ d_min. The hub-exponent profile that decides whether skew salting
    is needed at all. ``direction``: "in", "out", or "total" degree over
    simple directed edges. One degree aggregate + one scalar fold."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if direction == "in":
        deg = e.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    elif direction == "out":
        deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    elif direction == "total":
        deg = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
    else:  # pragma: no cover
        raise ValueError(f"direction must be in/out/total, got {direction!r}")
    tail = deg.filter(F.col("d") >= d_min)
    return tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.lit(int(d_min)).cast("long").alias("d_min"),
        (
            1.0
            + F.count(F.lit(1))
            / F.sum(F.log(F.col("d").cast("double") / (d_min - 0.5)))
        ).alias("alpha"),
    )


def attribute_mixing_matrix(edges: DataFrame, attrs: DataFrame) -> DataFrame:
    """(attr_src, attr_dst, n_edges) — the categorical mixing matrix over
    simple directed edges (Newman 2003 §II): how often category i links to
    category j. ``attrs`` is a (id, attr) dimension; edges with an
    unlabeled endpoint are dropped (inner joins). Scale shape: the classic
    fact×dim star join — two hash joins of the edge table against the
    V-row attribute dimension (broadcast when the dim is small, AQE
    decides), then a |categories|² aggregate."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    asrc = attrs.select(F.col("id").cast("long").alias("src"), F.col("attr").alias("attr_src"))
    adst = attrs.select(F.col("id").cast("long").alias("dst"), F.col("attr").alias("attr_dst"))
    return (
        e.join(asrc, "src")
        .join(adst, "dst")
        .groupBy("attr_src", "attr_dst")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


def attribute_assortativity(edges: DataFrame, attrs: DataFrame) -> DataFrame:
    """One row: (m, trace, sum_ab, assortativity) — Newman's categorical
    assortativity r = (M·Tr(n) − Σᵢ aᵢ·bᵢ) / (M² − Σᵢ aᵢ·bᵢ) computed from
    the INTEGER mixing counts (n = mixing matrix, aᵢ/bᵢ its row/column
    marginals, M total labeled edges), so cross-engine parity is exact up
    to the single final division. r = 1 ⇔ perfectly assortative, 0 ⇔
    random mixing, < 0 ⇔ disassortative."""
    mm = attribute_mixing_matrix(edges, attrs).persist()
    marg_a = mm.groupBy("attr_src").agg(F.sum("n_edges").alias("a"))
    marg_b = mm.groupBy("attr_dst").agg(F.sum("n_edges").alias("b"))
    sum_ab = (
        marg_a.join(marg_b, marg_a["attr_src"] == marg_b["attr_dst"])
        .agg(F.coalesce(F.sum(F.col("a") * F.col("b")), F.lit(0)).alias("sum_ab"))
    )
    totals = mm.agg(
        F.coalesce(F.sum("n_edges"), F.lit(0)).alias("m"),
        F.coalesce(
            F.sum(F.when(F.col("attr_src") == F.col("attr_dst"), F.col("n_edges"))),
            F.lit(0),
        ).alias("trace"),
    )
    out = (
        totals.crossJoin(F.broadcast(sum_ab))
        .select(
            "m",
            "trace",
            "sum_ab",
            F.when(
                F.col("m") * F.col("m") - F.col("sum_ab") != 0,
                (F.col("m") * F.col("trace") - F.col("sum_ab")).cast("double")
                / (F.col("m") * F.col("m") - F.col("sum_ab")).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("assortativity"),
        )
        .localCheckpoint(eager=True)
    )
    mm.unpersist()
    return out


def partition_modularity(edges: DataFrame, assignments: DataFrame) -> DataFrame:
    """Newman modularity Q of a vertex partition (e.g. label-propagation
    communities) on the UNDIRECTED simple graph:

        Q = sum over communities c of [ e_c/m  -  (d_c / 2m)^2 ]

    where m = undirected edge count, e_c = edges with both endpoints in c,
    d_c = sum of undirected degrees in c. One row (modularity, m,
    n_communities). ``assignments`` is (id, <label col>) — any second
    column name works.

    Shape: two broadcast-able joins of the (small) assignment table onto
    the edge list + two aggregates; no all-pairs term — the k_i·k_j sum
    collapses to per-community degree sums, which is what makes Q
    computable at web scale in one dataflow.
    """
    label_col = [c for c in assignments.columns if c != "id"][0]
    asg = assignments.select(
        F.col("id").cast("long"), F.col(label_col).alias("_c")
    )
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .join(asg.withColumnRenamed("id", "a").withColumnRenamed("_c", "ca"), "a")
        .join(asg.withColumnRenamed("id", "b").withColumnRenamed("_c", "cb"), "b")
        .persist()
    )
    m = e.count()
    spark = edges.sparkSession
    if m == 0:
        out = spark.createDataFrame(
            [(0.0, 0, 0)], "modularity double, m long, n_communities long"
        )
        e.unpersist()
        return out
    # e_c: within-community undirected edges; d_c: degree mass per community
    within = e.filter(F.col("ca") == F.col("cb")).groupBy(F.col("ca").alias("_c")).agg(
        F.count(F.lit(1)).alias("e_c")
    )
    deg = (
        e.select(F.col("ca").alias("_c"))
        .union(e.select(F.col("cb").alias("_c")))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("d_c"))
    )
    per_c = deg.join(within, "_c", "left").select(
        "_c",
        (
            F.coalesce("e_c", F.lit(0)) / F.lit(float(m))
            - F.pow(F.col("d_c") / F.lit(2.0 * m), F.lit(2.0))
        ).alias("q_c"),
    )
    out = per_c.agg(
        F.sum("q_c").alias("modularity"),
        F.lit(m).alias("m"),
        F.count(F.lit(1)).alias("n_communities"),
    ).localCheckpoint(eager=True)
    e.unpersist()
    return out


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Degree-correlation curve knn(k) over the undirected simple graph
    (Pastor-Satorras, Vazquez & Vespignani PRL'01): one row per degree
    class k with

      n_vertices         vertices of undirected degree k
      sum_neighbor_deg   sum over those vertices of sum-of-neighbor-degrees
      knn                sum_neighbor_deg / (k * n_vertices) — the mean
                         neighbor degree of a degree-k vertex

    Rising knn(k) = assortative wiring, falling = the disassortative
    hub-to-leaf pattern typical of the web (the scalar summary of this
    curve is :func:`degree_assortativity`). Exact integer numerators /
    denominators, one final division. Three shuffles: degree aggregate,
    neighbor-degree join + per-vertex sum, degree-class aggregate — all
    on (vertex) or (degree) keys, no skew hazard beyond the degree
    aggregate every other operator already pays."""
    adj = (
        edges.select(F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .union(
            edges.select(F.col("dst").cast("long").alias("u"), F.col("src").cast("long").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .persist()
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    snd = (
        adj.join(deg.withColumnsRenamed({"u": "v", "deg": "nd"}), "v")
        .groupBy("u")
        .agg(F.sum("nd").alias("snd"))
    )
    out = (
        deg.join(snd, "u")
        .groupBy(F.col("deg").alias("degree"))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("snd").cast("long").alias("sum_neighbor_deg"),
        )
        .select(
            F.col("degree").cast("long").alias("degree"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            "sum_neighbor_deg",
            (
                F.col("sum_neighbor_deg").cast("double")
                / (F.col("degree") * F.col("n_vertices"))
            ).alias("knn"),
        )
        .localCheckpoint(eager=True)
    )
    adj.unpersist()
    return out


def degree_moments(edges: DataFrame) -> DataFrame:
    """One row of undirected degree-distribution moments and the two
    percolation-robustness scalars crawl planners read off them:

      n_vertices, n_und_edges, sum_deg (=2E), sum_deg2
      mean_deg        <k>
      second_moment   <k^2>
      kappa           <k^2>/<k>  — Molloy-Reed criterion (giant component
                      exists iff kappa > 2)
      fc              1 - 1/(kappa - 1) — Cohen et al. PRL'00 random-
                      failure threshold: the fraction of vertices that can
                      fail before the giant component dissolves (0 when
                      kappa <= 1 leaves it undefined)

    All moments are exact integers; each scalar is ONE double division of
    exact integers (bit-identical across engines). Cost: one degree
    aggregate + one 1-row reduce."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sd, sd2 = F.col("sum_deg"), F.col("sum_deg2")
    out = (
        deg.agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("deg").alias("sum_deg"),
            F.sum(F.col("deg") * F.col("deg")).alias("sum_deg2"),
        )
        .select(
            F.col("n_vertices").cast("long").alias("n_vertices"),
            (sd / 2).cast("long").alias("n_und_edges"),
            sd.cast("long").alias("sum_deg"),
            sd2.cast("long").alias("sum_deg2"),
            (sd.cast("double") / F.col("n_vertices")).alias("mean_deg"),
            (sd2.cast("double") / F.col("n_vertices")).alias("second_moment"),
            (sd2.cast("double") / sd).alias("kappa"),
            F.when(sd2 > sd, F.lit(1.0) - sd.cast("double") / (sd2 - sd))
            .otherwise(F.lit(0.0))
            .alias("fc"),
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out


def attack_tolerance(
    edges: DataFrame, per_mille: tuple[int, ...] = (10, 50, 100)
) -> DataFrame:
    """Targeted-attack robustness curve (Albert, Jeong & Barabasi, Nature
    406:378, 2000): for each hub-removal budget f (in per-mille of V),
    delete the top floor(f/1000 * V) vertices by (undirected degree DESC,
    id ASC — deterministic tie-break) and measure what is left:

      per_mille, n_removed, n_left (vertices with >= 1 surviving edge),
      giant_size (largest connected component of the surviving edges),
      giant_frac = giant_size / n_vertices_original

    The scale-free web's signature: huge giant-component collapse under
    tiny targeted budgets vs near-immunity to random failure (the random
    side is the degree_moments fc scalar). Isolated survivors (vertices
    whose every neighbor was removed) are NOT in n_left/giant — the curve
    reads over the surviving edge set, mirrored exactly by the oracle.

    Cost per budget: one broadcast-able top-k hub list (TakeOrderedAndProject,
    no global sort), two anti-joins over the edge table, one CC run —
    at web scale the CC pass dominates and is the same star-contraction +
    bounded-finisher machinery every other component query uses."""
    from tldr_spark.operators.components import connected_components

    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .persist()
    )
    und.count()
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    n_total = deg.count()
    spark = edges.sparkSession
    rows = []
    for pm in per_mille:
        k = (pm * n_total) // 1000
        hubs = (
            deg.orderBy(F.desc("deg"), F.asc("id")).limit(int(k)).select("id")
        )
        surv = (
            und.join(hubs.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(hubs.withColumnRenamed("id", "b"), "b", "left_anti")
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        cc = connected_components(surv).assignments
        agg = cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz")).agg(
            F.coalesce(F.sum("sz"), F.lit(0)).alias("n_left"),
            F.coalesce(F.max("sz"), F.lit(0)).alias("giant"),
        ).collect()[0]
        rows.append(
            (
                int(pm),
                int(k),
                int(agg["n_left"]),
                int(agg["giant"]),
                float(agg["giant"]) / n_total if n_total else 0.0,
            )
        )
    und.unpersist()
    deg.unpersist()
    return spark.createDataFrame(
        rows,
        "per_mille long, n_removed long, n_left long, giant_size long, giant_frac double",
    )


def directed_assortativity(edges: DataFrame) -> DataFrame:
    """All four directed degree-degree Pearson correlations (Foster,
    Foster, Grassberger & Paczuski, PNAS 2010): one row per mode
    ``out-in`` / ``out-out`` / ``in-in`` / ``in-out``, correlating
    (x-degree of src, y-degree of dst) across the simple directed edges —
    the full directed generalization of :func:`degree_assortativity`
    (whose single row is the out-in convention). The web's known
    signature: all four near zero-to-negative (hubs link to leaves).
    One edge-degree join pass shared by all four modes; exact integer
    sums, one sqrt + one division per row."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("od"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("idg"))
    pairs = (
        e.join(outd.withColumnsRenamed({"id": "src", "od": "od_s"}), "src")
        .join(ind.withColumnsRenamed({"id": "src", "idg": "id_s"}), "src", "left")
        .join(outd.withColumnsRenamed({"id": "dst", "od": "od_d"}), "dst", "left")
        .join(ind.withColumnsRenamed({"id": "dst", "idg": "id_d"}), "dst")
        .select(
            F.coalesce("od_s", F.lit(0)).alias("od_s"),
            F.coalesce("id_s", F.lit(0)).alias("id_s"),
            F.coalesce("od_d", F.lit(0)).alias("od_d"),
            F.coalesce("id_d", F.lit(0)).alias("id_d"),
        )
    )
    modes = {
        "out-in": ("od_s", "id_d"),
        "out-out": ("od_s", "od_d"),
        "in-in": ("id_s", "id_d"),
        "in-out": ("id_s", "od_d"),
    }
    aggs = [F.count(F.lit(1)).alias("m")]
    for mode, (xc, yc) in modes.items():
        tag = mode.replace("-", "_")
        x, y = F.col(xc), F.col(yc)
        aggs += [
            F.sum(x * y).alias(f"sxy_{tag}"),
            F.sum(x).alias(f"sx_{tag}"),
            F.sum(y).alias(f"sy_{tag}"),
            F.sum(x * x).alias(f"sxx_{tag}"),
            F.sum(y * y).alias(f"syy_{tag}"),
        ]
    one = pairs.agg(*aggs)
    rows = []
    for mode in modes:
        tag = mode.replace("-", "_")
        m = F.col("m")
        sxy, sx, sy = (F.col(f"{c}_{tag}") for c in ("sxy", "sx", "sy"))
        sxx, syy = F.col(f"sxx_{tag}"), F.col(f"syy_{tag}")
        num = (m * sxy - sx * sy).cast("double")
        den = F.sqrt(
            (m * sxx - sx * sx).cast("double") * (m * syy - sy * sy).cast("double")
        )
        rows.append(
            one.select(
                F.lit(mode).alias("mode"),
                m.cast("long").alias("m"),
                sxy.cast("long").alias("sxy"),
                sx.cast("long").alias("sx"),
                sy.cast("long").alias("sy"),
                sxx.cast("long").alias("sxx"),
                syy.cast("long").alias("syy"),
                F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("r"),
            )
        )
    out = rows[0]
    for fr in rows[1:]:
        out = out.union(fr)
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out


def random_failure_tolerance(
    edges: DataFrame, per_mille: tuple[int, ...] = (100, 300, 500)
) -> DataFrame:
    """Random-failure side of :func:`attack_tolerance` (Albert-Jeong-
    Barabasi): instead of the top hubs, remove the DETERMINISTIC
    pseudo-random vertex subset { v : (v * 2654435761) %% 1000 < f } —
    Knuth's multiplicative hash, so the subset is uniform-ish, scale-free
    of the id layout, and bit-identically reproducible by the SQL oracle
    (no RNG state to ship cross-engine). Same outputs as
    attack_tolerance: (per_mille, n_removed, n_left, giant_size,
    giant_frac). A scale-free web keeps its giant component under heavy
    RANDOM deletion (the degree_moments fc prediction) while collapsing
    under tiny TARGETED budgets — this pair of curves is the evidence.

    Cost per budget: two edge anti-joins + one CC run, like the attack
    twin (the removal set here is a predicate, not even a top-k list)."""
    from tldr_spark.operators.components import connected_components

    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .persist()
    )
    und.count()
    verts = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .distinct()
        .persist()
    )
    n_total = verts.count()
    spark = edges.sparkSession
    rows = []
    for pm in per_mille:
        # pmod, not %: SQL % is sign-of-dividend, which would sweep every
        # negative id into the removal set
        pred = F.pmod(F.col("id") * F.lit(2654435761), F.lit(1000)) < F.lit(int(pm))
        removed = verts.filter(pred)
        k = removed.count()
        surv = (
            und.join(removed.withColumnRenamed("id", "a"), "a", "left_anti")
            .join(removed.withColumnRenamed("id", "b"), "b", "left_anti")
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        agg = (
            connected_components(surv)
            .assignments.groupBy("component")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.coalesce(F.sum("sz"), F.lit(0)).alias("n_left"),
                F.coalesce(F.max("sz"), F.lit(0)).alias("giant"),
            )
            .collect()[0]
        )
        rows.append(
            (
                int(pm),
                int(k),
                int(agg["n_left"]),
                int(agg["giant"]),
                float(agg["giant"]) / n_total if n_total else 0.0,
            )
        )
    und.unpersist()
    verts.unpersist()
    return spark.createDataFrame(
        rows,
        "per_mille long, n_removed long, n_left long, giant_size long, giant_frac double",
    )


def degree_gini(edges: DataFrame, direction: str = "in") -> DataFrame:
    """One row (n_vertices, total_deg, gini): Gini concentration of the
    (un)weighted degree distribution — the one-number answer to "how
    concentrated is the link attention?" (0 = uniform, ->1 = a few pages
    absorb everything; on web graphs typically 0.6-0.9, and a sudden jump
    is a link-farm / consolidation signal).

    Gini = sum_i (2i - n - 1) d_(i) / (n * sum d) over ASCENDING-sorted
    degrees. The numerator is permutation-invariant within tied degree
    values (d constant across a tie block), so rank ties cannot cause
    cross-engine drift; all inputs are exact integers and the final ratio
    is one double division.

    Scale shape: degree aggregate + ONE distributed total sort for ranks
    (nullmodel._global_ranks — range partition + local sort + offset
    mapInPandas, no single-partition window) + one map-combined aggregate.
    """
    if direction not in ("in", "out"):
        raise ValueError(f"direction must be 'in' or 'out', got {direction}")
    key = "dst" if direction == "in" else "src"
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = edges.groupBy(F.col(key).alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    full = verts.join(deg, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0)).cast("long").alias("deg")
    )
    from tldr_spark.operators.nullmodel import _global_ranks

    ranked = _global_ranks(full, ["deg", "id"], "rk")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("deg").alias("total_deg"),
        F.sum((2 * F.col("rk") - 1) * F.col("deg")).alias("_num_part"),
    ).select(
        "n_vertices",
        "total_deg",
        (
            (F.col("_num_part") - (F.col("n_vertices") * F.col("total_deg")))
            / (F.col("n_vertices") * F.col("total_deg"))
        ).alias("gini"),
    )


def wilson_lower_bound(
    df, group_col: str, success_col: str, z: float = 1.96
):
    """(grp, n, k, phat, wilson_lb) — Wilson score interval lower bound
    on each group's success proportion (Wilson 1927; the "how to NOT
    rank a 1-for-1 group above a 950-for-1000 group" estimator):

        lb = (p + z^2/2n - z*sqrt(p(1-p)/n + z^2/4n^2)) / (1 + z^2/n)

    Small groups get pulled hard toward 0, so ranking by wilson_lb is
    the uncertainty-aware ordering. One map-side-combined groupBy; only
    the integer (k, n) pair enters the float formula, so both engines
    compute the identical expression."""
    from pyspark.sql import functions as F

    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.col(success_col).cast("long")), F.lit(0)
        ).alias("k"),
    )
    n = F.col("n").cast("double")
    p = F.col("k") / n
    z2 = z * z
    lb = (
        p + F.lit(z2) / (2 * n)
        - F.lit(z) * F.sqrt(p * (1 - p) / n + F.lit(z2) / (4 * n * n))
    ) / (1 + F.lit(z2) / n)
    return agg.select("grp", "n", "k", p.alias("phat"), lb.alias("wilson_lb"))
