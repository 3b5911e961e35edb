"""Triangle counting via degree-ordered orientation + wedge closure.

Seeds from the reference's pair-join idea (/root/reference/tldr.go:264-314,
the dense self-cross-join) re-expressed sparsely (SURVEY.md §2 op-10 →
"North-rule generalization operators"). The classic MapReduce formulation
(Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the Last
Reducer"): orient every undirected edge from the endpoint with smaller
(degree, id) to the larger, which bounds every vertex's out-degree by
O(sqrt(E)) — THE skew mitigation that keeps hub vertices from exploding the
wedge join on a power-law web graph. Then:

  wedges  = oriented ⋈ oriented on shared lower endpoint (a<b<c in order)
  closed  = wedges semi-joined against the oriented edge set

Three shuffles total, no iteration.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class TriangleResult:
    total: int
    per_vertex: DataFrame  # (id: long, triangles: long) — vertices in >=1 triangle


def _oriented(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """One row per undirected edge, canonically oriented."""
    und = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("a"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if not by_degree:
        return und  # id order: fine for tests/oracle, skew-prone at scale
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    w = und.join(da, "a").join(db, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return w.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def triangle_count(edges: DataFrame, by_degree: bool = True) -> TriangleResult:
    o = _oriented(edges, by_degree).persist()
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    # closing edge between y and z appears in o as (y,z) or (z,y)
    closer = o.select(F.col("a").alias("y"), F.col("b").alias("z")).union(
        o.select(F.col("b").alias("y"), F.col("a").alias("z"))
    )
    # one row per triangle; cache it so total AND per_vertex pay the wedge
    # join once, then checkpoint the (small, V-bounded) per-vertex result so
    # the big intermediates can be released before returning
    tris = wedges.join(closer, ["y", "z"]).persist()
    total = tris.count()
    per_vertex = (
        tris.select(F.col("x").alias("id"))
        .union(tris.select(F.col("y").alias("id")))
        .union(tris.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
        .localCheckpoint(eager=True)
    )
    tris.unpersist()
    o.unpersist()
    return TriangleResult(total, per_vertex)


@dataclass
class TrussResult:
    edges: DataFrame  # (a: long, b: long) surviving undirected edges, a < b
    rounds: int


def k_truss(edges: DataFrame, k: int, max_rounds: int = 50) -> TrussResult:
    """k-truss decomposition (Cohen 2008): the maximal subgraph in which
    every edge closes at least k-2 triangles WITHIN the subgraph — the
    standard cohesive-community primitive one notch stronger than k-core.

    Iterative peel: each round lists triangles of the current subgraph via
    the same degree-ordered wedge join as :func:`triangle_count` (out-degree
    bounded O(sqrt E) — hub-skew safe), counts per-edge support, and drops
    under-supported edges; repeats to fixpoint. Round count is bounded by
    the peel depth (small on web graphs; ``max_rounds`` guards pathological
    chains — hitting it raises rather than returning a non-truss).
    """
    if k < 2:
        raise ValueError(f"k-truss requires k >= 2, got {k}")
    cur = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("a"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n = cur.count()
    rounds = 0
    while rounds < max_rounds and n > 0:
        rounds += 1
        o = _oriented(cur.select(F.col("a").alias("src"), F.col("b").alias("dst"))).persist()
        e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
        wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
        closer = o.select(F.col("a").alias("y"), F.col("b").alias("z")).union(
            o.select(F.col("b").alias("y"), F.col("a").alias("z"))
        )
        tris = wedges.join(closer, ["y", "z"])
        # canonical (a<b) membership rows: each triangle supports 3 edges
        sup = (
            tris.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
            .union(tris.select(F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")))
            .union(tris.select(F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("sup"))
        )
        keep = (
            cur.join(sup, ["a", "b"], "left")
            .filter(F.coalesce("sup", F.lit(0)) >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=False)
            .persist()
        )
        m = keep.count()
        cur.unpersist()
        o.unpersist()
        stable = m == n
        cur, n = keep, m
        if stable:
            return TrussResult(cur, rounds)
    if n > 0 and rounds >= max_rounds:
        raise RuntimeError(
            f"k-truss did not stabilize within max_rounds={max_rounds} "
            f"({n} edges still in flux) — raise max_rounds for deep-peel graphs."
        )
    return TrussResult(cur, rounds)


@dataclass
class TrussDecompositionResult:
    trussness: DataFrame  # (a: long, b: long, trussness: int), a < b
    max_k: int


def truss_decomposition(
    edges: DataFrame, max_rounds_per_k: int = 50, max_k: int = 100
) -> TrussDecompositionResult:
    """Per-edge trussness: the maximum k such that the edge survives in the
    k-truss. PROGRESSIVE peel — level k starts from the (k-1)-truss's
    surviving edge set (never from scratch), so total work is one pass of
    the k_truss peel per level, the truss analogue of the coreness peel
    (operators/kcore.py). Edges closing no triangle have trussness 2 (every
    edge is trivially in the 2-truss). Support recount per round reuses the
    degree-ordered wedge join of :func:`triangle_count` — hub-skew safe."""
    spark = edges.sparkSession
    cur = (
        edges.select(
            F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("a"),
            F.greatest(F.col("src").cast("long"), F.col("dst").cast("long")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n = cur.count()
    assigned = spark.createDataFrame([], "a long, b long, trussness int")
    k = 2
    while n > 0 and k < max_k:
        k += 1
        level_start = cur
        rounds = 0
        while rounds < max_rounds_per_k:
            rounds += 1
            o = _oriented(cur.select(F.col("a").alias("src"), F.col("b").alias("dst"))).persist()
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
                .agg(F.count(F.lit(1)).alias("sup"))
            )
            keep = (
                cur.join(sup, ["a", "b"], "left")
                .filter(F.coalesce("sup", F.lit(0)) >= k - 2)
                .select("a", "b")
                .localCheckpoint(eager=False)
                .persist()
            )
            m = keep.count()
            o.unpersist()
            if cur is not level_start:
                cur.unpersist()
            stable = m == n
            cur, n = keep, m
            if stable or n == 0:
                break
        else:
            raise RuntimeError(
                f"truss peel at k={k} did not stabilize within "
                f"max_rounds_per_k={max_rounds_per_k}"
            )
        fell_out = level_start.join(cur, ["a", "b"], "left_anti").select(
            "a", "b", F.lit(k - 1).cast("int").alias("trussness")
        )
        assigned = assigned.union(fell_out).localCheckpoint(eager=True)
        level_start.unpersist()
    if n > 0:
        raise RuntimeError(f"truss decomposition exceeded max_k={max_k}")
    return TrussDecompositionResult(assigned, k - 1)


def four_clique_count(edges: DataFrame, by_degree: bool = True) -> int:
    """Number of 4-cliques (K4 motifs) in the undirected simple graph.

    Same curse-of-the-last-reducer treatment as ``triangle_count``
    (Suri & Vassilvitskii WWW'11, extended to K4 a la Finocchi/Finocchi/
    Fusco's clique-counting orientation): orient every undirected edge
    from the (degree, id)-smaller endpoint to the larger, bounding every
    out-neighborhood by O(sqrt(E)). Under a total-order orientation each
    K4 {a,b,c,d} has EXACTLY ONE labeling with a->b, a->c, a->d, b->c,
    b->d, c->d, so the count is join-then-count with no multiplicity
    correction: oriented triangles (x,y,z) extended by a fourth vertex w
    adjacent FROM all three. The count is orientation-invariant, so the
    DuckDB oracle may orient by plain id while the engine orients by
    degree for skew safety."""
    o = _oriented(edges, by_degree).persist()
    o.count()
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    e3 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    # oriented triangles: x->y, x->z, y->z (one row per triangle)
    tris = e1.join(e2, "x").filter(F.col("y") != F.col("z")).join(e3, ["y", "z"]).persist()
    tris.count()
    # extend with w: x->w, y->w, z->w all oriented edges
    xw = o.select(F.col("a").alias("x"), F.col("b").alias("w"))
    yw = o.select(F.col("a").alias("y"), F.col("b").alias("w"))
    zw = o.select(F.col("a").alias("z"), F.col("b").alias("w"))
    k4 = (
        tris.join(xw, "x")
        .join(yw, ["y", "w"])
        .join(zw, ["z", "w"])
        .count()
    )
    tris.unpersist()
    o.unpersist()
    return int(k4)


def four_cycle_count(edges: DataFrame) -> int:
    """Number of 4-cycles (rectangles / C4 subgraphs, chords allowed) in
    the undirected simple graph.

    Vertex-priority counting (Wang, Lin, Zhang & Zhang, VLDB'19
    "Vertex Priority Based Butterfly Counting", generalized from
    bipartite butterflies to rectangles): rank vertices by (degree, id)
    and count every rectangle exactly once AT ITS HIGHEST-PRIORITY
    VERTEX u. A rectangle u-v-w-x with u the strict (degree, id)-max
    contributes the two wedges u-v-w and u-x-w, both with center
    priority < p(u) and far-endpoint priority < p(u); grouping wedges by
    (u, w) and summing C(c, 2) therefore counts each rectangle once via
    its u-side diagonal. The first wedge arm only walks center->HIGHER
    priority (out-degree O(sqrt E) under the orientation, exactly the
    ``triangle_count`` bound), so the wedge join costs
    sum_over_edges(min-degree-side) instead of the naive sum(deg^2) —
    THE difference between feasible and not on a power-law web graph
    where a hub center would otherwise emit deg^2 ~ 10^12 wedges.

    Two shuffles (wedge join on center, wedge-pair aggregate on
    (u, w)) + a scalar aggregate; no iteration. The DuckDB oracle uses
    the independent unoriented identity sum_{u<w} C(cn(u,w), 2) / 2
    (each rectangle seen from both diagonals), so engine and oracle
    share no formulation beyond the definition."""
    adj = (
        edges.select(F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .union(
            edges.select(F.col("dst").cast("long").alias("u"), F.col("src").cast("long").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # priority = (degree, id), compared as a struct on both engines
    pr = deg.select("u", F.struct(F.col("deg"), F.col("u")).alias("p"))
    a = (
        adj.join(pr.withColumnsRenamed({"u": "v", "p": "pv"}), "v")
        .join(pr.withColumnsRenamed({"p": "pu"}), "u")
        .persist()
    )
    a.count()
    # a rows are (center u, neighbor v) with priorities (pu, pv).
    # arm 1: center c -> high endpoint hi, strictly priority-increasing
    up = a.filter(F.col("pv") > F.col("pu")).select(
        F.col("u").alias("c"), F.col("v").alias("hi"), F.col("pv").alias("phi")
    )
    # arm 2: center c -> other endpoint w with p(w) < p(hi)
    dn = a.select(F.col("u").alias("c"), F.col("v").alias("w"), F.col("pv").alias("pw"))
    wedges = up.join(dn, "c").filter(
        (F.col("w") != F.col("hi")) & (F.col("pw") < F.col("phi"))
    )
    out = (
        wedges.groupBy("hi", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.coalesce(
                F.sum((F.col("cnt") * (F.col("cnt") - F.lit(1))) / F.lit(2)), F.lit(0)
            ).cast("long").alias("c4")
        )
        .collect()[0]["c4"]
    )
    a.unpersist()
    return int(out)


def four_node_census(edges: DataFrame) -> DataFrame:
    """One row: induced counts of all six connected 4-vertex subgraphs
    (path4, star3 / claw, cycle4, paw / tailed triangle, diamond,
    clique4) plus the 3-vertex counts (wedges, triangles) for context —
    the ESCAPE counting scheme (Pinar, Seshadhri & Vishal, WWW'17):
    every 4-node count reduces to degree / per-vertex-triangle /
    per-edge-support aggregates plus the rectangle and clique counters,
    so NOTHING with more than 3 vertices is ever enumerated:

      non-induced  N_path4   = sum_edges (d_u-1)(d_v-1) - 3T
                   N_star3   = sum_v C(d_v, 3)
                   N_paw     = sum_v t_v (d_v - 2)
                   N_diamond = sum_edges C(sup_e, 2)
                   N_c4, N_k4 from :func:`four_cycle_count` /
                   :func:`four_clique_count`

    then the subgraph-containment Mobius inversion to induced counts
    (verified against itertools brute force in tests). Scale shape: the
    heaviest pieces are the oriented triangle join (per-edge support +
    per-vertex counts) and the priority-wedge rectangle counter — both
    O(sum over edges of min-degree-side); everything else is degree
    aggregates. The whole census costs ~2x a triangle count."""
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
    und_edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # per-edge triangle support via the oriented wedge join (k_truss shape)
    o = _oriented(und_edges)
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges_o = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    closer = o.select(F.col("a").alias("y"), F.col("b").alias("z")).union(
        o.select(F.col("b").alias("y"), F.col("a").alias("z"))
    )
    tris = wedges_o.join(closer, ["y", "z"]).persist()
    tris.count()
    sup = (
        tris.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .union(tris.select(F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")))
        .union(tris.select(F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    # per-vertex triangle membership from the same enumeration
    tv = (
        tris.select(F.col("x").alias("id"))
        .union(tris.select(F.col("y").alias("id")))
        .union(tris.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    # scalar pieces (each a tiny 1-row frame; combined via crossJoin)
    tri_total = tris.agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    wedge_star = deg.agg(
        F.coalesce(F.sum(F.col("deg") * (F.col("deg") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("wedges"),
        F.coalesce(
            F.sum(F.col("deg") * (F.col("deg") - 1) * (F.col("deg") - 2) / 6), F.lit(0)
        )
        .cast("long")
        .alias("n_star3"),
    )
    paw = (
        deg.join(tv, "id")
        .agg(
            F.coalesce(F.sum(F.col("t") * (F.col("deg") - 2)), F.lit(0))
            .cast("long")
            .alias("n_paw")
        )
    )
    dia = sup.agg(
        F.coalesce(F.sum(F.col("sup") * (F.col("sup") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("n_diamond")
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    mid = und.join(da, "a").join(db, "b")
    path_mid = mid.agg(
        F.coalesce(F.sum((F.col("da") - 1) * (F.col("db") - 1)), F.lit(0))
        .cast("long")
        .alias("mid_pairs")
    )
    n_c4 = four_cycle_count(und_edges)
    n_k4 = four_clique_count(und_edges)
    spark = edges.sparkSession
    quads = spark.createDataFrame([(n_c4, n_k4)], "n_c4 long, n_k4 long")
    out = (
        tri_total.crossJoin(wedge_star)
        .crossJoin(paw)
        .crossJoin(dia)
        .crossJoin(path_mid)
        .crossJoin(quads)
        .select(
            "wedges",
            "triangles",
            # non-induced path4 = mid-edge pairs minus the 3T closed walks
            (F.col("mid_pairs") - 3 * F.col("triangles")).alias("n_path4"),
            "n_star3",
            "n_c4",
            "n_paw",
            "n_diamond",
            "n_k4",
        )
        .select(
            "wedges",
            "triangles",
            # Mobius inversion: induced counts
            (
                F.col("n_path4")
                - 2 * F.col("n_paw")
                - 4 * F.col("n_c4")
                + 6 * F.col("n_diamond")
                - 12 * F.col("n_k4")
            ).cast("long").alias("path4"),
            (
                F.col("n_star3")
                - F.col("n_paw")
                + 2 * F.col("n_diamond")
                - 4 * F.col("n_k4")
            ).cast("long").alias("star3"),
            (F.col("n_c4") - F.col("n_diamond") + 3 * F.col("n_k4"))
            .cast("long")
            .alias("cycle4"),
            (F.col("n_paw") - 4 * F.col("n_diamond") + 12 * F.col("n_k4"))
            .cast("long")
            .alias("paw"),
            (F.col("n_diamond") - 6 * F.col("n_k4")).cast("long").alias("diamond"),
            F.col("n_k4").cast("long").alias("clique4"),
        )
        .localCheckpoint(eager=True)
    )
    tris.unpersist()
    deg.unpersist()
    und.unpersist()
    return out


def five_clique_count(edges: DataFrame, by_degree: bool = True) -> int:
    """Number of K5 motifs — the :func:`four_clique_count` orientation
    chain extended one level (Finocchi et al. clique counting under a
    total-order orientation: each K5 has exactly one fully-oriented
    labeling a->b,c,d,e / b->c,d,e / c->d,e / d->e, so the count is pure
    join-then-count). Large-clique density is the classic link-farm
    fingerprint one step past K4. Out-degrees stay O(sqrt E) under the
    (degree, id) orientation, so the join fan-out is bounded the same
    way; the oracle may orient by plain id (orientation-invariant)."""
    o = _oriented(edges, by_degree).persist()
    o.count()
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    e3 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tris = e1.join(e2, "x").filter(F.col("y") != F.col("z")).join(e3, ["y", "z"])
    xw = o.select(F.col("a").alias("x"), F.col("b").alias("w"))
    yw = o.select(F.col("a").alias("y"), F.col("b").alias("w"))
    zw = o.select(F.col("a").alias("z"), F.col("b").alias("w"))
    quads = tris.join(xw, "x").join(yw, ["y", "w"]).join(zw, ["z", "w"]).persist()
    quads.count()
    xq = o.select(F.col("a").alias("x"), F.col("b").alias("q"))
    yq = o.select(F.col("a").alias("y"), F.col("b").alias("q"))
    zq = o.select(F.col("a").alias("z"), F.col("b").alias("q"))
    wq = o.select(F.col("a").alias("w"), F.col("b").alias("q"))
    k5 = (
        quads.join(xq, "x")
        .join(yq, ["y", "q"])
        .join(zq, ["z", "q"])
        .join(wq, ["w", "q"])
        .count()
    )
    quads.unpersist()
    o.unpersist()
    return int(k5)
