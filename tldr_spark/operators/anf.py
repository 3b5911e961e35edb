"""Approximate Neighborhood Function & effective diameter.

  neighborhood_function   EXACT N(h) = #{(u,v): dist(u,v) <= h} for
                          h = 0..max_h by distinct-pair frontier
                          expansion — O(n·m) state, the small-scale
                          oracle and correctness anchor
  hyper_anf               HyperANF (Boldi, Rosa, Vigna, WWW 2011): one
                          HyperLogLog sketch per vertex of the ball
                          B(v, h), iterated as
                            sketch_{h+1}(v) = sketch_h(v) ∪
                                              ⋃_{(v,w)∈E} sketch_h(w)
                          using Spark's JVM-side Apache DataSketches
                          aggregates (hll_sketch_agg / hll_union_agg) —
                          per-vertex state is a fixed-size sketch
                          (2^lg_k registers), so one iteration is one
                          sketch-shuffle regardless of ball size: the
                          100 TB path to N(h) and effective diameter
  effective_diameter      smallest h with N(h) >= q · N(max_h)
                          (interpolated, q = 0.9 by convention)

The exact operator's reached-set rows explode with the ball sizes (on a
web graph ~n² pairs by h≈6) — it exists to pin the sketch path at test
scale, same pairing as dedup's ngram_jaccard (exact) vs minhash-LSH
(scale). HyperANF's relative error is that of HLL at the chosen lg_k
(~1.04/sqrt(2^lg_k) per vertex, tighter after summing over vertices);
sketches and unions are deterministic (register-wise max), so repeated
runs agree bit-for-bit.

Generalizes the reachability machinery the reference never had — its
pipeline (/root/reference/tldr.go) ranks one document's sentence graph in
memory; distance distributions over 10^12-page crawls need sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _simple_edges(edges: DataFrame, directed: bool) -> DataFrame:
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    return e


def _anf_local(
    edge_rows: list[tuple[int, int]], max_h: int
) -> list[tuple[int, int]]:
    """Exact N(h) by all-sources BFS over a collected edge list.
    Driver-side FINISHER only — callers bound the input."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for s, d in edge_rows:
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    per_h = [0] * (max_h + 1)
    for root in verts:
        dist = {root: 0}
        dq = deque([root])
        per_h[0] += 1
        while dq:
            u = dq.popleft()
            du = dist[u]
            if du >= max_h:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = du + 1
                    per_h[du + 1] += 1
                    dq.append(v)
    # cumulative: N(h) counts pairs at distance <= h
    out, run = [], 0
    for h, c in enumerate(per_h):
        run += c
        out.append((h, run))
    return out


def neighborhood_function(
    edges: DataFrame,
    max_h: int = 8,
    directed: bool = True,
    local_finish_edges: int = 500_000,
) -> DataFrame:
    """(h, n_pairs) for h = 0..max_h — EXACT count of ordered vertex pairs
    (u, v), u's ball including u itself, with dist(u, v) <= h.

    Frontier expansion over distinct (root, v) pairs; each round joins the
    current reached set to the edge list and unions — rows grow with the
    ball sizes, so this is the verification-scale twin of hyper_anf, not
    the production path. LOCAL FINISH: under ``local_finish_edges``
    collected rows, all-sources driver BFS replaces the pair-frontier
    rounds (exact integers, same bounded-driver contract as bfs.py;
    note the pair STATE the distributed path shuffles is O(n·m) — far
    larger than the collected edge list, so the bound is conservative).
    ``local_finish_edges=0`` forces the distributed path."""
    e = _simple_edges(edges, directed)
    if local_finish_edges > 0:
        probe = e.take(local_finish_edges + 1)
        if len(probe) <= local_finish_edges:
            counts = _anf_local([(r["src"], r["dst"]) for r in probe], max_h)
            return edges.sparkSession.createDataFrame(counts, "h int, n_pairs long")
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    reached = verts.select(F.col("v").alias("root"), "v", F.lit(0).alias("h"))
    counts = [(0, reached.count())]
    cur = reached.localCheckpoint(eager=True)
    for h in range(1, max_h + 1):
        nxt = (
            cur.join(e.withColumnRenamed("src", "v"), "v")
            .select("root", F.col("dst").alias("v"), F.lit(h).alias("h"))
            .union(cur)
            .groupBy("root", "v")
            .agg(F.min("h").alias("h"))
            .localCheckpoint(eager=True)
        )
        n = nxt.count()
        counts.append((h, n))
        if n == counts[-2][1]:
            # ball closed early: N(h') = N(h) for all h' > h
            counts.extend((hh, n) for hh in range(h + 1, max_h + 1))
            cur = nxt
            break
        cur = nxt
    spark = edges.sparkSession
    return spark.createDataFrame(counts, "h int, n_pairs long")


def hyper_anf(
    edges: DataFrame, max_h: int = 8, lg_k: int = 12, directed: bool = True
) -> DataFrame:
    """(h, n_pairs_est) for h = 0..max_h via per-vertex HLL ball sketches.

    Iteration h joins each vertex's sketch to its in-edges and unions
    map-side per destination — ONE shuffle of fixed-size sketches per
    round (the groupBy), plus a broadcast-able union with the previous
    state. N(h) = sum over vertices of the sketch estimate.

    Empty edge input returns the zero curve (n_pairs_est = 0.0 for every
    h), matching :func:`neighborhood_function`'s exact-twin behavior —
    the sum aggregate is NULL over zero vertices, so it is coalesced."""
    e = _simple_edges(edges, directed)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )

    def _total(frame: DataFrame) -> float:
        # coalesce: sum() over an empty frame is NULL, not 0
        return float(
            frame.agg(
                F.coalesce(F.sum(F.hll_sketch_estimate("sk")), F.lit(0.0)).alias("n")
            ).collect()[0]["n"]
        )

    # sketch of B(v, 0) = {v}
    sk = verts.groupBy("v").agg(F.hll_sketch_agg("v", F.lit(lg_k)).alias("sk"))
    out = [(0, _total(sk))]
    sk = sk.localCheckpoint(eager=True)
    for h in range(1, max_h + 1):
        # pull neighbor sketches onto the source vertex and union
        nbr = (
            e.join(sk.withColumnRenamed("v", "dst"), "dst")
            .select(F.col("src").alias("v"), "sk")
            .union(sk)
            .groupBy("v")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .localCheckpoint(eager=True)
        )
        est = _total(nbr)
        out.append((h, est))
        sk = nbr
    spark = edges.sparkSession
    return spark.createDataFrame(out, "h int, n_pairs_est double")


def effective_diameter(
    nf: DataFrame, quantile: float = 0.9, count_col: str | None = None
) -> float:
    """Interpolated effective diameter from a neighborhood-function frame
    (exact or estimated): the smallest (fractional) h whose cumulative
    pair count reaches ``quantile`` of the final count (Palmer-Gibbons-
    Faloutsos convention)."""
    col = count_col or [c for c in nf.columns if c != "h"][0]
    rows = sorted((r["h"], float(r[col])) for r in nf.collect())
    total = rows[-1][1]
    target = quantile * total
    prev_h, prev_n = rows[0]
    if prev_n >= target:
        return float(prev_h)
    for h, n in rows[1:]:
        if n >= target:
            # linear interpolation between the straddling rounds
            return prev_h + (target - prev_n) / (n - prev_n)
        prev_h, prev_n = h, n
    return float(rows[-1][0])


def hyperball_harmonic(
    edges: DataFrame, max_h: int = 8, lg_k: int = 12, directed: bool = True
) -> DataFrame:
    """(id, harmonic_est) for EVERY vertex — approximate harmonic
    centrality HC(v) = sum over u reachable from v of 1/dist(v, u) via
    HyperBall (Boldi & Vigna, "In-core computation of geometric
    centralities with HyperBall", ICDMW 2013): with b_h = |B(v, h)|
    estimated from the per-vertex HLL ball sketch,

        HC(v) ~= sum_{h=1..max_h} (b_h - b_{h-1}) / h

    The exact probe-sampled twin is bfs.py's harmonic/closeness pair —
    THIS is the all-vertex scale path: per-round cost is one fixed-size
    sketch shuffle exactly like :func:`hyper_anf` (whose global N(h)
    curve is the vertex-sum of these balls), so 10^12 vertices cost
    O(V · 2^lg_k) state per round regardless of ball growth. Estimates
    are deterministic (register-wise max unions). Negative per-round
    deltas (possible when HLL estimates wobble a vertex's ball slightly
    downward between rounds) are clamped at 0 so the centrality is
    monotone in h."""
    e = _simple_edges(edges, directed)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    sk = (
        verts.groupBy("v")
        .agg(F.hll_sketch_agg("v", F.lit(lg_k)).alias("sk"))
        .select("v", "sk", F.hll_sketch_estimate("sk").alias("b"))
        .localCheckpoint(eager=True)
    )
    harm = sk.select("v", F.lit(0.0).alias("harmonic_est"), "b")
    for h in range(1, max_h + 1):
        nbr = (
            e.join(sk.select(F.col("v").alias("dst"), "sk"), "dst")
            .select(F.col("src").alias("v"), "sk")
            .union(sk.select("v", "sk"))
            .groupBy("v")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .select("v", "sk", F.hll_sketch_estimate("sk").alias("b"))
            .localCheckpoint(eager=True)
        )
        harm = (
            harm.select("v", "harmonic_est", F.col("b").alias("b_prev"))
            .join(nbr.select("v", "b"), "v")
            .select(
                "v",
                (
                    F.col("harmonic_est")
                    + F.greatest(F.col("b") - F.col("b_prev"), F.lit(0.0)) / h
                ).alias("harmonic_est"),
                "b",
            )
            .localCheckpoint(eager=True)
        )
        sk = nbr
    return harm.select(F.col("v").alias("id"), "harmonic_est")
