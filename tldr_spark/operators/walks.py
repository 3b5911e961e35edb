"""Deterministic random walks over the edge table — the corpus generator
for graph-embedding training (DeepWalk/node2vec's input stage).

Determinism instead of an RNG: step t of walk (start, k) moves to the
neighbor ranked ``1 + H(start,k,t) mod outdeg(cur)`` where H is the first
32 bits of md5 over 'start-k-t' and neighbors are ranked by dst within each
src. The walk distribution is uniform-per-step like the classic sampler,
but every engine — Spark, the SQL oracle, a NumPy reference — reproduces
the identical walk table bit-for-bit, which is what makes a 10^12-edge walk
corpus auditable.

Shape per step: one join of the frontier against the ranked adjacency
(equi-join on (vertex, rank) — no skew beyond the adjacency's own, since
each walk row matches exactly one edge row). Walks ending on a dangling
vertex terminate early, as in the reference samplers. Lineage truncated per
step.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def _hash32(*cols) -> "F.Column":
    # first 8 md5 hex chars as a non-negative int — identical in DuckDB via
    # CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)
    return F.conv(F.substring(F.md5(F.concat_ws("-", *cols)), 1, 8), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 2,
    starts: DataFrame | None = None,
) -> DataFrame:
    """(start, walk, step, vertex): step 0 is the start vertex; walks stop
    early at vertices with no out-edges. ``starts``: optional (id) DataFrame
    (default: every vertex with at least one out-edge)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("dst")
    adj = e.select("src", "dst", F.row_number().over(w).alias("rn")).persist()
    deg = adj.groupBy("src").agg(F.max("rn").alias("outdeg")).persist()
    adj.count()

    if starts is None:
        starts = deg.select(F.col("src").alias("id"))
    ks = F.explode(F.array(*[F.lit(k) for k in range(walks_per_vertex)])).alias("walk")
    # eagerly checkpointed like every later frame: the returned union must
    # not lazily depend on adj/deg after they are unpersisted below
    state = (
        starts.select(F.col("id").cast("long").alias("start"), ks)
        .select("start", "walk", F.lit(0).alias("step"), F.col("start").alias("vertex"))
        .localCheckpoint(eager=True)
    )

    degj = deg.select(F.col("src").alias("dv"), "outdeg")
    adjj = adj.select(F.col("src").alias("av"), F.col("dst").alias("nxt"), "rn")
    frames = [state]
    for _ in range(walk_length):
        nxt = (
            state.join(degj, state["vertex"] == degj["dv"])
            .withColumn(
                "pick", F.lit(1) + F.pmod(_hash32("start", "walk", "step"), F.col("outdeg"))
            )
            .join(
                adjj,
                (F.col("vertex") == adjj["av"]) & (F.col("pick") == adjj["rn"]),
            )
            .select(
                "start",
                "walk",
                (F.col("step") + 1).alias("step"),
                F.col("nxt").alias("vertex"),
            )
            .localCheckpoint(eager=True)
        )
        frames.append(nxt)
        state = nxt
        if nxt.isEmpty():
            break

    out = reduce(DataFrame.unionByName, frames)
    adj.unpersist()
    deg.unpersist()
    return out


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 2,
    return_w: int = 1,
    in_w: int = 2,
    out_w: int = 4,
    starts: DataFrame | None = None,
) -> DataFrame:
    """(start, walk, step, vertex) — SECOND-ORDER biased walks (node2vec,
    Grover & Leskovec KDD'16) with INTEGER α-weights instead of 1/p, 1, 1/q
    floats: candidate x from cur with predecessor prev weighs

        return_w  if x == prev            (the 1/p return arm)
        in_w      if edge (prev → x)      (the distance-1 arm)
        out_w     otherwise               (the 1/q explore arm)

    and the step picks the neighbor whose cumulative-weight interval (in
    dst order) contains H(start, walk, step) mod total_weight — exact
    integer arithmetic end to end, so Spark, the DuckDB oracle, and a
    Python mirror reproduce the walk table bit-for-bit (same determinism
    contract as :func:`random_walks`; defaults (1, 2, 4) ≈ p=2, q=0.5 —
    the outward/DFS-leaning regime). Step 0→1 has no predecessor: uniform
    (all weights 1), as in the reference sampler.

    Shape per step: frontier ⋈ adjacency (fan-out outdeg) + one LEFT
    equi-join against the edge set for the (prev → x) marker + a
    per-(walk, step) window cumsum over outdeg-sized groups — no
    all-pairs term anywhere; cost ~ walk rows × avg outdeg per step."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .persist()
    )
    e.count()
    if starts is None:
        starts = e.select(F.col("src").alias("id")).distinct()
    ks = F.explode(F.array(*[F.lit(k) for k in range(walks_per_vertex)])).alias("walk")
    state = (
        starts.select(F.col("id").cast("long").alias("start"), ks)
        .select(
            "start",
            "walk",
            F.lit(0).alias("step"),
            F.lit(None).cast("long").alias("prev"),
            F.col("start").alias("vertex"),
        )
        .localCheckpoint(eager=True)
    )
    frames = [state.select("start", "walk", "step", "vertex")]
    cand_e = e.select(F.col("src").alias("cv"), F.col("dst").alias("nxt"))
    mark_e = e.select(
        F.col("src").alias("mp"), F.col("dst").alias("mx"), F.lit(True).alias("mk")
    )
    win = Window.partitionBy("start", "walk", "step")
    for _ in range(walk_length):
        cand = (
            state.join(cand_e, state["vertex"] == cand_e["cv"])
            .join(
                mark_e,
                (F.col("prev") == F.col("mp")) & (F.col("nxt") == F.col("mx")),
                "left",
            )
            .select(
                "start",
                "walk",
                "step",
                "prev",
                "vertex",
                "nxt",
                F.when(F.col("prev").isNull(), F.lit(1))
                .when(F.col("nxt") == F.col("prev"), F.lit(return_w))
                .when(F.col("mk").isNotNull(), F.lit(in_w))
                .otherwise(F.lit(out_w))
                .cast("long")
                .alias("w"),
            )
        )
        picked = (
            cand.select(
                "*",
                F.sum("w").over(win.orderBy("nxt").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
                F.sum("w").over(win).alias("tot"),
            )
            .withColumn("r", F.pmod(_hash32("start", "walk", "step"), F.col("tot")))
            .filter((F.col("cum") - F.col("w") <= F.col("r")) & (F.col("r") < F.col("cum")))
            .select(
                "start",
                "walk",
                (F.col("step") + 1).alias("step"),
                F.col("vertex").alias("prev"),
                F.col("nxt").alias("vertex"),
            )
            .localCheckpoint(eager=True)
        )
        frames.append(picked.select("start", "walk", "step", "vertex"))
        state = picked
        if picked.isEmpty():
            break
    out = reduce(DataFrame.unionByName, frames)
    e.unpersist()
    return out


def walk_pmi_pairs(
    edges: DataFrame,
    window: int = 2,
    walk_length: int = 8,
    walks_per_vertex: int = 2,
    min_count: int = 2,
) -> DataFrame:
    """(u, v, n_uv, pmi) — pointwise mutual information of vertex pairs
    co-occurring within ``window`` steps on the deterministic random walks:
    the DeepWalk/node2vec feature corpus (walk skip-gram co-occurrence)
    reduced to its PMI matrix, which is what the embedding factorizes
    (Levy & Goldberg, NeurIPS 2014).

    pmi = ln( (n_uv/P) / ((n_u/T)·(n_v/T)) ) with T total walk positions,
    P total co-occurrence observations (counted BEFORE the ``min_count``
    filter, so the filter prunes output without re-weighting survivors).

    Scale shape: the pair join is a self-join on the (start, walk) key —
    fan-out bounded by walk_length², a constant — then one hash aggregate;
    marginals are one V-row aggregate. The two corpus scalars ride in as
    literals (they are exact integers, so both engines compute the single
    final division + ln bit-identically)."""
    w = random_walks(edges, walk_length, walks_per_vertex).persist()
    t = w.count()  # total positions (exact int, deterministic)
    a = w.select(
        "start", "walk", F.col("step").alias("sa"), F.col("vertex").alias("va")
    )
    b = w.select(
        "start", "walk", F.col("step").alias("sb"), F.col("vertex").alias("vb")
    )
    prs = (
        a.join(b, ["start", "walk"])
        .filter(
            (F.col("sb") > F.col("sa"))
            & (F.col("sb") <= F.col("sa") + window)
            & (F.col("va") != F.col("vb"))
        )
        .select(F.least("va", "vb").alias("u"), F.greatest("va", "vb").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_uv"))
        .persist()
    )
    p = int(prs.agg(F.coalesce(F.sum("n_uv"), F.lit(0))).collect()[0][0])
    occ = w.groupBy(F.col("vertex")).agg(F.count(F.lit(1)).alias("n"))
    ou = occ.select(F.col("vertex").alias("u"), F.col("n").alias("n_u"))
    ov = occ.select(F.col("vertex").alias("v"), F.col("n").alias("n_v"))
    out = (
        prs.filter(F.col("n_uv") >= min_count)
        .join(ou, "u")
        .join(ov, "v")
        .select(
            "u",
            "v",
            "n_uv",
            F.log(
                F.col("n_uv").cast("double")
                * F.lit(float(t))
                * F.lit(float(t))
                / (F.lit(float(p)) * F.col("n_u") * F.col("n_v"))
            ).alias("pmi"),
        )
    )
    out = out.localCheckpoint(eager=True)
    w.unpersist()
    prs.unpersist()
    return out
