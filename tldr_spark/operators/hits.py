"""HITS (Kleinberg 1999): hub/authority scores — the second classic
eigenvector pair of link analysis, same iterative-SpMV skeleton as PageRank.

    auth(v) ∝ Σ_{u→v} hub(u)        (one groupBy(dst) shuffle)
    hub(u)  ∝ Σ_{u→v} auth(v)       (one groupBy(src) shuffle)

L1 normalization (scores sum to 1) instead of Kleinberg's L2 — same
fixpoint direction, but the normalizer is a plain SUM, which keeps the SQL
oracle free of sqrt() and its cross-engine last-ulp noise.

Normalization is DEFERRED to the end (round-2): every half-step is linear
and L1-normalizing is scale-invariant, so dividing once at the output is
mathematically identical to dividing every half-step — and it deletes two
normalizer broadcast-exchange jobs per round (the per-round fixed overhead
that dominates wall time on small graphs and caps scaling on big ones,
same Amdahl argument as the PageRank teleport fusion). Unnormalized
magnitudes grow by at most (max_in_degree x max_out_degree) per round; a
safety renormalization of the carried hub vector fires every
``_RENORM_EVERY`` rounds so even degree-1e9 graphs stay far from the
float64 ceiling. The driver-contract oracle mirrors the deferred
arithmetic exactly. Fixed iteration count; lineage truncated per round
via lazy localCheckpoint.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class HitsResult:
    scores: DataFrame  # (id: long, hub: double, auth: double)
    iterations: int


# safety renormalization cadence for the deferred-normalization loop (see
# module doc) — L1 starts at 1 and grows by <= max_in_degree*max_out_degree
# per round, so 16 deferred rounds stay under (1e18)^16 ~ 1e288 even for a
# degree-1e9-by-1e9 pathological graph; float64 tops out at 1.8e308. The
# common fixed-10 call therefore never renormalizes mid-run, keeping its
# arithmetic bit-comparable to the driver oracle's deferred CTE chain.
_RENORM_EVERY = 16


def hits(edges: DataFrame, iterations: int = 10, broadcast_scores: bool = True) -> HitsResult:
    """(id, hub, auth) after ``iterations`` rounds on the DISTINCT directed
    edge set (HITS is unweighted)."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).distinct().persist()
    e.count()

    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        spark = edges.sparkSession
        e.unpersist()
        verts.unpersist()
        return HitsResult(spark.createDataFrame([], "id long, hub double, auth double"), 0)

    if iterations < 1:
        scores = verts.select(
            "id", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
        ).localCheckpoint(eager=True)
        e.unpersist()
        verts.unpersist()
        return HitsResult(scores, 0)

    # SPARSE state between half-steps: a vertex with no out-edges contributes
    # nothing to the next auth aggregate (its hub enters no join row) and a
    # vertex with no in-edges likewise for hub — so only vertices that appear
    # on the contributing side are carried, and the zero-score rows are
    # materialized ONCE at the end. This removes the two per-round
    # zero-filling merge joins of the naive formulation (measured ~1.5x at
    # sf0.1) and shrinks both per-round shuffles to the active vertex sets.
    hub = verts.join(e.select(F.col("src").alias("id")).distinct(), "id", "left_semi").select(
        "id", F.lit(1.0 / n).alias("hub")
    ).persist()

    auth = None
    old_auth = None
    for i in range(iterations):
        h = F.broadcast(hub) if broadcast_scores else hub
        # UNNORMALIZED half-steps (see module doc): auth then hub
        auth = (
            h.join(e, h["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("auth"))
            .localCheckpoint(eager=False)
            .persist()
        )
        a = F.broadcast(auth) if broadcast_scores else auth
        new_hub = (
            a.join(e, a["id"] == e["dst"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("hub"))
        )
        if (i + 1) % _RENORM_EVERY == 0 and i + 1 < iterations:
            # overflow guard only — mathematically a no-op (scale cancels
            # in the final normalization); costs one extra 1-row broadcast
            t = new_hub.agg(F.sum("hub").alias("t"))
            new_hub = new_hub.crossJoin(F.broadcast(t)).select(
                "id", (F.col("hub") / F.col("t")).alias("hub")
            )
        new_hub = new_hub.localCheckpoint(eager=False).persist()
        new_hub.count()  # materializes this round's auth checkpoint too
        hub.unpersist()
        hub = new_hub
        # the previous round's auth was consumed by this round's hub step;
        # only the FINAL auth is read again (in the output join)
        if old_auth is not None:
            old_auth.unpersist()
        old_auth = auth

    # single deferred L1 normalization of both vectors, then checkpoint the
    # result and release every intermediate (verts, the final hub/auth
    # round frames, the edge set) — a long-lived session calling operators
    # repeatedly must not accumulate cached blocks
    th = hub.agg(F.sum("hub").alias("th"))
    ta = auth.agg(F.sum("auth").alias("ta"))
    scores = (
        verts.join(hub, "id", "left")
        .join(auth, "id", "left")
        .crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(ta))
        .select(
            "id",
            (F.coalesce("hub", F.lit(0.0)) / F.col("th")).alias("hub"),
            (F.coalesce("auth", F.lit(0.0)) / F.col("ta")).alias("auth"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    verts.unpersist()
    hub.unpersist()
    auth.unpersist()  # old_auth is this same frame after the final round
    return HitsResult(scores, iterations)


def eigenvector_centrality(
    edges: DataFrame,
    iterations: int = 20,
    weight_col: str | None = None,
    broadcast_scores: bool = True,
) -> DataFrame:
    """Eigenvector centrality by power iteration — the bare eigenvector
    core that the reference's LexRank/PageRank machinery is built on
    (tldr.go:233-243 without damping/teleport):

        x_{t+1}(v) = sum over in-edges u->v of w(u,v) * x_t(u),

    L1-normalized. Returns (id, score) over all endpoint vertices after a
    FIXED ``iterations`` (fixed count, not tolerance: without teleport the
    iteration can oscillate on bipartite-ish structure, and the
    driver-contract oracle mirrors a fixed unrolled chain). Same deferred-
    normalization discipline as :func:`hits` — unnormalized half-steps,
    safety renormalization every ``_RENORM_EVERY`` rounds, one divide at
    the output; vertices unreachable from any cycle decay to score 0.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col and weight_col in edges.columns
        else F.lit(1.0)
    )
    e = (
        edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), w.alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    e.count()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        spark = edges.sparkSession
        e.unpersist()
        verts.unpersist()
        return spark.createDataFrame([], "id long, score double")

    x = verts.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_semi"
    ).select("id", F.lit(1.0 / n).alias("x")).persist()
    for i in range(iterations):
        h = F.broadcast(x) if broadcast_scores else x
        new_x = (
            h.join(e, h["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("x") * F.col("w")).alias("x"))
        )
        if (i + 1) % _RENORM_EVERY == 0 and i + 1 < iterations:
            t = new_x.agg(F.sum("x").alias("t"))
            new_x = new_x.crossJoin(F.broadcast(t)).select(
                "id", (F.col("x") / F.col("t")).alias("x")
            )
        new_x = new_x.localCheckpoint(eager=False).persist()
        new_x.count()
        x.unpersist()
        x = new_x

    t = x.agg(F.sum("x").alias("t"))
    out = (
        verts.join(x, "id", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "id",
            F.when(F.col("t") > 0.0, F.coalesce("x", F.lit(0.0)) / F.col("t"))
            .otherwise(0.0)
            .alias("score"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    verts.unpersist()
    x.unpersist()
    return out


def salsa(edges: DataFrame, iterations: int = 10, broadcast_scores: bool = True) -> HitsResult:
    """SALSA (Lempel & Moran, WWW'00): the random-walk-normalized HITS —
    each half-step divides contributions by the contributor's degree, so
    every step applies a STOCHASTIC matrix and the score vectors stay
    L1=1 by construction: no normalizer aggregate at all, zero per-round
    fixed overhead beyond the two degree-weighted SpMV aggregates.

        auth(v) = sum over u->v of hub(u)  / out_degree(u)
        hub(u)  = sum over u->v of auth(v) / in_degree(v)

    Degrees are baked into the persisted edge table once
    (wa = 1/outdeg(src), wh = 1/indeg(dst)); fixed ``iterations``.
    Returns (id, hub, auth) over all endpoint vertices — SALSA's known
    fixpoint concentrates authority proportional to in-degree within each
    connected authority component, which the tests assert.
    """
    g = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).distinct()
    outd = g.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ind = g.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    e = (
        g.join(outd, "src")
        .join(ind, "dst")
        .select("src", "dst", (1.0 / F.col("od")).alias("wa"), (1.0 / F.col("idg")).alias("wh"))
        .persist()
    )
    e.count()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        spark = edges.sparkSession
        e.unpersist()
        verts.unpersist()
        return HitsResult(spark.createDataFrame([], "id long, hub double, auth double"), 0)

    hub = verts.join(
        e.select(F.col("src").alias("id")).distinct(), "id", "left_semi"
    ).select("id", F.lit(1.0 / n).alias("hub")).persist()

    auth = None
    old_auth = None
    for _ in range(iterations):
        h = F.broadcast(hub) if broadcast_scores else hub
        auth = (
            h.join(e, h["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("hub") * F.col("wa")).alias("auth"))
            .localCheckpoint(eager=False)
            .persist()
        )
        a = F.broadcast(auth) if broadcast_scores else auth
        new_hub = (
            a.join(e, a["id"] == e["dst"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("auth") * F.col("wh")).alias("hub"))
            .localCheckpoint(eager=False)
            .persist()
        )
        new_hub.count()
        hub.unpersist()
        hub = new_hub
        if old_auth is not None:
            old_auth.unpersist()
        old_auth = auth

    scores = (
        verts.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    verts.unpersist()
    hub.unpersist()
    auth.unpersist()
    return HitsResult(scores, iterations)
