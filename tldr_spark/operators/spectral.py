"""Spectral graph bipartition via deflated power iteration on the
shifted Laplacian — the classic "second eigenvector" cut (Fiedler 1973),
generalizing the reference's power-iteration eigenvector core
(tldr.go:233-243 ranks vertices by the DOMINANT eigenvector; here the
SUB-dominant eigenvector of L partitions them).

For the undirected simple graph G (symmetrized, deduplicated edge set)
with Laplacian L = D - A, iterate on M = cI - L with c = 2 * max_deg
(so M is PSD and its top eigenvector is the all-ones vector, eigenvalue
c). Deflating the ones vector — subtracting the mean after every
multiply — makes the iteration converge to the eigenvector of L's
SMALLEST non-trivial eigenvalue: on a disconnected graph that is a
component-indicator combination (the zero eigenspace, i.e. the cut with
zero crossing edges — the true spectral optimum); on a connected graph
it is the Fiedler vector. A FIXED iteration count (no tolerance) keeps
the arithmetic chain identical to the driver oracle's unrolled SQL.

One multiply is:  y(v) = (c - deg(v)) * x(v) + sum_{u ~ v} x(u)
then deflate:     x'   = y - mean(y)

Spark shape (mirrors operators/hits.py:eigenvector_centrality): the
neighbor sum is one equi-join of the score frame against the adjacency
list plus a map-side-combined groupBy(v) — the same SpMV shape as one
PageRank round, one shuffle per iteration; (c - deg) * x rides on the
degree frame join; the deflation mean is a 1-row broadcast. Scores are
left unnormalized between rounds (values grow ~c per round; 12 rounds
at web-scale degrees stay far inside double range) with a single
max-abs normalization at the output, so both engines run a pure
deferred-arithmetic chain. Deterministic init x0(v) = Knuth-hash(v)
centered — integer arithmetic, reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_H_MULT = 2654435761  # Knuth multiplicative hash constant
_H_MOD = 1000003


def _undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected simple edges as canonical (a < b) pairs."""
    a = F.least(F.col("src"), F.col("dst")).cast("long")
    b = F.greatest(F.col("src"), F.col("dst")).cast("long")
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(a.alias("a"), b.alias("b"))
        .distinct()
    )


def fiedler_vector(
    edges: DataFrame,
    iterations: int = 12,
    broadcast_scores: bool = True,
) -> DataFrame:
    """(id, f) — the deflated power-iteration approximation of the
    sub-dominant Laplacian eigenvector after a fixed ``iterations``
    rounds, max-abs-normalized to [-1, 1]. Empty graph -> empty frame.
    """
    und = _undirected(edges)
    adj = (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .union(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
        .persist()
    )
    deg = adj.groupBy(F.col("v").alias("id")).agg(F.count(F.lit(1)).alias("deg")).persist()
    row = deg.agg(F.max("deg").alias("md"), F.count(F.lit(1)).alias("n")).collect()
    if not row or row[0]["md"] is None:
        adj.unpersist()
        deg.unpersist()
        return edges.sparkSession.createDataFrame([], "id long, f double")
    c = 2 * int(row[0]["md"])
    n = int(row[0]["n"])

    # pre-reduce the id mod _H_MOD before multiplying: (id % p) * M stays
    # <= (p-1) * M ~ 2.7e15, safely inside int64, while id * M wraps for
    # ids >= ~3.5e9 (web-scale id domains) — and by modular arithmetic
    # ((id % p) * M) % p == (id * M) % p, so the values are unchanged.
    # The DuckDB oracle applies the identical pre-reduction (ADVICE r4).
    h = ((F.col("id") % _H_MOD) * _H_MULT) % _H_MOD
    x = deg.select("id", h.cast("double").alias("x"))
    m0 = x.agg((F.sum("x") / n).alias("m"))
    x = (
        x.crossJoin(F.broadcast(m0))
        .select("id", (F.col("x") - F.col("m")).alias("x"))
        .persist()
    )
    x.count()

    for _ in range(iterations):
        xs = F.broadcast(x) if broadcast_scores else x
        nbr = (
            xs.join(adj, xs["id"] == adj["u"])
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("x").alias("sx"))
        )
        y = (
            deg.join(x, "id")
            .join(nbr, "id", "left")
            .select(
                "id",
                (
                    (F.lit(c) - F.col("deg")) * F.col("x")
                    + F.coalesce(F.col("sx"), F.lit(0.0))
                ).alias("y"),
            )
        )
        m = y.agg((F.sum("y") / n).alias("m"))
        new_x = (
            y.crossJoin(F.broadcast(m))
            .select("id", (F.col("y") - F.col("m")).alias("x"))
            .localCheckpoint(eager=False)
            .persist()
        )
        new_x.count()
        x.unpersist()
        x = new_x

    norm = x.agg(F.max(F.abs(F.col("x"))).alias("nrm"))
    out = x.crossJoin(F.broadcast(norm)).select(
        "id",
        F.when(F.col("nrm") > 0, F.col("x") / F.col("nrm"))
        .otherwise(F.lit(0.0))
        .alias("f"),
    )
    adj.unpersist()
    deg.unpersist()
    return out


def spectral_cut_stats(edges: DataFrame, iterations: int = 12) -> DataFrame:
    """1-row quality summary of the sign cut of :func:`fiedler_vector`:
    (n_pos, n_neg, cut_edges, vol_pos, vol_neg, conductance). Side is
    f > 0; volumes are undirected-degree sums per side; conductance =
    cut / min(vol) (NULL when a side is empty). One edge join against
    the side assignment + two tiny aggregates."""
    f = fiedler_vector(edges, iterations)
    side = f.select("id", (F.col("f") > 0).cast("int").alias("side")).persist()
    und = _undirected(edges).persist()
    adj = und.select(F.col("a").alias("v")).union(und.select(F.col("b").alias("v")))
    deg = adj.groupBy(F.col("v").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    is_pos = (F.col("side") == 1).cast("long")
    is_neg = (F.col("side") == 0).cast("long")
    vols = side.join(deg, "id").agg(
        F.coalesce(F.sum(is_pos), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum(is_neg), F.lit(0)).alias("n_neg"),
        F.coalesce(F.sum(is_pos * F.col("deg")), F.lit(0)).alias("vol_pos"),
        F.coalesce(F.sum(is_neg * F.col("deg")), F.lit(0)).alias("vol_neg"),
    )
    sa = side.select(F.col("id").alias("a"), F.col("side").alias("side_a"))
    sb = side.select(F.col("id").alias("b"), F.col("side").alias("side_b"))
    cut = (
        und.join(sa, "a")
        .join(sb, "b")
        .agg(
            F.coalesce(
                F.sum((F.col("side_a") != F.col("side_b")).cast("long")), F.lit(0)
            ).alias("cut_edges")
        )
    )
    out = (
        cut.crossJoin(F.broadcast(vols))
        .select(
            "n_pos",
            "n_neg",
            "cut_edges",
            "vol_pos",
            "vol_neg",
            F.when(
                F.least(F.col("vol_pos"), F.col("vol_neg")) > 0,
                F.col("cut_edges")
                / F.least(F.col("vol_pos"), F.col("vol_neg")).cast("double"),
            ).alias("conductance"),
        )
    )
    side.unpersist()
    und.unpersist()
    return out


def spectral_radius_estimate(
    edges: DataFrame,
    iterations: int = 12,
    broadcast_scores: bool = True,
) -> DataFrame:
    """1-row (lambda_est, xdotx_scale) — Rayleigh-quotient estimate of the
    adjacency spectral radius after a fixed power-iteration count:

        lambda ~= (x_{t+1} . x_t) / (x_t . x_t)

    over the directed multigraph adjacency (duplicate edges sum, as in
    the reference's PageRank Link contract). The spectral radius bounds
    epidemic/cascade thresholds (1/lambda) and the convergence rate of
    every power-iteration operator in this engine, so it is the cheap
    a-priori "how many iterations will PageRank-family ops need" probe.

    Same SpMV shape as eigenvector_centrality: one edge join + one
    map-side-combined groupBy per round, scores broadcast when small;
    no renormalization (raw deferred arithmetic mirrors the unrolled SQL
    oracle), one extra half-step and two tiny dot-product aggregates at
    the end."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        e.unpersist()
        verts.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "lambda_est double, xdotx_scale double"
        )
    x = verts.select("id", F.lit(1.0 / n).alias("x")).persist()
    x.count()
    for _ in range(iterations):
        xs = F.broadcast(x) if broadcast_scores else x
        new_x = (
            xs.join(e, xs["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("x") * F.col("w")).alias("x"))
            .localCheckpoint(eager=False)
            .persist()
        )
        new_x.count()
        x.unpersist()
        x = new_x
    xs = F.broadcast(x) if broadcast_scores else x
    nxt = (
        xs.join(e, xs["id"] == e["src"])
        .groupBy(F.col("dst").alias("id"))
        .agg(F.sum(F.col("x") * F.col("w")).alias("x2"))
    )
    out = (
        x.join(nxt, "id", "left")
        .agg(
            F.sum(F.col("x") * F.coalesce(F.col("x2"), F.lit(0.0))).alias("num"),
            F.sum(F.col("x") * F.col("x")).alias("den"),
        )
        .select(
            F.when(F.col("den") > 0, F.col("num") / F.col("den")).alias("lambda_est"),
            F.col("den").alias("xdotx_scale"),
        )
    )
    e.unpersist()
    verts.unpersist()
    return out
