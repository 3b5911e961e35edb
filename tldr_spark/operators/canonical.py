"""Canonical-link / redirect chain resolution by pointer doubling.

A crawler must resolve every URL through its chain of redirects /
rel=canonical pointers before dedup, indexing, or rank aggregation —
and, like real crawlers (and RFC-era HTTP clients), it gives up after a
fixed hop budget (Googlebot and curl both default to ~5-10; we use 8).
Each page has at most ONE canonical successor, so the canonical map is a
functional graph: chains ending at a terminal page (no canonical
out-pointer), plus cycles, which can never resolve.

Reference semantics scope: didasy/tldr has no graph-chase primitive
(its pipeline is per-document, ``tldr.go:Summarize``); this is one of
the web-crawl operators a 100-TB link-graph pipeline needs on top.

The canonical successor is derived deterministically from the weighted
link graph: ``canon(src) = argmax_w out-edge, ties to the smallest
dst`` over multi-edge-collapsed weights — integer-exact and therefore
bit-reproducible in the DuckDB oracle.

Scale design — POINTER DOUBLING, not step-by-step chasing:
  naive chase        : ``max_hops`` sequential hash joins (8 shuffles)
  pointer doubling   : ``log2(max_hops)`` compose rounds (3 shuffles)
Each round composes the pointer map with itself: a vertex whose pointer
has advanced 2^r hops looks up where THAT vertex's pointer advanced its
own 2^r hops, giving 2^(r+1). All state is one row per vertex
(v, ptr, hops, done) — no frontier blow-up, no per-vertex lists; the
round is one self-equi-join + no aggregate, fully whole-stage-codegen.
At web scale (10^10 URLs, hop cap 16-32) the round count stays 4-5
where the naive chase pays 16-32 full-table shuffles.

Semantics (exact, matched by the SQL oracle's literal 8-step walk):
  * terminal v (no canonical out-edge): resolves to itself, 0 hops.
  * chain of length L <= max_hops to a terminal: resolves, hops = L.
  * longer chains and cycles: unresolved; ``resolved_dst`` is the page
    reached after exactly ``max_hops`` canonical steps.
``max_hops`` must be a power of two (the doubling rounds land on it
exactly, so the cap needs no mid-round clamping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_map(edges: DataFrame) -> DataFrame:
    """(v, ptr): each source's single canonical successor — the max-weight
    collapsed out-edge, ties broken to the smallest dst. One aggregate
    pair (collapse + argmax), no window."""
    w = (
        edges.select("src", "dst", "weight")
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    # max of (w, -dst) == max w, then min dst: one map-combinable agg.
    return (
        w.groupBy("src")
        .agg(F.max(F.struct(F.col("w"), (-F.col("dst")).alias("nd"))).alias("m"))
        .select(F.col("src").alias("v"), (-F.col("m.nd")).alias("ptr"))
    )


def resolve_canonical_chains(
    edges: DataFrame, max_hops: int = 8, canon: DataFrame | None = None
) -> DataFrame:
    """(src, resolved_dst, hops, resolved) for EVERY vertex of the graph.

    ``resolved=1`` when a terminal page was reached within ``max_hops``
    canonical steps (hops = exact chain length, 0 for terminals);
    ``resolved=0`` for longer chains and cycles (hops = max_hops,
    resolved_dst = the page reached after exactly max_hops steps).
    """
    if max_hops < 1 or max_hops & (max_hops - 1):
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    if canon is None:
        canon = canonical_map(edges)

    verts = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    # g: v -> (ptr, hops-advanced, done). Terminals are their own fixed
    # point with 0 hops, which makes composition uniform (a lookup that
    # lands on a terminal finishes the chain without a special case).
    g = verts.join(canon, "v", "left").select(
        "v",
        F.coalesce("ptr", "v").alias("ptr"),
        F.when(F.col("ptr").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("hops"),
        F.col("ptr").isNull().alias("done"),
    )

    rounds = max_hops.bit_length() - 1  # max_hops = 2**rounds
    for _ in range(rounds):
        nxt = g.select(
            F.col("v").alias("j_v"),
            F.col("ptr").alias("j_ptr"),
            F.col("hops").alias("j_hops"),
            F.col("done").alias("j_done"),
        )
        g = (
            g.join(nxt, g["ptr"] == nxt["j_v"], "left")
            .select(
                "v",
                F.when(F.col("done"), F.col("ptr"))
                .otherwise(F.col("j_ptr"))
                .alias("ptr"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.col("j_hops"))
                .alias("hops"),
                F.when(F.col("done"), F.lit(True))
                .otherwise(F.col("j_done"))
                .alias("done"),
            )
            .localCheckpoint(eager=False)  # 3 rounds: keep lineage flat
        )

    # The done flag lags one compose behind the position (a row that lands
    # ON the terminal learns it only by composing with the terminal's
    # 0-hop self-entry next round), so a chain of length exactly max_hops
    # ends done=false. Final terminal check closes the lag: resolved =
    # done OR the reached page has no canonical out-pointer. Non-done
    # rows sit at exactly 2**rounds = max_hops steps, so their hops are
    # already exact when that position happens to be terminal.
    term = canon.select(F.col("v").alias("t_v"))
    return (
        g.join(term, g["ptr"] == term["t_v"], "left")
        .select(
            F.col("v").alias("src"),
            F.col("ptr").alias("resolved_dst"),
            F.col("hops").cast("long").alias("hops"),
            (F.col("done") | F.col("t_v").isNull()).cast("long").alias("resolved"),
        )
    )
