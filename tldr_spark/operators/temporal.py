"""Temporal (time-respecting) reachability over the event stream.

Two pieces:

* :func:`clickstream_edges` — the standard clickstream derivation: per
  user, events ordered by (ts, event_id) yield a directed temporal edge
  prev_page → page stamped with the arrival event's time. This is the
  temporal twin of the static edge builder (sources/tables.py): same
  synthetic page mapping ``(event_id*131+7) % 211`` the streaming
  queries use.
* :func:`earliest_arrival` — single/multi-source EARLIEST-ARRIVAL
  reachability: a temporal path must traverse edges with non-decreasing
  timestamps (you cannot ride a click that happened before you arrived);
  arrival(v) = the smallest time any time-respecting path from the seed
  set reaches v (Wu et al., VLDB'14 one-pass semantics, here as
  synchronous Bellman-Ford-style relaxation). Link-graph use: influence
  /contagion cones in navigation sessions, cache-warmup ordering, and
  "could this page have been reached after the seed changed?"
  provenance questions.

Scale shape: one equi-join of the V-row arrival frame against the
temporal edge table per round (the ``t >= arr`` residual rides the hash
join), one partial-aggregated min per dst, convergence by an O(1)
improvement count; rounds = temporal hop depth of the seed cone.
Deterministic: min-aggregates only.

Reference parity note: the reference (didasy/tldr) has no temporal
operators; this extends the engine along the event-stream axis the
events table carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window


def clickstream_edges(events: DataFrame, sample_mod: int | None = None) -> DataFrame:
    """(src, dst, t) — per-user consecutive page transitions; t = epoch
    microseconds of the ARRIVING event; self-transitions dropped.
    ``sample_mod`` keeps only events with event_id % sample_mod == 0
    (deterministic thinning shared with the SQL oracle)."""
    e = events
    if sample_mod is not None:
        e = e.filter(F.col("event_id") % sample_mod == 0)
    e = e.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 131 + 7) % 211).alias("page"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev", F.lag("page").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("page")))
        .select(
            F.col("prev").cast("long").alias("src"),
            F.col("page").cast("long").alias("dst"),
            # parquet ts arrives TIMESTAMP_NTZ; the session TZ is pinned
            # UTC (session.py) so this cast matches DuckDB's naive epoch_us
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
    )


LATEST_SENTINEL = 1 << 62  # targets: depart whenever you like


def latest_departure(
    tedges: DataFrame, targets: DataFrame, max_rounds: int = 100
) -> DataFrame:
    """(id, departure_us) — the LATEST time a walk may leave each vertex
    and still reach the target set along non-decreasing timestamps (the
    backward dual of :func:`earliest_arrival`): ld(v) = max over edges
    (v, u, t) with t ≤ ld(u) of t; targets report LATEST_SENTINEL.
    Unreachable-from vertices are omitted."""
    te = tedges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("t").cast("long")
    ).persist()
    ld = (
        targets.select(F.col("id").cast("long"))
        .distinct()
        .select("id", F.lit(LATEST_SENTINEL).cast("long").alias("ld"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        cand = (
            ld.join(te, ld["id"] == te["dst"])
            .filter(F.col("t") <= F.col("ld"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.max("t").alias("cand"))
        )
        merged = (
            ld.join(cand, "id", "full_outer")
            .select(
                "id",
                F.greatest(
                    F.coalesce("ld", F.lit(-1)), F.coalesce("cand", F.lit(-1))
                ).alias("new"),
                "ld",
            )
            .localCheckpoint(eager=True)
        )
        improved = (
            merged.filter(F.col("ld").isNull() | (F.col("new") > F.col("ld")))
            .limit(1)
            .count()
        )
        ld = merged.select("id", F.col("new").alias("ld"))
        if improved == 0:
            break
    else:
        raise RuntimeError(f"latest_departure did not converge in {max_rounds} rounds")
    te.unpersist()
    return ld.select("id", F.col("ld").alias("departure_us"))


def earliest_arrival(
    tedges: DataFrame, sources: DataFrame, max_rounds: int = 100
) -> DataFrame:
    """(id, arrival_us) — earliest time-respecting arrival from the seed
    set over temporal edges (src, dst, t). Seeds report -1 (they are
    reached before every timestamp); unreachable vertices are omitted."""
    te = tedges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("t").cast("long")
    ).persist()
    arr = (
        sources.select(F.col("id").cast("long"))
        .distinct()
        .select("id", F.lit(-1).cast("long").alias("arr"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        cand = (
            arr.join(te, arr["id"] == te["src"])
            .filter(F.col("t") >= F.col("arr"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("t").alias("cand"))
        )
        merged = (
            arr.join(cand, "id", "full_outer")
            .select(
                "id",
                F.least(
                    F.coalesce("arr", F.lit(2**62)), F.coalesce("cand", F.lit(2**62))
                ).alias("new"),
                "arr",
            )
            .localCheckpoint(eager=True)
        )
        improved = (
            merged.filter(F.col("arr").isNull() | (F.col("new") < F.col("arr")))
            .limit(1)
            .count()
        )
        arr = merged.select("id", F.col("new").alias("arr"))
        if improved == 0:
            break
    else:
        raise RuntimeError(f"earliest_arrival did not converge in {max_rounds} rounds")
    te.unpersist()
    return arr.select("id", F.col("arr").alias("arrival_us"))
