"""Gap-based sessionization over an event stream — the canonical
behavioral-analytics operator (and the batch twin of Structured
Streaming's session windows).

A session is a maximal run of one user's events where consecutive gaps
stay within ``gap``: break where ts − lag(ts) > gap, then session ordinal
= running sum of breaks. Both steps are ONE user-partitioned sort window —
a single shuffle on user_id, with per-user state that never leaves the
executor. At 100 TB the shuffle key is the user id; power-user skew is the
classic hazard, and the honest ceiling is the largest single user's event
count (a window must see its whole partition key — AQE cannot split it),
which is millions of rows on one executor at worst: linear state, unlike
graph hubs that fan out quadratically.

All time arithmetic is in integer MICROSECONDS (Spark ``unix_micros`` /
DuckDB ``epoch_us``) — exact BIGINTs end to end, so no truncation or
rounding semantics can diverge across engines. Session ids are
(user_id, session_seq) pairs — deterministic, dense per user; never a
global monotonically_increasing_id (partition-layout-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Input rows + ``ts_us`` (epoch microseconds) + ``session_seq``
    (1-based per-user session ordinal). Rows with equal timestamps land in
    the same session regardless of their relative window order (their gap
    is 0), so the assignment is total-order-independent.

    Raises on an input that already carries a ``ts_us`` or ``session_seq``
    column — silently clobbering a caller column would corrupt downstream
    joins (ADVICE r3)."""
    for c in ("ts_us", "session_seq"):
        if c in events.columns:
            raise ValueError(
                f"sessionize: input already has a {c!r} column — rename it; "
                "the output adds ts_us and session_seq"
            )
    # cast handles TIMESTAMP_NTZ sources: NTZ→TZ interprets in the session
    # zone, which session.py pins to UTC — identical to DuckDB's epoch_us
    # over a naive timestamp
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy("ts_us")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    brk = F.when(gap.isNull() | (gap > int(gap_seconds) * 1_000_000), 1).otherwise(0)
    return (
        events.withColumn("ts_us", ts_us)
        .withColumn(
            "session_seq",
            F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_seq, n_events, start_us, end_us, duration_us,
    n_event_types) per session — epochs as exact BIGINT microseconds."""
    s = sessionize(events, gap_seconds, user_col, ts_col)
    agg = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    ]
    if "event_type" in events.columns:
        agg.append(F.count_distinct("event_type").alias("n_event_types"))
    out = s.groupBy(F.col(user_col).alias("user_id"), F.col("session_seq")).agg(*agg)
    return out.withColumn(
        "duration_us", (F.col("end_us") - F.col("start_us")).cast("long")
    )


def session_transitions(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(from_type, to_type, n_transitions, p) — the first-order Markov
    transition estimate over within-session consecutive event pairs
    (session-bounded, so the cross-session silence never counts as a
    transition). p = n / Σ n over from_type, the row-normalized chain.

    Determinism: consecutive pairs are taken over the TOTAL order
    (ts_us, event_id) — equal timestamps alone would make the pairing
    engine-dependent. Cost: the same single user-partitioned sort window
    as sessionize + one (from,to) hash aggregate; the type-pair result is
    |types|² rows at most."""
    s = sessionize(events, gap_seconds, user_col, ts_col)
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    nxt = (
        s.withColumn("to_type", F.lead(type_col).over(w))
        .withColumn("to_session", F.lead("session_seq").over(w))
        .filter(F.col("to_session") == F.col("session_seq"))
    )
    counts = (
        nxt.groupBy(F.col(type_col).alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.col("n_transitions").cast("double") / F.col("n_from")).alias("p"),
    )


def transition_entropy(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(from_type, n_from, n_targets, entropy_bits) — per-state Shannon
    entropy of the session Markov chain's outgoing distribution: how
    PREDICTABLE the next event is from each state (0 bits = determinism,
    log2(|types|) = uniform chaos). The behavioral-predictability
    counterpart of :func:`session_transitions`.

    Single-pass integer-logs form (only counts enter libm, identical in
    any engine):  H = (ln n_from - sum(n * ln n) / n_from) / ln 2.

    Cost: the transitions aggregate plus one |types|-row rollup."""
    counts = session_transitions(
        events, gap_seconds, user_col, ts_col, type_col, id_col
    ).select("from_type", "n_transitions")
    return (
        counts.groupBy("from_type")
        .agg(
            F.sum("n_transitions").alias("n_from"),
            F.count(F.lit(1)).alias("n_targets"),
            F.sum(
                F.col("n_transitions") * F.log(F.col("n_transitions"))
            ).alias("nlogn"),
        )
        .select(
            "from_type",
            "n_from",
            "n_targets",
            (
                (F.log(F.col("n_from")) - F.col("nlogn") / F.col("n_from"))
                / F.lit(0.6931471805599453)
            ).alias("entropy_bits"),
        )
    )


def session_trigram_paths(
    events: DataFrame,
    top_k: int = 50,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(t1, t2, t3, n_paths) — the top_k most frequent length-3
    within-session event-type paths (order-2 behavioral motifs: the
    sequences funnels and order-1 transition matrices both miss, e.g.
    view->error->view retry loops vs view->click->purchase flows).

    Consecutive triples come from the same total order as
    :func:`session_transitions` ((ts_us, event_id) — engine-independent
    pairing) restricted to triples inside ONE session; counting is a
    map-side-combined |types|^3-bounded aggregate; top_k is a
    TakeOrderedAndProject with the full deterministic tie-break
    (n DESC, t1, t2, t3)."""
    s = sessionize(events, gap_seconds, user_col, ts_col)
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    trip = (
        s.withColumn("t2", F.lead(type_col, 1).over(w))
        .withColumn("t3", F.lead(type_col, 2).over(w))
        .withColumn("s2", F.lead("session_seq", 1).over(w))
        .withColumn("s3", F.lead("session_seq", 2).over(w))
        .filter(
            (F.col("s2") == F.col("session_seq"))
            & (F.col("s3") == F.col("session_seq"))
        )
    )
    return (
        trip.groupBy(F.col(type_col).alias("t1"), "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(top_k)
    )
