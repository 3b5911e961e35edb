"""Custom stateful streaming operator: gap-based sessionization.

The streaming counterpart of ``operators.sessions.session_stats`` — as user
events land, each user's event stream is cut into sessions at silence gaps
> ``gap_seconds``; a session is EMITTED the moment a later event proves it
closed (the first event beyond the gap), while the trailing open session
waits in the state store. State per user is one small record: closed-session
counter + the open session's (start, last, n, distinct event types) — the
prescribed ``applyInPandasWithState`` shape for stateful logic the built-in
session window (``F.session_window``) can't express (we need the running
per-user session_seq and the distinct-type set, and emission keyed to
session CLOSURE, not watermark expiry, so the availableNow drain is
deterministic).

Ordering contract: events within one microbatch are sorted here before the
merge; ACROSS batches the source must deliver each user's events in
non-decreasing event time (the standard sessionization contract — a
production deployment puts a watermark-sorted stage or an event-time
timeout in front; the sandbox drain lands the stream as a single file so
one microbatch carries everything and the contract holds trivially).

Output columns mirror the batch operator exactly, so the two paths are
differential-testable: closed sessions here == all-but-last session per
user there.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, start_us long, "
    "end_us long, duration_us long, n_event_types long"
)
STATE_SCHEMA = (
    "closed long, open_start long, open_last long, open_n long, "
    "open_types array<string>"
)


def _sessions_fn_factory(gap_us: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            closed, open_start, open_last, open_n, open_types = state.get
            open_types = set(open_types or [])
        else:
            closed, open_start, open_last, open_n, open_types = 0, None, None, 0, set()

        rows: list[tuple[int, str]] = []
        for pdf in pdfs:
            rows.extend(
                (int(t), str(e)) for t, e in zip(pdf["ts_us"], pdf["event_type"])
            )
        rows.sort(key=lambda r: r[0])

        out = []
        for ts, etype in rows:
            if open_start is None:
                open_start, open_last, open_n, open_types = ts, ts, 1, {etype}
            elif ts - open_last > gap_us:
                closed += 1
                out.append(
                    (
                        int(user_id),
                        closed,
                        open_n,
                        open_start,
                        open_last,
                        open_last - open_start,
                        len(open_types),
                    )
                )
                open_start, open_last, open_n, open_types = ts, ts, 1, {etype}
            else:
                open_last = ts
                open_n += 1
                open_types.add(etype)
        state.update(
            (closed, open_start, open_last, open_n, sorted(open_types))
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_seq",
                    "n_events",
                    "start_us",
                    "end_us",
                    "duration_us",
                    "n_event_types",
                ],
            )

    return fn


def streaming_sessions(
    events_stream: DataFrame, gap_seconds: int = 21600
) -> DataFrame:
    """events_stream: streaming (user_id long, ts timestamp, event_type
    string) → closed sessions (user_id, session_seq, n_events, start_us,
    end_us, duration_us, n_event_types). The open tail session per user
    stays in state (a production job would flush it via event-time
    timeout once the watermark passes the gap)."""
    keyed = events_stream.select(
        F.col("user_id").cast("long"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_type"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _sessions_fn_factory(gap_seconds * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streamed_closed_sessions(spark, sf_dir: str, gap_seconds: int = 21600) -> DataFrame:
    """End-to-end drain, batch-deterministic: land the events table as ONE
    parquet file (single microbatch => the cross-batch ordering contract
    holds trivially), stream it through :func:`streaming_sessions`, return
    the memory sink as a batch DataFrame. Deterministic because every
    closed session is a pure function of the user's full event history."""
    import uuid

    from tldr_spark.streaming.edges_stream import cleanup_stream_tmp

    base = (
        f"{spark.conf.get('spark.sql.warehouse.dir', 'spark-warehouse').removeprefix('file:')}"
        f"/_stream_tmp/{uuid.uuid4().hex[:12]}"
    )
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.select("user_id", "ts", "event_type").coalesce(1).write.mode(
        "overwrite"
    ).parquet(landing)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(landing)
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_sessions(stream, gap_seconds)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cleanup_stream_tmp(base)
    return spark.table(name)
