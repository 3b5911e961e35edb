"""Synthetic pages source, byte-identical extraction invariant, href→edges
pipeline end-to-end, and the streaming ingest path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages(spark):
    from tldr_spark.sources.synth_pages import generate_pages

    return generate_pages(spark, n_pages=200, n_sites=20).persist()


def test_pages_schema_and_determinism(spark, pages):
    from tldr_spark.sources.synth_pages import generate_pages

    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert pages.count() == 200
    # regeneration is bit-identical (seeded per-row kernel, no wall-clock)
    again = generate_pages(spark, n_pages=200, n_sites=20)
    a = sorted((r["url"], r["text"]) for r in pages.collect())
    b = sorted((r["url"], r["text"]) for r in again.collect())
    assert a == b


def test_extract_text_byte_identical_invariant(spark, pages):
    """input_hint invariant: engine-extracted text per url is byte-identical
    to the oracle running the SAME function row-wise in plain Python."""
    from tldr_spark.functions.text_udfs import extract_text, extract_text_py

    got = {
        r["url"]: r["t"]
        for r in pages.select("url", extract_text(F.col("html")).alias("t")).collect()
    }
    for r in pages.select("url", "html", "text").collect():
        oracle = extract_text_py(bytes(r["html"]))
        assert got[r["url"]] == oracle, r["url"]
        assert r["text"] == oracle  # pre-filled column is the same bytes


def test_out_degree_skew_is_real(pages):
    """Zipf out-links: hub pages must exist (FIXTURES.md requires in/out
    hubs so skew handling is actually exercised)."""
    from tldr_spark.functions.text_udfs import extract_links

    degs = sorted(
        r["d"] for r in pages.select(F.size(extract_links("html")).alias("d")).collect()
    )
    assert degs[-1] >= 5 * max(1, degs[len(degs) // 2])  # max >> median


def test_pages_to_edges_and_pagerank_e2e(spark, pages):
    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.sources.synth_pages import pages_to_edges

    edges = pages_to_edges(pages, id_method="hash")
    res = pagerank(edges, damping=0.5, tolerance=1e-8)
    assert res.n_vertices > 0 and res.n_edges > 0
    total = res.ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_dense_ids_are_dense(spark, pages):
    from tldr_spark.sources.synth_pages import pages_to_edges

    edges = pages_to_edges(pages, id_method="dense").persist()
    mx = edges.agg(F.max(F.greatest("src", "dst"))).collect()[0][0]
    n = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    assert mx == n - 1  # ids are exactly 0..V-1


def test_streaming_windowed_degree(spark, tmp_path):
    from tldr_spark.streaming.edges_stream import (
        read_edge_stream,
        run_available_now,
        windowed_in_degree,
    )

    landing = str(tmp_path / "landing")
    batch = spark.createDataFrame(
        [
            (1, 2, 1.0, "2026-01-01 00:10:00"),
            (3, 2, 1.0, "2026-01-01 00:20:00"),
            (1, 4, 2.0, "2026-01-01 01:05:00"),
        ],
        "src long, dst long, weight double, event_ts string",
    ).select("src", "dst", "weight", F.to_timestamp("event_ts").alias("event_ts"))
    batch.write.mode("overwrite").parquet(landing)

    agg = windowed_in_degree(read_edge_stream(spark, landing), window="1 hour")
    run_available_now(agg, "deg_stream", str(tmp_path / "ck"))
    rows = spark.sql("SELECT dst, in_deg, in_weight FROM deg_stream").collect()
    got = {(r["dst"], r["in_deg"], r["in_weight"]) for r in rows}
    assert (2, 2, 2.0) in got and (4, 1, 2.0) in got


def test_stateful_streaming_dedup(spark, tmp_path):
    from tldr_spark.streaming.stateful_dedup import streaming_exact_dedup

    landing = str(tmp_path / "docs_landing")
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(landing)

    stream = spark.readStream.schema("doc_id long, text string").parquet(landing)
    dedup = streaming_exact_dedup(stream)
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_stream").collect()}
    # one survivor per distinct text, first-seen doc id
    assert rows == {0, 2}


def test_stateful_streaming_sessions_single_batch(spark, tmp_path):
    """Closed sessions from one drain == batch sessionization minus each
    user's last session; out-of-order rows WITHIN the batch are sorted."""
    from tldr_spark.streaming.stateful_sessions import streaming_sessions

    h = 3_600  # seconds
    # user 1: sessions [0h,1h], [10h], [20h,20.5h] -> closed: first two
    # user 2: one session only -> nothing closed
    rows = [
        (1, 10 * h, "b"),
        (1, 0 * h, "a"),
        (1, 1 * h, "b"),
        (1, 20 * h, "a"),
        (1, int(20.5 * h), "c"),
        (2, 5 * h, "a"),
        (2, 6 * h, "a"),
    ]
    landing = str(tmp_path / "ev_landing")
    spark.createDataFrame(
        [(u, t, e) for u, t, e in rows], "user_id long, secs long, event_type string"
    ).selectExpr(
        "user_id", "timestamp_seconds(secs) AS ts", "event_type"
    ).coalesce(1).write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(landing)
    q = (
        streaming_sessions(stream, gap_seconds=6 * h)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            r["start_us"],
            r["end_us"],
            r["duration_us"],
            r["n_event_types"],
        )
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    us = 1_000_000
    assert got == {
        (1, 1): (2, 0, h * us, h * us, 2),
        (1, 2): (1, 10 * h * us, 10 * h * us, 0, 1),
    }


def test_stateful_streaming_sessions_across_batches(spark, tmp_path):
    """A second drain (same checkpoint) closes the session left open by the
    first and continues the per-user session_seq from state."""
    from tldr_spark.streaming.stateful_sessions import streaming_sessions

    h = 3_600
    landing = str(tmp_path / "ev_landing2")
    ckpt = str(tmp_path / "ck_sess2")
    emitted: dict = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            emitted[(r["user_id"], r["session_seq"])] = r["n_events"]

    def drain(rows):
        spark.createDataFrame(
            rows, "user_id long, secs long, event_type string"
        ).selectExpr(
            "user_id", "timestamp_seconds(secs) AS ts", "event_type"
        ).coalesce(1).write.mode("append").parquet(landing)
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).parquet(landing)
        q = (
            streaming_sessions(stream, gap_seconds=2 * h)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return dict(emitted)

    # batch 1: one open session (0h, 1h) — nothing emitted yet
    assert drain([(7, 0, "a"), (7, h, "b")]) == {}
    # batch 2: event at 10h closes it (gap 2h); new open tail at 10h
    got = drain([(7, 10 * h, "a")])
    assert got == {(7, 1): 2}
    # batch 3: event at 20h closes session 2 as well
    got = drain([(7, 20 * h, "a")])
    assert got == {(7, 1): 2, (7, 2): 1}


def test_streaming_countmin_equals_batch_sketch(spark):
    # cellwise-sum mergeability: the sketch the streaming engine builds
    # incrementally must be bit-identical to a one-shot batch build over
    # the same arrivals
    from pyspark.sql import functions as F

    from tldr_spark.operators.heavyhitters import countmin_sketch
    from tldr_spark.streaming.edges_stream import streamed_countmin_cells

    sf = "/root/testdata/sf0.001"
    got = {
        (r["rw"], r["bucket"]): r["cnt"]
        for r in streamed_countmin_cells(spark, sf, depth=3, width=32).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        ((F.col("event_id") * 131 + 7) % 211).cast("string").alias("item")
    )
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_sketch(ev, "item", depth=3, width=32).collect()
    }
    assert got == want
    assert sum(got.values()) == 3 * ev.count()
