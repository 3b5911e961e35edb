"""Structured Streaming ingest for the link graph.

The reference is batch-only (SURVEY.md §2 "Streaming: none"); the engine
adds the standard web-crawl ingestion shape: a stream of (src, dst, weight,
event_ts) edge arrivals (e.g. continuously landing WARC-extract files) →
watermarked windowed degree aggregates, feeding incremental snapshots that
the batch PageRank consumes per iteration epoch.

File-source streaming (readStream.parquet over a landing directory) is the
sandbox stand-in for Kafka; swapping the source is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EDGE_STREAM_SCHEMA = "src long, dst long, weight double, event_ts timestamp"


def read_edge_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    return spark.readStream.schema(EDGE_STREAM_SCHEMA).parquet(landing_dir)


def windowed_in_degree(
    stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """(window, dst, in_deg, in_weight) tumbling-window in-degree with
    late-data handling via watermark."""
    return (
        stream.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("win"), F.col("dst"))
        .agg(F.count(F.lit(1)).alias("in_deg"), F.sum("weight").alias("in_weight"))
    )


def cleanup_stream_tmp(base: str) -> None:
    """Remove a per-run _stream_tmp landing/checkpoint dir after the drain.

    The memory sink materializes the drained rows in driver memory, so the
    landing parquet and the checkpoint are dead weight the moment
    awaitTermination returns; without this, repeated driver/bench runs
    accrete parquet + checkpoint directories unboundedly (ADVICE r4)."""
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def run_available_now(df: DataFrame, query_name: str, checkpoint_dir: str):
    """Drain everything currently in the landing dir into a memory sink."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def events_to_edge_files(spark: SparkSession, sf_dir: str, landing_dir: str) -> None:
    """Derive a deterministic edge-arrival stream from the events table and
    land it as parquet — the sandbox stand-in for continuously landing
    WARC-extract batches. Pure integer arithmetic (src=user_id,
    dst=(event_id*131+7) mod 211) so a SQL oracle reproduces the stream
    bit-identically."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.select(
        F.col("user_id").alias("src"),
        ((F.col("event_id") * 131 + 7) % 211).alias("dst"),
        F.col("value").alias("weight"),
        F.col("ts").alias("event_ts"),
    ).write.mode("overwrite").parquet(landing_dir)


def streamed_hourly_in_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming drain, batch-deterministic: land the
    events-derived edge stream, readStream it, tumbling 1-hour windowed
    in-degree, availableNow trigger into a memory sink, return the sink as a
    batch DataFrame. Complete output mode makes the result independent of
    file arrival order / watermark timing, so the streaming path is
    DuckDB-oracle-checkable (driver contract), not just rows-only."""
    import uuid

    base = f"{spark.conf.get('spark.sql.warehouse.dir', 'spark-warehouse').removeprefix('file:')}/_stream_tmp/{uuid.uuid4().hex[:12]}"
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    events_to_edge_files(spark, sf_dir, landing)
    agg = windowed_in_degree(read_edge_stream(spark, landing), window="1 hour")
    name = f"stream_indeg_{uuid.uuid4().hex[:8]}"
    run_available_now(agg, name, ckpt)
    cleanup_stream_tmp(base)
    return spark.table(name).select(
        F.unix_timestamp(F.col("win.start")).alias("hour_epoch"),
        "dst",
        F.col("in_deg").cast("long").alias("in_deg"),
        # power-of-two quantizer: window groups are small (1-3 rows), so the
        # double sums are bit-stable across engines; *1024 keeps ~3 decimals
        F.round(F.col("in_weight") * 1024).cast("long").alias("in_weight_q"),
    )


def streamed_sliding_in_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`streamed_hourly_in_degree`'s sliding-window sibling: 2-hour
    windows sliding every 1 hour, so every edge arrival lands in exactly
    TWO windows — the overlap shape real crawl monitoring uses for
    rate-of-change detection (Spark expands the slide inside the streaming
    aggregation; state stays one row per (window, dst)). Same
    batch-deterministic drain (complete mode + availableNow), so the
    DuckDB oracle reproduces it exactly: each event contributes to the
    window starting at floor_hour(ts) and the one starting at
    floor_hour(ts) - 1h."""
    import uuid

    base = f"{spark.conf.get('spark.sql.warehouse.dir', 'spark-warehouse').removeprefix('file:')}/_stream_tmp/{uuid.uuid4().hex[:12]}"
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    events_to_edge_files(spark, sf_dir, landing)
    agg = (
        read_edge_stream(spark, landing)
        .withWatermark("event_ts", "30 minutes")
        .groupBy(
            F.window("event_ts", "2 hours", "1 hour").alias("win"), F.col("dst")
        )
        .agg(F.count(F.lit(1)).alias("in_deg"), F.sum("weight").alias("in_weight"))
    )
    name = f"stream_slide_{uuid.uuid4().hex[:8]}"
    run_available_now(agg, name, ckpt)
    cleanup_stream_tmp(base)
    return spark.table(name).select(
        F.unix_timestamp(F.col("win.start")).alias("win_start_epoch"),
        "dst",
        F.col("in_deg").cast("long").alias("in_deg"),
        F.round(F.col("in_weight") * 1024).cast("long").alias("in_weight_q"),
    )


def streamed_countmin_cells(
    spark: SparkSession, sf_dir: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-min sketch built BY THE STREAMING ENGINE: the d x w cell
    aggregate runs as a streaming groupBy over the landing edge stream
    (availableNow drain, complete mode). Because the sketch is a pure
    cellwise-sum structure, the incremental streaming build is
    bit-identical to a one-shot batch build over the same arrivals —
    that mergeability is exactly why CMS is the right frequency state
    for an unbounded crawl stream (state is d*w int64 cells FOREVER,
    immune to unbounded-key state growth that a per-item streaming
    count would suffer). Items are the dst vertex ids; buckets use the
    same md5-slice arithmetic as operators/heavyhitters.py, so the
    DuckDB oracle reproduces every cell."""
    import uuid

    from tldr_spark.operators.heavyhitters import _bucket

    base = f"{spark.conf.get('spark.sql.warehouse.dir', 'spark-warehouse').removeprefix('file:')}/_stream_tmp/{uuid.uuid4().hex[:12]}"
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    events_to_edge_files(spark, sf_dir, landing)
    item = F.col("dst").cast("string")
    cells = (
        read_edge_stream(spark, landing)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("rw"),
                            _bucket(item, j, width).alias("bucket"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.rw").alias("rw"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = f"stream_cms_{uuid.uuid4().hex[:8]}"
    run_available_now(cells, name, ckpt)
    cleanup_stream_tmp(base)
    return spark.table(name).select("rw", "bucket", F.col("cnt").cast("long").alias("cnt"))


def streamed_distinct_in_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACTLY-ONCE edge dedup: the crawl re-discovers the same
    link endlessly; `dropDuplicatesWithinWatermark` keeps one state entry
    per (src, dst) only until the 1-hour watermark passes it — bounded
    state on an unbounded stream (plain dropDuplicates state grows
    forever). Drained availableNow from a SINGLE landed file, every
    arrival is processed before the watermark advances, so the result is
    exactly the batch DISTINCT and the per-dst in-degree rollup is
    DuckDB-oracle-checkable."""
    import uuid

    base = f"{spark.conf.get('spark.sql.warehouse.dir', 'spark-warehouse').removeprefix('file:')}/_stream_tmp/{uuid.uuid4().hex[:12]}"
    landing, ckpt = f"{base}/landing", f"{base}/ckpt"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.select(
        F.col("user_id").alias("src"),
        ((F.col("event_id") * 131 + 7) % 211).alias("dst"),
        F.lit(1.0).alias("weight"),
        F.col("ts").cast("timestamp").alias("event_ts"),
    ).coalesce(1).write.mode("overwrite").parquet(landing)
    dedup = (
        read_edge_stream(spark, landing)
        .withWatermark("event_ts", "1 hour")
        .dropDuplicatesWithinWatermark(["src", "dst"])
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cleanup_stream_tmp(base)
    return (
        spark.table(name)
        .groupBy("dst")
        .agg(F.count(F.lit(1)).alias("distinct_in_deg"))
    )
