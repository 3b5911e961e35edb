"""Stream-stream interval join (Structured Streaming): attribute each
click to the views the same user made in the preceding hour — the
canonical event-time join with watermark-bounded state (views older
than the watermark minus the join range are evicted from the state
store; neither side is ever fully buffered).

Sandbox determinism: each side lands as ONE parquet file, so the
availableNow drain processes everything in a single micro-batch before
any watermark advances — no late-drop can occur and the joined output
equals the batch interval join exactly, making this streaming path
DuckDB-oracle-checkable (same trick as stateful_sessions.py). In
production the same query runs unmodified over Kafka with real
watermark eviction.
"""

from __future__ import annotations

import uuid

from tldr_spark.streaming.edges_stream import cleanup_stream_tmp

from pyspark.sql import DataFrame, SparkSession, functions as F


def view_click_interval_join(
    views: DataFrame, clicks: DataFrame, max_delay: str = "1 hour"
) -> DataFrame:
    """(user_id, ts_v, ts_c) pairs with ts_v <= ts_c <= ts_v + max_delay,
    same user. Works on static OR streaming inputs; for streaming both
    sides carry a 2-hour watermark so join state is bounded."""
    # parquet-sourced ts columns arrive as TIMESTAMP_NTZ; normalize to
    # TIMESTAMP (session TZ is pinned to UTC) so unix_micros/watermarks work
    v = views.select("user_id", F.col("ts").cast("timestamp").alias("ts_v"))
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").cast("timestamp").alias("ts_c")
    )
    if views.isStreaming:
        v = v.withWatermark("ts_v", "2 hours")
    if clicks.isStreaming:
        c = c.withWatermark("ts_c", "2 hours")
    return v.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("ts_c") >= F.col("ts_v"))
        & (F.col("ts_c") <= F.col("ts_v") + F.expr(f"INTERVAL {max_delay}")),
    ).select("user_id", "ts_v", "ts_c")


def streamed_view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: land view and click streams (one file each), run the
    watermarked stream-stream interval join with an availableNow drain
    into a memory sink, then aggregate the drained pairs per user:
    (user_id, n_pairs, delay_us_sum). Exactly equals the batch interval
    join by the single-micro-batch construction."""
    base = (
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
            "file:"
        )
        + f"/_stream_tmp/{uuid.uuid4().hex[:12]}"
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for et, sub in (("view", "views"), ("click", "clicks")):
        ev.filter(F.col("event_type") == et).select("user_id", "ts").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{base}/{sub}")
    schema = "user_id long, ts timestamp"
    vs = spark.readStream.schema(schema).parquet(f"{base}/views")
    cs = spark.readStream.schema(schema).parquet(f"{base}/clicks")
    joined = view_click_interval_join(vs, cs)
    name = f"stream_vc_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cleanup_stream_tmp(base)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.unix_micros("ts_c") - F.unix_micros("ts_v")).alias(
                "delay_us_sum"
            ),
        )
    )
