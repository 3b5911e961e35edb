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
