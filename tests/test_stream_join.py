"""Stream-stream interval join: batch equivalence + windowed-state bound
semantics on hand data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tldr_spark.streaming.stream_join import (
    streamed_view_click_attribution,
    view_click_interval_join,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_static_join_semantics(spark):
    views = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(90)), (2, _ts(10))], "user_id long, ts timestamp"
    )
    clicks = spark.createDataFrame(
        [(1, _ts(30)), (1, _ts(95)), (2, _ts(100)), (3, _ts(5))],
        "user_id long, ts timestamp",
    )
    got = {
        (r["user_id"], r["ts_v"].minute + 60 * r["ts_v"].hour, r["ts_c"].minute + 60 * r["ts_c"].hour)
        for r in view_click_interval_join(views, clicks).collect()
    }
    # user1: view@0 matches click@30 (<=60m) but NOT click@95; view@90
    # matches click@95. user2: click@100 is 90m after view@10 -> no match.
    # user3: click with no view -> no match.
    assert got == {(1, 12 * 60, 12 * 60 + 30), (1, 12 * 60 + 90, 12 * 60 + 95)}


def test_streamed_equals_batch(spark):
    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_pairs"], r["delay_us_sum"])
        for r in streamed_view_click_attribution(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = view_click_interval_join(
        ev.filter("event_type = 'view'").select("user_id", "ts"),
        ev.filter("event_type = 'click'").select("user_id", "ts"),
    )
    want = {
        r["user_id"]: (r["n_pairs"], r["delay_us_sum"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.unix_micros("ts_c") - F.unix_micros("ts_v")).alias("delay_us_sum"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_streamed_dedup_equals_batch_distinct(spark):
    from pyspark.sql import functions as F

    from tldr_spark.streaming.edges_stream import streamed_distinct_in_degree

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["dst"]: r["distinct_in_deg"]
        for r in streamed_distinct_in_degree(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        r["dst"]: r["c"]
        for r in ev.select(
            F.col("user_id").alias("src"),
            ((F.col("event_id") * 131 + 7) % 211).alias("dst"),
        )
        .distinct()
        .groupBy("dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want and len(got) > 0
