"""Sinks: partition pruning and bucketed exchange-free joins — asserted on
the PHYSICAL PLAN, not just row counts, because the layout-dependent plan
shape IS the feature (it's what removes the per-iteration shuffle at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark, tmp_path):
    from tldr_spark.sources.sinks import write_partitioned

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket_col")
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, ["bucket_col"])
    rd = spark.read.parquet(path).filter("bucket_col = 3")
    assert rd.count() == df.filter("id % 7 = 3").count()
    # the partition predicate must prune directories, not filter rows post-scan
    scan_lines = [l for l in _plan(rd).splitlines() if "FileScan" in l]
    assert any("PartitionFilters: [" in l and "bucket_col" in l for l in scan_lines), scan_lines


def test_bucketed_join_has_no_exchange(spark):
    from tldr_spark.sources.sinks import read_table, write_bucketed

    e = spark.range(2000).select(
        (F.col("id") % 300).alias("src"),
        ((F.col("id") * 7) % 300).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    r = spark.range(300).select(F.col("id").alias("src"), F.lit(0.5).alias("rank"))
    try:
        write_bucketed(e, "edges_b", ["src"], 8, sort_cols=["src"])
        write_bucketed(r, "ranks_b", ["src"], 8)

        # disable broadcast so the join strategy actually depends on layout
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "edges_b").join(read_table(spark, "ranks_b"), "src")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        assert joined.count() == 2000

        # control: the same join on non-bucketed inputs DOES shuffle
        plan_ctrl = _plan(e.join(r, "src"))
        assert "Exchange" in plan_ctrl
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS edges_b")
        spark.sql("DROP TABLE IF EXISTS ranks_b")


def test_bucketed_aggregation_has_no_exchange(spark):
    from tldr_spark.sources.sinks import read_table, write_bucketed

    e = spark.range(5000).select(
        (F.col("id") % 400).alias("dst"), F.lit(1.0).alias("w")
    )
    try:
        write_bucketed(e, "edges_dst_b", ["dst"], 8)
        agg = read_table(spark, "edges_dst_b").groupBy("dst").agg(F.sum("w").alias("s"))
        assert "Exchange" not in _plan(agg), _plan(agg)
        assert agg.count() == 400
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_dst_b")
