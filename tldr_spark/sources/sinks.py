"""Parquet sinks with the layouts that matter at 100 TB:

  write_partitioned   hive-style directory partitioning — partition PRUNING:
                      a reader filtering on the partition column touches
                      only matching directories (PartitionFilters in the
                      scan, not a post-scan filter)
  write_bucketed      hash-bucketed (+ optionally sorted) table — CO-LOCATED
                      JOINS: two tables bucketed on the join key with the
                      same bucket count join with ZERO Exchange on either
                      side, the layout an iterative engine reuses across
                      every iteration instead of re-shuffling

Bucketing goes through the session catalog (``saveAsTable``) because bucket
metadata lives in the table definition, not the files; path-based
``.parquet(path)`` writes cannot carry it. On a cluster the catalog is
Hive/Iceberg/Unity; locally it is Spark's in-memory or warehouse-dir
catalog — same API either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
