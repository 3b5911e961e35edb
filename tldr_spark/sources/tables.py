"""Testdata loaders + the deterministically derived link-graph edge table.

The driver's correctness gate compares every Spark query against DuckDB SQL
over the same parquet (see __spark_entry__.py). The edge table therefore has
to be reproducible BIT-EXACTLY in both engines, so the derivation below uses
ONLY integer arithmetic on ``documents.doc_id`` — no engine hash functions,
no floats:

  n       = count(documents)
  deg(d)  = 1 + (d*d) % 7 + (20 if d % 50 == 0 else 0)     -- out-degree hubs
  for k in 0..deg(d)-1:
      x   = d*131 + k*101 + 7
      b0  = d - d % BLOCK                                   -- block base
      bs  = min(BLOCK, n - b0)                              -- block size
      dst = b0 + (x%10 if x%5<2 else x%97) % bs
      w   = 1.0 + x % 3
      emit (d, dst, w) if dst != d

Properties (mirroring FIXTURES.md §2): 40% of edges target the 10 lowest
ids of each block → power-law-ish in-degree hubs; every 50th doc is an
out-hub; blocks of BLOCK=125 vertices are disconnected from each other →
multiple components at sf>=0.01; duplicate (src,dst) pairs occur (their
weights sum in PageRank, §2.7); weights in {1,2,3}.

``edges_oracle_cte()`` returns the equivalent DuckDB SQL, kept adjacent so
the two derivations can never drift apart silently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BLOCK = 125


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def doc_count(spark: SparkSession, sf_dir: str) -> int:
    return load(spark, sf_dir, "documents").count()


def derive_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src long, dst long, weight double) — the engine's central table."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    deg = (
        F.lit(1)
        + (d * d) % 7
        + F.when(d % 50 == 0, F.lit(20)).otherwise(F.lit(0))
    )
    x = d * 131 + F.col("k") * 101 + 7
    b0 = d - d % BLOCK
    bs = F.least(F.lit(BLOCK).cast("long"), F.lit(n) - b0)
    dst = b0 + F.when(x % 5 < 2, x % 10).otherwise(x % 97) % bs
    return (
        docs.withColumn("k", F.explode(F.sequence(F.lit(0), deg - 1)))
        .select(
            d.cast("long").alias("src"),
            dst.cast("long").alias("dst"),
            (F.lit(1.0) + (x % 3).cast("double")).alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def derive_edges_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PREVIOUS crawl snapshot of the same link graph: identical
    derivation, but each page's newest out-link (k = deg-1) had not been
    crawled yet — so every page carries one edge fewer, and pages whose
    current out-degree is 1 had no out-links at all. Gives a deterministic
    two-snapshot pair for incremental-crawl analytics (edge delta, rank
    movers) with the same bit-exact cross-engine reproducibility as
    :func:`derive_edges`."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    deg = (
        F.lit(1)
        + (d * d) % 7
        + F.when(d % 50 == 0, F.lit(20)).otherwise(F.lit(0))
    )
    x = d * 131 + F.col("k") * 101 + 7
    b0 = d - d % BLOCK
    bs = F.least(F.lit(BLOCK).cast("long"), F.lit(n) - b0)
    dst = b0 + F.when(x % 5 < 2, x % 10).otherwise(x % 97) % bs
    return (
        docs.withColumn("deg", deg)
        .filter(F.col("deg") >= 2)
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.col("deg") - 2)))
        .select(
            d.cast("long").alias("src"),
            dst.cast("long").alias("dst"),
            (F.lit(1.0) + (x % 3).cast("double")).alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def edges_oracle_cte() -> str:
    """DuckDB CTE body producing the identical edge table (view: documents)."""
    return f"""
  nn AS (SELECT COUNT(*) AS n FROM documents),
  dd AS (
    SELECT doc_id AS d,
           1 + (doc_id*doc_id) % 7
             + CASE WHEN doc_id % 50 = 0 THEN 20 ELSE 0 END AS deg
    FROM documents
  ),
  raw AS (
    SELECT d, d*131 + u.k*101 + 7 AS x, d - (d % {BLOCK}) AS b0
    FROM dd, UNNEST(generate_series(0, deg - 1)) AS u(k)
  ),
  edges AS (
    SELECT d AS src,
           b0 + (CASE WHEN x % 5 < 2 THEN x % 10 ELSE x % 97 END)
              % (CASE WHEN {BLOCK} < nn.n - b0 THEN {BLOCK} ELSE nn.n - b0 END) AS dst,
           CAST(1.0 + (x % 3) AS DOUBLE) AS weight
    FROM raw, nn
  ),
  e AS (SELECT src, dst, weight FROM edges WHERE src <> dst)
""".strip()


def edges_prev_oracle_cte() -> str:
    """DuckDB CTE body for the PREVIOUS crawl snapshot (``ep``) — mirrors
    :func:`derive_edges_prev` exactly: each page's k = deg-1 out-link is
    absent. Self-contained names (p-prefixed) so it composes with
    :func:`edges_oracle_cte` in one WITH clause."""
    return f"""
  pnn AS (SELECT COUNT(*) AS n FROM documents),
  pdd AS (
    SELECT doc_id AS d,
           1 + (doc_id*doc_id) % 7
             + CASE WHEN doc_id % 50 = 0 THEN 20 ELSE 0 END AS deg
    FROM documents
  ),
  praw AS (
    SELECT d, d*131 + u.k*101 + 7 AS x, d - (d % {BLOCK}) AS b0
    FROM pdd, UNNEST(generate_series(0, deg - 2)) AS u(k)
    WHERE deg >= 2
  ),
  pedges AS (
    SELECT d AS src,
           b0 + (CASE WHEN x % 5 < 2 THEN x % 10 ELSE x % 97 END)
              % (CASE WHEN {BLOCK} < pnn.n - b0 THEN {BLOCK} ELSE pnn.n - b0 END) AS dst,
           CAST(1.0 + (x % 3) AS DOUBLE) AS weight
    FROM praw, pnn
  ),
  ep AS (SELECT src, dst, weight FROM pedges WHERE src <> dst)
""".strip()
