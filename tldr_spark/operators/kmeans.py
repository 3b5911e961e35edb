"""Distributed Lloyd's k-means over an embedding column.

The clustering companion to the ANN operators (similarity.py uses a
sample-trained variant internally for IVF cells; this is the full-corpus
operator a training-data pipeline runs to partition an embedding space —
dedup sharding, topic bucketing, curriculum binning).

Execution shape per iteration (the canonical scalable Lloyd layout):

  1. ASSIGN — centroids (k x d floats, a few KB) ride to executors inside
     an Arrow-vectorized ``pandas_udf``; each batch computes the full
     batch x k distance matrix as one BLAS matmul (argmin over
     ||x||^2 - 2 x.c + ||c||^2; ties -> lowest cluster index).
  2. UPDATE — per-cluster per-dimension sums as d JVM-side
     ``SUM(embedding[i])`` aggregates + a count: ONE partially-aggregated
     shuffle of k x (d+1) cells, never a row explosion. The k x d result
     collects to the driver (k is user-small), producing next centroids.
     Empty clusters keep their previous centroid.

So a full run costs ``iters`` (map-combined shuffle + tiny collect)
rounds; nothing driver-side ever scales with N. Determinism: the init is
the k ids with the smallest (Knuth-hash, id) key — a distributed top-k,
not a scan-order sample — and every reduction is a fixed-order float64
sum per partition tree, so reruns on the same data and partitioning
reproduce; across engines the operator is pinned by pytest against an
identical-arithmetic NumPy oracle rather than a SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType

KNUTH = 2654435761


@dataclass
class KMeansResult:
    assignments: DataFrame  # (id: long, cluster: int)
    centroids: np.ndarray  # (k, d) float64
    inertia: float  # sum of squared distances to assigned centroid
    iterations: int


def _assign_udf(cents: np.ndarray):
    c = cents.astype(np.float64)
    c_norm = (c * c).sum(axis=1)  # (k,)

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.asarray(list(vecs), dtype=np.float64)  # (b, d)
        # argmin ||x-c||^2 == argmin c_norm - 2 x.c  (x-norm is constant
        # per row); np.argmin takes the FIRST minimum -> lowest index ties
        d2 = c_norm[None, :] - 2.0 * (x @ c.T)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return assign


def kmeans(
    embs: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Lloyd's k-means, fixed ``iters`` assign/update rounds from a
    deterministic hash-min initialization. Returns final assignments,
    centroids, and inertia (computed with the FINAL centroids)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    pts = embs.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).persist()
    first = pts.first()
    if first is None:
        pts.unpersist()
        return KMeansResult(
            embs.sparkSession.createDataFrame([], "id long, cluster int"),
            np.zeros((0, 0)),
            0.0,
            0,
        )
    dim = len(first["v"])

    init_rows = (
        pts.select("id", "v", ((F.col("id") * KNUTH) % (2**32)).alias("h"))
        .orderBy("h", "id")
        .limit(k)
        .collect()
    )
    cents = np.asarray([r["v"] for r in init_rows], dtype=np.float64)
    if len(cents) < k:  # fewer points than clusters: pad by repeating
        cents = np.vstack([cents] * ((k // len(cents)) + 1))[:k]

    sums = [F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}") for i in range(dim)]
    assigned = None
    for _ in range(iters):
        assigned = pts.withColumn("cluster", _assign_udf(cents)(F.col("v")))
        stats = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        new_cents = cents.copy()  # empty clusters keep their centroid
        for r in stats:
            new_cents[r["cluster"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        cents = new_cents

    # final assignment against the final centroids + inertia
    assigned = pts.withColumn("cluster", _assign_udf(cents)(F.col("v")))
    c = cents

    @F.pandas_udf("double")
    def min_d2(vecs: pd.Series) -> pd.Series:
        x = np.asarray(list(vecs), dtype=np.float64)
        d2 = ((x * x).sum(axis=1))[:, None] - 2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        return pd.Series(np.maximum(d2.min(axis=1), 0.0))

    inertia = assigned.select(F.sum(min_d2(F.col("v"))).alias("s")).collect()[0]["s"]
    out = assigned.select("id", "cluster")
    out = out.localCheckpoint(eager=True)
    pts.unpersist()
    return KMeansResult(out, cents, float(inertia or 0.0), iters)
