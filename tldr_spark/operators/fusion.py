"""Reciprocal-rank fusion of ranked vertex/document lists.

RRF (Cormack, Clarke & Buettcher SIGIR'09): given R rankings, score(d) =
sum_r 1/(k + pos_r(d)) — the standard way to combine incomparable
rankers (PageRank vs in-degree vs BM25) without score calibration.

Positions are computed scale-safe: rank = global EXCLUSIVE prefix count
over the total order (score DESC, id ASC) via range partition +
per-partition offsets (packing._global_prefix_sum) — never a
single-partition window, so a 10^9-row ranking never funnels through
one task. Scores must be INTEGER (quantize floats first: the callers
rank by the same 2^-20-quantized values both engines agree on, which
also makes positions — and therefore the fusion — bit-deterministic).

Reference semantics scope: didasy/tldr ranks by a single centrality
(tldr.go sort.go); multi-ranker fusion is part of this engine's
retrieval layer.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def rank_positions(scores: DataFrame, score_col: str, id_col: str = "id") -> DataFrame:
    """(id, pos): 1-based global positions by (score DESC, id ASC).
    ``score_col`` must be integral — pre-quantize floats."""
    from tldr_spark.operators.packing import _global_prefix_sum

    base = (
        scores.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(score_col).cast("long").alias("_s"),
        )
        .withColumn("_neg", -F.col("_s"))
        .withColumn("_one", F.lit(1).cast("long"))
    )
    pre = _global_prefix_sum(base, ["_neg", "id"], "_one", "_pre")
    return pre.select("id", (F.col("_pre") + 1).alias("pos"))


def reciprocal_rank_fusion(
    rankings: list[DataFrame], k: int = 60
) -> DataFrame:
    """(id, rrf) — sum of 1/(k + pos) over every ranking containing the
    id. Inputs are (id, pos) frames from :func:`rank_positions`. The
    fan-in is one union + one map-side-combined aggregate."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    u = reduce(
        DataFrame.unionByName,
        [r.select(F.col("id").cast("long"), F.col("pos").cast("long")) for r in rankings],
    )
    return u.groupBy("id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("pos"))).alias("rrf")
    )
