"""Frequency sketches: exact two-pass heavy hitters and count-min.

Finding every token with count >= s via a plain groupBy shuffles the
FULL vocabulary — hapax-heavy at web scale (10^8-10^9 distinct keys for
a 100 TB corpus), which makes the naive plan's shuffle the bottleneck.
The classic cure is sketch-then-verify:

pass 1  per-partition Misra-Gries summaries (<= k counters each, Arrow
        batches; vectorized value_counts per batch merged into the
        bounded counter dict — per-DISTINCT-token Python, never per
        row). The union of partition summaries is a GUARANTEED superset
        of every token with global count > N/(k+1): if a token is
        absent from every summary, each partition undercounts it by at
        most N_p/(k+1) from zero, so its global count <= N/(k+1)
        (standard mergeable-summaries bound, Agarwal et al. TODS'13).
pass 2  exact recount restricted to the candidates: a broadcast
        semi-join prunes the token stream, then one map-side-combined
        groupBy over <= partitions*k distinct keys.

Network cost: pass 1 ships <= partitions*k rows; pass 2's shuffle has
<= partitions*k distinct keys (map-side combine collapses it to one row
per key per task) — independent of vocabulary size. The result is
EXACT (pass 2 recounts), so the driver query oracles against plain
GROUP BY ... HAVING.

Count-min (Cormode & Muthukrishnan J.Alg'05) is the mergeable
fixed-memory point-frequency sketch: d rows x w buckets of int64, built
by ONE map-side-combined aggregate over (row, md5-bucket); estimates
are min over d bucket counts, always >= the true count. Buckets come
from md5 slices so DuckDB reproduces the sketch bit-for-bit (same idiom
as the MinHash oracle).

Reference semantics scope: didasy/tldr has no frequency-sketch surface;
this is the LLM-pipeline layer (vocabulary stats over a 100 TB corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: (token, est) with
    <= k rows per input partition. ``est`` undercounts the partition-
    local frequency by at most N_p/(k+1); any token with global count
    > N/(k+1) appears in at least one partition's summary."""
    if k < 1:
        raise ValueError(f"k must be positive, got {k}")

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()  # vectorized per batch
            for tok, n in vc.items():  # per distinct token, not per row
                counters[tok] = counters.get(tok, 0) + int(n)
            if len(counters) > k:
                # MG batch decrement: subtract the (k+1)-th largest
                # count from everyone, drop the non-positive
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
        yield pd.DataFrame(
            {"token": list(counters.keys()), "est": list(counters.values())}
        )

    return items.select(F.col(col).alias(col)).mapInPandas(
        mg, schema="token string, est long"
    )


def heavy_hitters_exact(
    items: DataFrame, col: str, min_count: int, k: int | None = None
) -> DataFrame:
    """(token, n_occurrences) for every token with count >= min_count —
    EXACT, via Misra-Gries candidates + bounded recount.

    ``k`` (counters per partition) defaults to 2*N/min_count, sized from
    one column-pruned count action so the superset guarantee
    N/(k+1) < min_count holds with 2x margin. Memory per task is O(k);
    callers with a known stream size can pass k explicitly and skip the
    count."""
    if min_count < 1:
        raise ValueError(f"min_count must be positive, got {min_count}")
    stream = items.select(F.col(col).alias(col))
    if k is None:
        n = stream.count()
        k = max(16, -(-2 * n // min_count))  # ceil, 2x margin
    # rename the candidate column: the candidates derive from the stream
    # itself, so a same-named join key is ambiguous (self-join lineage)
    cand = (
        misra_gries_candidates(stream, col, k)
        .select(F.col("token").alias("_cand_token"))
        .distinct()
    )
    return (
        stream.join(F.broadcast(cand), F.col(col) == F.col("_cand_token"), "left_semi")
        .groupBy(F.col(col).alias("token"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def _bucket(col, row: int, width: int):
    """md5-slice bucket, bit-identical to the DuckDB oracle's
    CAST(concat('0x', substr(md5(concat('<row>:', token)), 1, 8)) AS
    BIGINT) % width."""
    h = F.md5(F.concat(F.lit(f"{row}:"), col))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias(
        f"b{row}"
    )


def countmin_sketch(
    items: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(row, bucket, cnt) — a d x w count-min sketch of the token stream.
    One map-side-combined aggregate; d*w output rows regardless of
    stream or vocabulary size. Sketches over partitions/days merge by
    summing cnt per (row, bucket)."""
    c = F.col(col)
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"), _bucket(c, j, width).alias("bucket")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(token, n_cms) point-frequency estimates: min over the d bucket
    counts. Always >= the true count (buckets only collide upward).
    The sketch is d*w rows — broadcast onto the probe set."""
    c = F.col(col)
    pb = probes.select(
        c.alias("token"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("row"), _bucket(c, j, width).alias("bucket"))
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("token", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("n_cms"))
    )
