"""Configuration-model null graph: degree-preserving edge rewiring.

Motif/assortativity/modularity numbers mean nothing without a null model —
"is 3.2M triangles a lot?" is answered against a degree-preserving random
rewiring (Newman SIAM Rev'03 §4; Maslov-Sneppen Science'02). This module
produces ONE deterministic rewiring sample: the directed stub-matching that
keeps every vertex's out-degree AND in-degree multiset exactly (each
original edge contributes one out-stub and one in-stub; out-stubs are
re-paired with in-stubs by independent hash orders), with self-loops
dropped and multi-edges collapsed to a multiplicity column.

Determinism instead of an RNG, like walks.py: stub order is md5 over the
(src, dst, occurrence) edge identity — every engine reproduces the same
rewired graph bit-for-bit, so the null graph itself is DuckDB-oracleable.

Scale shape: the only nontrivial primitive is a GLOBAL rank over ~E rows,
done WITHOUT a single-partition window: range-repartition on the sort key,
sort within partitions (together a total sort), then per-partition offsets
(one tiny count aggregate, collected — #partitions rows) + an Arrow
mapInPandas that adds offset + local position. Ranks depend only on the
total order, not on where range boundaries land, so the result is
partitioning-independent. Two passes over E, one shuffle each — the same
cost class as a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _hash_col(*cols) -> "F.Column":
    return F.conv(
        F.substring(F.md5(F.concat_ws("-", *cols)), 1, 8), 16, 10
    ).cast("long")


def _global_ranks(df: DataFrame, sort_cols: list[str], out_col: str) -> DataFrame:
    """Add ``out_col`` = 1-based position of the row in the total order
    given by ``sort_cols`` (which must be a total order — include a unique
    tie-break). No single-partition window: range partition + local sort +
    per-partition offset."""
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    sdf = (
        df.repartitionByRange(n_parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sizes = {r["_pid"]: r["n"] for r in sdf.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in sdf.schema.fields)
    schema += f", {out_col} long"

    def add_rank(batches):
        pos = 0
        base = None
        for pdf in batches:
            if not len(pdf):
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[out_col] = range(base + pos + 1, base + pos + 1 + len(pdf))
            pos += len(pdf)
            yield pdf

    # eagerly materialize from the PERSISTED layout: ranks must never be
    # recomputed through repartitionByRange's sampled boundaries with a
    # stale offsets dict
    out = sdf.mapInPandas(add_rank, schema=schema).drop("_pid").localCheckpoint(eager=True)
    sdf.unpersist()
    return out


def configuration_model(edges: DataFrame) -> DataFrame:
    """(src, dst, n) — one deterministic directed configuration-model
    rewiring of the input multigraph: out-stub i (in src-hash order) pairs
    with in-stub i (in dst-hash order). Self-loops dropped, parallel edges
    collapsed with multiplicity ``n``. Out-/in-degree multisets are
    preserved exactly up to the dropped self-loops."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    w = Window.partitionBy("src", "dst").orderBy(F.lit(1))
    keyed = e.select("src", "dst", F.row_number().over(w).alias("occ"))
    hs = keyed.select(
        "src", _hash_col("src", "dst", "occ", F.lit("s")).alias("h"), "dst", "occ"
    )
    hd = keyed.select(
        "dst", _hash_col("src", "dst", "occ", F.lit("d")).alias("h"), "src", "occ"
    )
    rs = _global_ranks(hs, ["h", "src", "dst", "occ"], "rank").select("src", "rank")
    rd = _global_ranks(hd, ["h", "dst", "src", "occ"], "rank").select("dst", "rank")
    return (
        rs.join(rd, "rank")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
