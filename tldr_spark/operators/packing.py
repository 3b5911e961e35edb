"""Training-sequence packing: concat-and-chunk token budgeting.

The last step of an LLM data pipeline maps documents, in a fixed order,
onto fixed-capacity training sequences: conceptually the corpus's token
stream is concatenated and cut every ``capacity`` tokens, so a document
may span several sequences and a sequence may hold several documents
(GPT-style "packing"; the alternative pad-per-doc wastes capacity).
Everything a trainer's data loader needs per document is its span:

    first_seq        = start // capacity
    last_seq         = (start + max(n,1) - 1) // capacity
    offset_in_first  = start %  capacity

where ``start`` is the EXCLUSIVE prefix sum of token counts in doc_id
order — pure integer arithmetic, so the DuckDB oracle (one SUM window)
matches bit-for-bit. Empty documents occupy no tokens; their span
degenerates to the single sequence their start position falls in.

Scale shape: the only nontrivial primitive is a GLOBAL prefix sum over
one row per document — done WITHOUT a single-partition window, the same
pattern as nullmodel._global_ranks: range-repartition on doc_id, sort
within partitions (together a total sort), collect per-partition SUMS
(#partitions rows, not data), then an Arrow mapInPandas adds each
partition's offset to its local cumulative sum. The result depends only
on the doc_id total order, never on where range boundaries land. Two
passes over D rows, one shuffle — a sort's cost class, at 10^10 docs
still two map-combinable stages and a #partitions-row collect.

Reference semantics scope: didasy/tldr is a summarizer with no training
export; packing is part of the LLM-pipeline layer this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _global_prefix_sum(df: DataFrame, order_cols: list[str], val_col: str,
                       out_col: str) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE prefix sum of ``val_col`` over the total
    order given by ``order_cols`` (must be a total order). Range partition
    + local sort + per-partition sum offsets; partitioning-independent."""
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    sdf = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = {
        r["_pid"]: r["s"]
        for r in sdf.groupBy("_pid").agg(F.sum(val_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in sdf.schema.fields)
    schema += f", {out_col} long"

    def add_prefix(batches):
        run = 0
        base = None
        for pdf in batches:
            if not len(pdf):
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.copy()
            vals = pdf[val_col].astype("int64")
            pdf[out_col] = base + run + vals.cumsum() - vals
            run += int(vals.sum())
            yield pdf

    # materialize from the PERSISTED layout: the prefix must never be
    # recomputed through repartitionByRange's sampled boundaries with a
    # stale offsets dict (same invariant as nullmodel._global_ranks)
    out = sdf.mapInPandas(add_prefix, schema=schema).drop("_pid").localCheckpoint(eager=True)
    sdf.unpersist()
    return out


def pack_sequences(
    docs: DataFrame,
    capacity: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, first_seq, last_seq, offset_in_first): each
    document's span over fixed-``capacity`` training sequences, packing
    the whitespace-token stream in doc_id order."""
    if capacity < 1:
        raise ValueError(f"capacity must be positive, got {capacity}")
    from tldr_spark.operators.textstats import token_count

    tc = token_count(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    pre = _global_prefix_sum(tc, ["doc_id"], "n_tokens", "_start")
    cap = F.lit(int(capacity))
    return pre.select(
        "doc_id",
        "n_tokens",
        F.expr(f"_start div {int(capacity)}").alias("first_seq"),
        (
            (F.col("_start") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        ).alias("_last_pos"),
        F.pmod(F.col("_start"), cap).cast("long").alias("offset_in_first"),
    ).select(
        "doc_id",
        "n_tokens",
        "first_seq",
        F.expr(f"_last_pos div {int(capacity)}").alias("last_seq"),
        "offset_in_first",
    )
