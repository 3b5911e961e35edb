"""Context-window document chunking with overlap — the splitting pass a
pretraining / RAG pipeline runs before embedding or packing: each document
becomes ceil-strided windows of ``chunk_tokens`` tokens, consecutive
chunks sharing ``overlap`` tokens so no span is ever cut without context.

Complement of operators/packing.py (which concatenates docs UP to a
budget; this splits docs DOWN to one). Entirely relational: tokenize once
into a per-row array, explode a 0..n_chunks-1 index sequence, slice the
SAME array per chunk — the token array never crosses a shuffle and the
whole operator is a single corpus scan with zero Python per row. Output
rows = total chunks = O(total tokens / stride).

Chunk-start rule (pinned by the python-oracle test): stride
S = chunk_tokens - overlap; starts are 1 + i*S for i in 0..n_chunks-1 with
n_chunks = 1 if n <= chunk_tokens else ceil((n - chunk_tokens)/S) + 1 —
the last chunk always reaches the final token and is the only one allowed
to be short. Zero-token documents yield zero chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tokens, chunk): overlapping
    whitespace-token windows. ``chunk_id`` is 0-based; ``start_tok`` is
    the 1-based token offset of the chunk inside the document."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""
    )
    arr = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("l"))
        .withColumn("n", F.size("l"))
        .where(F.col("n") > 0)
    )
    last_idx = F.when(F.col("n") <= chunk_tokens, F.lit(0)).otherwise(
        F.floor((F.col("n") - chunk_tokens + stride - 1) / stride)
    )
    ch = arr.select(
        "doc_id", "l", "n", F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_id")
    )
    start = (F.col("chunk_id") * stride + 1).cast("int")
    n_tok = F.least(F.lit(chunk_tokens), F.col("n") - F.col("chunk_id") * stride)
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.alias("start_tok"),
        n_tok.cast("int").alias("n_tokens"),
        F.concat_ws(" ", F.slice("l", start, n_tok)).alias("chunk"),
    )
