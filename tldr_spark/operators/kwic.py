"""Keyword-in-context (KWIC) concordance — the corpus-inspection staple:
every occurrence of a query token with a +/-w token window around it.

Used in data pipelines to audit what a filter/classifier is actually
matching ("show me 'casino' in context before I ban it").  Entirely
relational: tokenize once into a per-doc array, posexplode to positions,
slice the SAME array for the window — the array never leaves the row, so
cost is O(total tokens) with a pushed-down equality filter on the query
token, and the result size is bounded by the term's tf, not the corpus.

Positions are 1-based (inclusive-slice semantics shared with the SQL
twin).  No Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tok_arrays(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""
    )
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("l"))


def top_token(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> str:
    """The corpus's most frequent token, ties token-ascending — a
    deterministic self-contained query-term choice. One agg + top-1;
    a single row reaches the driver."""
    row = (
        _tok_arrays(docs, id_col, text_col)
        .select(F.explode("l").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError("empty corpus")
    return row[0]["token"]


def kwic(
    docs: DataFrame,
    term: str,
    window: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, snippet): every occurrence of ``term``; pos is the
    1-based token position; snippet joins tokens [pos-window, pos+window]
    clamped to the document."""
    arr = _tok_arrays(docs, id_col, text_col)
    occ = arr.select(
        "doc_id", "l", F.posexplode("l").alias("pos0", "token")
    ).where(F.col("token") == F.lit(term))
    pos = F.col("pos0") + 1  # 1-based
    start = F.greatest(F.lit(1), pos - window)
    stop = F.least(F.size("l"), pos + window)
    return occ.select(
        "doc_id",
        pos.cast("int").alias("pos"),
        F.concat_ws(" ", F.slice("l", start, stop - start + 1)).alias("snippet"),
    )
