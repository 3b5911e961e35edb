"""Custom stateful streaming operator: first-seen-wins exact dedup.

The streaming counterpart of ``operators.dedup.exact_dedup`` — as crawl
batches land, only the FIRST document per content digest passes through;
re-crawls and mirrors are dropped with a running duplicate count. State is
one small record per digest group, managed by Structured Streaming's state
store (``applyInPandasWithState``, Arrow-batched — the prescribed shape for
custom stateful operators the built-in windowed aggs can't express).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "text_md5 string, doc_id long, dup_count long"
STATE_SCHEMA = "seen boolean, first_doc_id long, dups long"


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (text_md5,) = key
    seen, first_id, dups = state.get if state.exists else (False, None, 0)
    # earlier BATCH wins; within a batch neither row order NOR Arrow chunk
    # order is deterministic (file-source split order), so drain EVERY chunk
    # of this microbatch before picking min doc_id — min over only the first
    # chunk would make the survivor depend on chunking
    batch_min = None
    batch_n = 0
    for pdf in pdfs:
        ids = [int(x) for x in pdf["doc_id"]]
        if not ids:
            continue
        m = min(ids)
        batch_min = m if batch_min is None else min(batch_min, m)
        batch_n += len(ids)
    out_first = None
    if batch_n:
        if not seen:
            seen = True
            first_id = out_first = batch_min
            dups += batch_n - 1
        else:
            dups += batch_n
    state.update((seen, first_id, dups))
    if out_first is not None:
        yield pd.DataFrame(
            [(text_md5, out_first, dups)], columns=["text_md5", "doc_id", "dup_count"]
        )


def streaming_exact_dedup(docs_stream: DataFrame) -> DataFrame:
    """docs_stream: streaming (doc_id long, text string) → first-seen rows
    (text_md5, doc_id, dup_count). Emits a row only the first time a digest
    appears; later duplicates update state silently."""
    keyed = docs_stream.select("doc_id", F.md5("text").alias("text_md5"))
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
