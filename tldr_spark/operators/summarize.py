"""Distributed extractive summarization — the reference pipeline at corpus scale.

The reference summarizes ONE text per process (/root/reference/tldr.go:110).
The engine's unit of parallelism is the DOCUMENT: a corpus DataFrame
(doc_id, text) fans out across executors via ``mapInPandas`` (Arrow batches,
zero per-row Python at the DataFrame boundary), and within each document the
pipeline is vectorized NumPy from
:mod:`tldr_spark.functions.reference` — the exact same kernels the golden
tests pin, so per-document output is byte-identical to the single-node
oracle by construction.

Why mapInPandas and not per-sentence DataFrames: a document's sentence graph
is dense n(n-1) with n ≈ tens — far below any shuffle's useful granularity.
The scalable axis is documents (10^12 of them), not sentences within one.
This mirrors how the engine treats pages vs links: pages fan out, per-page
link extraction is a vectorized kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from tldr_spark.functions.reference import SummarizeConfig, summarize

_SCHEMA = "doc_id long, summary string, n_sentences int"


def summarize_documents(
    docs: DataFrame,
    num: int = 3,
    algorithm: str = "pagerank",
    weighing: str = "hamming",
    max_characters: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: SummarizeConfig | None = None,
    sentences_col: str | None = None,
) -> DataFrame:
    """(doc_id, summary, n_sentences); summary = selected sentences joined
    by "\\n\\n" (the reference test fixtures' join, tldr_test.go:56).

    ``config`` exposes the FULL reference Bag surface distributedly
    (tldr.go:26-36,81-107): damping/tolerance/threshold/
    sentences_distance_threshold, an injected dictionary (SetDictionary),
    and the custom algorithm/weighing/tokenizer hooks — hook callables must
    be top-level functions (they ship to executors via pickle). When given,
    it overrides the scalar keyword shortcuts.

    ``sentences_col`` (array<string>) is the pre-split entry point
    (tldr.go:20,354, sentences_test.go): per-document sentence lists bypass
    the sentence tokenizer; the dictionary is then built from the re-joined
    sentences exactly as tldr.go:120-123 does.
    """
    from dataclasses import replace

    base = config or SummarizeConfig(
        algorithm=algorithm, weighing=weighing, max_characters=max_characters
    )
    cols = [id_col] + ([sentences_col] if sentences_col else [text_col])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            if sentences_col:
                for doc_id, sents_in in zip(pdf[id_col], pdf[sentences_col]):
                    # Arrow delivers array<string> cells as numpy arrays
                    sl = [] if sents_in is None else [str(s) for s in sents_in]
                    cfg = replace(base, sentences=sl)
                    sents = summarize("", num, cfg)
                    out.append((doc_id, "\n\n".join(sents), len(sents)))
            else:
                for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                    sents = summarize(text or "", num, base)
                    out.append((doc_id, "\n\n".join(sents), len(sents)))
            yield pd.DataFrame(out, columns=["doc_id", "summary", "n_sentences"])

    return docs.select(*cols).mapInPandas(run, _SCHEMA)
