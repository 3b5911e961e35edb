"""Distributed BPE vocabulary induction (Sennrich, Haddow & Birch ACL'16).

Learns the first M byte-pair-encoding merges over a (word, count)
vocabulary: each round counts adjacent symbol pairs weighted by word
frequency, picks the most frequent pair (ties broken lexicographically
— deterministic, no RNG), and merges every non-overlapping occurrence
left-to-right in all words.

Spark shape, per round (all JVM-side — zero Python UDFs):

  1. pair counts: one explode of the zipped symbol array + one
     map-side-combined groupBy; the winning pair is a 1-row action
     (M rounds -> M O(1) collects, the same bounded driver pattern as
     PageRank's convergence scalar).
  2. merge: the greedy left-to-right non-overlap rule is NOT a fold —
     a position i merges iff symbols (i, i+1) match the pair AND i is
     at an EVEN offset within its maximal run of consecutive matches
     (consecutive matches only occur for a == b, i.e. runs of one
     repeated symbol; for a != b a match at i blocks i+1 from matching
     at all). Even-offset-in-run is pure window algebra: flag -> run id
     (conditional cumsum) -> offset parity -> kill the right neighbor
     of every selected position -> rebuild the array with collect_list
     over (index, symbol) structs. Windows are partitioned by WORD, so
     the skew ceiling is the longest word, never a hot vocabulary key.

Cost per round is O(total symbols) with one shuffle (the per-word
window) — the vocabulary (10^8 distinct words at web scale) never
funnels through the driver; only the argmax row does. The same parity
construction is what the DuckDB oracle unrolls, so the driver query is
hash-exact, including the a == b run chains.

Character splitting uses substring(word, i, 1) over a 1..char_length
sequence (codepoint semantics, identical in DuckDB) rather than
split(word, '') (UTF-16 code units — would disagree with the oracle on
non-BMP text).

Reference semantics scope: didasy/tldr tokenizes by whitespace only
(util.go); subword vocabulary induction is part of this engine's
LLM-pipeline layer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F


@dataclass
class BpeResult:
    merges: DataFrame  # (merge_rank, a, b, pair_count) — learned in order
    vocab: DataFrame   # (word, n, syms) after all merges applied


def _char_split(col):
    return F.expr(
        f"transform(sequence(1, char_length({col})), i -> substring({col}, i, 1))"
    )


def merge_pair(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge (a, b) -> a||b to (word, n, syms), greedy
    left-to-right non-overlapping — the window-parity construction."""
    w = Window.partitionBy("word").orderBy("i")
    toks = vocab.select(
        "word", "n", F.posexplode("syms").alias("i", "s")
    )
    flagged = toks.withColumn(
        "m", (F.col("s") == a) & (F.lead("s").over(w) == b)
    )
    # run id over consecutive matches (only a == b produces runs > 1)
    runs = flagged.withColumn(
        "runstart",
        F.when(
            F.col("m") & ~F.coalesce(F.lag("m").over(w), F.lit(False)), F.col("i")
        ),
    ).withColumn(
        "run0", F.when(F.col("m"), F.last("runstart", ignorenulls=True).over(w))
    )
    sel = runs.withColumn(
        "sel", F.col("m") & ((F.col("i") - F.col("run0")) % 2 == 0)
    ).withColumn(
        "killed", F.coalesce(F.lag("sel").over(w), F.lit(False))
    )
    rebuilt = (
        sel.filter(~F.col("killed"))
        .select(
            "word",
            "n",
            "i",
            F.when(F.col("sel"), F.lit(a + b)).otherwise(F.col("s")).alias("s"),
        )
        .groupBy("word", "n")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "s"))), lambda x: x["s"]
            ).alias("syms")
        )
    )
    return rebuilt


def bpe_learn(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "n",
) -> BpeResult:
    """Learn ``n_merges`` BPE merges from a (word, count) vocabulary.
    Stops early when no adjacent pair remains (every word fully merged).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    spark = words.sparkSession
    vocab = words.select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("long").alias("n"),
        _char_split(word_col).alias("syms"),
    ).filter(F.char_length("word") > 0)
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "n")
            .groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((r, a, b, cnt))
        # lineage truncation per round: M rounds of window+groupBy would
        # otherwise stack into one deep plan (same move as the PageRank loop)
        vocab = merge_pair(vocab, a, b).localCheckpoint(eager=True)

    mdf = (
        spark.createDataFrame(
            merges, "merge_rank long, a string, b string, pair_count long"
        )
        if merges
        else spark.createDataFrame([], "merge_rank long, a string, b string, pair_count long")
    )
    return BpeResult(mdf, vocab)


def bpe_segment(vocab: DataFrame) -> DataFrame:
    """(word, n, n_subwords, segmented): the learned segmentation as a
    space-joined string — the compression view of the merge table."""
    return vocab.select(
        "word",
        "n",
        F.size("syms").alias("n_subwords"),
        F.array_join("syms", " ").alias("segmented"),
    )
