"""Distributed suffix arrays by prefix doubling, with rank-table LCPs —
the exact-substring machinery under "Deduplicating Training Data Makes
Language Models Better" (Lee et al., ACL'22): finding ARBITRARY-length
repeated spans, not fixed-n grams (textstats.cross_doc_span_stats is the
n-gram approximation; this is the exact per-document instrument).

Construction (Manber-Myers prefix doubling, fully relational):
  round 0:  rank_0(p) = global character ordinal (tiny broadcast dict)
  round j:  key(p) = (rank_{j-1}(p), rank_{j-1}(p + 2^{j-1}) or -1)
            rank_j = dense_rank over key  — per-document windows
Suffixes never cross documents, so every window partitions by doc_id:
state per task is bounded by document length (web documents are
MB-bounded), and documents spread across the cluster. ceil(log2 maxlen)
rounds, one self-join + one dense_rank window each; early-stops when all
ranks are distinct.

LCP WITHOUT Kasai (Kasai is inherently sequential): keep every round's
rank table; for two positions the classic sparse-table descent runs as
J = ceil(log2 maxlen) BATCH rounds over the whole pairs frame —
  for j = J-1 .. 0:  if rank_j(a + acc) == rank_j(b + acc): acc += 2^j
— each round is one join of the pairs frame against rank table j. Within
a document, rank_j equality holds iff the first 2^j characters from both
positions exist and agree (end-sentinels make truncated blocks unequal),
so the accumulated acc is exactly the LCP. Everything is joins +
windows; zero Python UDFs, zero driver loops over data.

End-of-string order matches engine collation for ASCII: the -1 sentinel
sorts a shorter prefix-suffix first, which is byte-lexicographic order —
the same ORDER BY the DuckDB oracle applies to materialized suffix
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _char_ranks(chars: DataFrame) -> DataFrame:
    """(ch, crank): global character ordinals — alphabet-sized."""
    w = Window.orderBy("ch")
    return chars.select("ch").distinct().select(
        "ch", F.row_number().over(w).cast("long").alias("crank")
    )


def suffix_array_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int | None = None,
) -> tuple[DataFrame, list[DataFrame], int]:
    """Returns (final_ranks, per_round_rank_tables, J).

    final_ranks: (doc_id, pos, rank) — rank orders the suffixes of each
    document lexicographically (dense 1..n per doc once at least one
    doubling round has run; ordering-correct always).
    per_round_rank_tables[j]: (doc_id, pos, r) ranks after round j
    (prefix length 2^j). J = number of doubling rounds run.
    ``max_len`` truncates every text first (oracle-bounded variants)."""
    text = F.col(text_col)
    if max_len is not None:
        text = F.substring(text, 1, max_len)
    chars = (
        docs.select(F.col(id_col).alias("doc_id"), text.alias("t"))
        .select("doc_id", F.posexplode(F.split(F.col("t"), "")).alias("pos", "ch"))
        .filter(F.col("ch") != "")
    )
    cr = _char_ranks(chars)
    r = (
        chars.join(F.broadcast(cr), "ch")
        .select("doc_id", "pos", F.col("crank").alias("r"))
        .persist()
    )
    n_max = r.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    if n_max is None:
        return r.select("doc_id", "pos", F.col("r").alias("rank")), [r], 0
    tables = [r]
    j = 0
    step = 1
    while step < n_max:
        nxt = tables[-1].select(
            "doc_id", (F.col("pos") - step).alias("pos"), F.col("r").alias("r2")
        )
        w = Window.partitionBy("doc_id").orderBy("r", "r2n")
        new = (
            tables[-1]
            .join(nxt, ["doc_id", "pos"], "left")
            .select(
                "doc_id", "pos", "r", F.coalesce(F.col("r2"), F.lit(-1)).alias("r2n")
            )
            .select(
                "doc_id", "pos", F.dense_rank().over(w).cast("long").alias("r")
            )
            .localCheckpoint(eager=False)
            .persist()
        )
        new.count()
        tables.append(new)
        j += 1
        step *= 2
        # early stop: every suffix already has a unique rank
        stats = new.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct("r").alias("d")
        ).agg(F.sum(F.col("n") - F.col("d")).alias("ties")).collect()[0]
        if stats["ties"] == 0:
            break
    final = tables[-1].select("doc_id", "pos", F.col("r").alias("rank"))
    return final, tables, j


def _lcp_of_pairs(
    pairs: DataFrame, tables: list[DataFrame], j_top: int
) -> DataFrame:
    """pairs: (doc_id, pa, pb) -> (doc_id, pa, pb, lcp) via the batched
    sparse-table descent (one join per level)."""
    cur = pairs.select("doc_id", "pa", "pb", F.lit(0).cast("long").alias("acc"))
    for j in range(min(j_top, len(tables) - 1), -1, -1):
        step = 1 << j
        ra = tables[j].select(
            "doc_id", F.col("pos").alias("_pra"), F.col("r").alias("_ra")
        )
        rb = tables[j].select(
            "doc_id", F.col("pos").alias("_prb"), F.col("r").alias("_rb")
        )
        cur = (
            cur.withColumn("_pra", F.col("pa") + F.col("acc"))
            .withColumn("_prb", F.col("pb") + F.col("acc"))
            .join(ra, ["doc_id", "_pra"], "left")
            .join(rb, ["doc_id", "_prb"], "left")
            .select(
                "doc_id",
                "pa",
                "pb",
                (
                    F.col("acc")
                    + F.when(
                        F.col("_ra").isNotNull()
                        & (F.col("_ra") == F.col("_rb")),
                        F.lit(step),
                    ).otherwise(F.lit(0))
                ).alias("acc"),
            )
        )
    return cur.withColumnRenamed("acc", "lcp")


def longest_repeated_substring(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int | None = None,
) -> DataFrame:
    """(doc_id, doc_len, lrs_len) — length of the longest substring that
    occurs at least twice WITHIN each document (0 when all characters
    are distinct; docs with empty text produce no row). lrs_len = max
    LCP between suffix-array-adjacent suffixes — the exact repetition
    instrument (a high lrs_len/doc_len ratio is template spam)."""
    final, tables, j_top = suffix_array_ranks(docs, id_col, text_col, max_len)
    w = Window.partitionBy("doc_id").orderBy("rank")
    adj = (
        final.select("doc_id", "pos", "rank")
        .withColumn("prev_pos", F.lag("pos").over(w))
        .filter(F.col("prev_pos").isNotNull())
        .select("doc_id", F.col("prev_pos").alias("pa"), F.col("pos").alias("pb"))
    )
    lcps = _lcp_of_pairs(adj, tables, j_top)
    doclen = tables[0].groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    out = doclen.join(
        lcps.groupBy("doc_id").agg(F.max("lcp").alias("lrs_len")), "doc_id", "left"
    ).select(
        "doc_id", "doc_len", F.coalesce("lrs_len", F.lit(0)).alias("lrs_len")
    )
    for t in tables:
        t.unpersist()
    return out


def _dense_global_ranks(cur: DataFrame) -> DataFrame:
    """(doc_id, pos, r, r2n) -> (doc_id, pos, r) with r = dense GLOBAL
    rank of the (r, r2n) key — distinct keys ranked by the
    range-partitioned prefix sum (never a single-partition window), then
    joined back. The global-suffix-array analogue of the per-doc
    dense_rank window."""
    from tldr_spark.operators.packing import _global_prefix_sum

    keys = (
        cur.select("r", "r2n").distinct().withColumn("_one", F.lit(1).cast("long"))
    )
    ranked = _global_prefix_sum(keys, ["r", "r2n"], "_one", "_pre").select(
        "r", "r2n", (F.col("_pre") + 1).alias("_nr")
    )
    return cur.join(ranked, ["r", "r2n"]).select(
        "doc_id", "pos", F.col("_nr").alias("r")
    )


def global_suffix_tables(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int | None = None,
) -> tuple[DataFrame, list[DataFrame], int]:
    """Corpus-WIDE suffix ordering: ranks are comparable ACROSS documents
    (suffixes still never cross doc boundaries). Identical suffixes in
    different documents keep tied ranks — ties are real duplicates and
    are broken by (doc_id, pos) only when a total order is needed.
    Same return shape as :func:`suffix_array_ranks`."""
    text = F.col(text_col)
    if max_len is not None:
        text = F.substring(text, 1, max_len)
    chars = (
        docs.select(F.col(id_col).alias("doc_id"), text.alias("t"))
        .select("doc_id", F.posexplode(F.split(F.col("t"), "")).alias("pos", "ch"))
        .filter(F.col("ch") != "")
    )
    cr = _char_ranks(chars)
    r = (
        chars.join(F.broadcast(cr), "ch")
        .select("doc_id", "pos", F.col("crank").alias("r"))
        .persist()
    )
    n_max = r.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    if n_max is None:
        return r.select("doc_id", "pos", F.col("r").alias("rank")), [r], 0
    tables = [r]
    j = 0
    step = 1
    while step < n_max:
        nxt = tables[-1].select(
            "doc_id", (F.col("pos") - step).alias("pos"), F.col("r").alias("r2")
        )
        keyed = (
            tables[-1]
            .join(nxt, ["doc_id", "pos"], "left")
            .select(
                "doc_id", "pos", "r", F.coalesce(F.col("r2"), F.lit(-1)).alias("r2n")
            )
        )
        new = _dense_global_ranks(keyed).localCheckpoint(eager=False).persist()
        new.count()
        tables.append(new)
        j += 1
        step *= 2
    final = tables[-1].select("doc_id", "pos", F.col("r").alias("rank"))
    return final, tables, j


def _lcp_of_cross_pairs(
    pairs: DataFrame, tables: list[DataFrame], j_top: int, doclen: DataFrame
) -> DataFrame:
    """pairs: (da, pa, db, pb) -> + lcp, via the same batched sparse-table
    descent as :func:`_lcp_of_pairs` but with per-side (doc, pos) keys —
    the cross-document variant.

    Extra guard the within-doc descent does not need: two IDENTICAL
    suffixes from different documents carry equal level-j ranks even
    when fewer than 2^j characters remain (the truncated blocks match
    end to end), so a step is added only when BOTH sides still have a
    full 2^j block — the end-of-doc tail then resolves at the lower
    levels, yielding exactly min-length for true duplicate suffixes.
    ``doclen``: (doc_id, doc_len)."""
    la = doclen.select(F.col("doc_id").alias("da"), F.col("doc_len").alias("_la"))
    lb = doclen.select(F.col("doc_id").alias("db"), F.col("doc_len").alias("_lb"))
    cur = (
        pairs.select("da", "pa", "db", "pb", F.lit(0).cast("long").alias("acc"))
        .join(la, "da")
        .join(lb, "db")
    )
    for j in range(min(j_top, len(tables) - 1), -1, -1):
        step = 1 << j
        ra = tables[j].select(
            F.col("doc_id").alias("da"), F.col("pos").alias("_pra"), F.col("r").alias("_ra")
        )
        rb = tables[j].select(
            F.col("doc_id").alias("db"), F.col("pos").alias("_prb"), F.col("r").alias("_rb")
        )
        fits = (F.col("pa") + F.col("acc") + step <= F.col("_la")) & (
            F.col("pb") + F.col("acc") + step <= F.col("_lb")
        )
        cur = (
            cur.withColumn("_pra", F.col("pa") + F.col("acc"))
            .withColumn("_prb", F.col("pb") + F.col("acc"))
            .join(ra, ["da", "_pra"], "left")
            .join(rb, ["db", "_prb"], "left")
            .select(
                "da",
                "pa",
                "db",
                "pb",
                "_la",
                "_lb",
                (
                    F.col("acc")
                    + F.when(
                        fits
                        & F.col("_ra").isNotNull()
                        & (F.col("_ra") == F.col("_rb")),
                        F.lit(step),
                    ).otherwise(F.lit(0))
                ).alias("acc"),
            )
        )
    return cur.select("da", "pa", "db", "pb", F.col("acc").alias("lcp"))


def cross_doc_longest_repeat(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int | None = None,
) -> DataFrame:
    """1-row (lrs_len, doc_a, doc_b, pos_a, pos_b) — the longest substring
    shared by TWO DIFFERENT documents anywhere in the corpus (the exact
    Lee et al. cross-document duplicated-span primitive, arbitrary
    length — not n-gram-bounded). By the suffix-array boundary lemma the
    max cross-doc LCP is achieved at an ADJACENT pair of suffixes from
    different docs in the global suffix order, so the search is one
    adjacency join + one LCP descent — never all-pairs. Deterministic
    argmax: (lcp DESC, doc_a, doc_b, pos_a, pos_b). Empty/cross-doc-free
    corpora yield lrs_len 0 with NULL ids."""
    from tldr_spark.operators.packing import _global_prefix_sum

    final, tables, j_top = global_suffix_tables(docs, id_col, text_col, max_len)
    ordered = _global_prefix_sum(
        final.withColumn("_one", F.lit(1).cast("long")),
        ["rank", "doc_id", "pos"],
        "_one",
        "_p",
    )
    a = ordered.select(
        F.col("doc_id").alias("da"), F.col("pos").alias("pa"), F.col("_p").alias("_p")
    )
    b = ordered.select(
        F.col("doc_id").alias("db"), F.col("pos").alias("pb"), (F.col("_p") - 1).alias("_p")
    )
    adj = a.join(b, "_p").filter(F.col("da") != F.col("db")).select("da", "pa", "db", "pb")
    doclen = tables[0].groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    lcps = _lcp_of_cross_pairs(adj, tables, j_top, doclen)
    spark = docs.sparkSession
    top = (
        lcps.orderBy(F.desc("lcp"), "da", "db", "pa", "pb").limit(1).collect()
    )
    for t in tables:
        t.unpersist()
    if not top:
        return spark.createDataFrame(
            [(0, None, None, None, None)],
            "lrs_len long, doc_a long, doc_b long, pos_a long, pos_b long",
        )
    r = top[0]
    return spark.createDataFrame(
        [(int(r["lcp"]), int(r["da"]), int(r["db"]), int(r["pa"]), int(r["pb"]))],
        "lrs_len long, doc_a long, doc_b long, pos_a long, pos_b long",
    )


def bwt_run_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int | None = None,
) -> DataFrame:
    """(doc_id, doc_len, bwt_runs) — number of equal-character runs in
    each document's Burrows-Wheeler transform, i.e. the `r` of the
    r-index / bzip2 family: the standard COMPRESSIBILITY measure that
    arbitrary-window entropy misses (r/doc_len near 0 = templated or
    repetitive text, near 1 = incompressible). BWT comes free from the
    suffix array already built here: BWT[i] = T[SA[i] - 1] (sentinel for
    SA[i] = 0), runs counted with one rank-ordered per-doc window."""
    from pyspark.sql import Window

    text = F.col(text_col)
    if max_len is not None:
        text = F.substring(text, 1, max_len)
    chars = (
        docs.select(F.col(id_col).alias("doc_id"), text.alias("t"))
        .select("doc_id", F.posexplode(F.split(F.col("t"), "")).alias("pos", "ch"))
        .filter(F.col("ch") != "")
    )
    final, tables, _ = suffix_array_ranks(docs, id_col, text_col, max_len)
    prev_ch = chars.select(
        "doc_id", (F.col("pos") + 1).alias("pos"), F.col("ch").alias("pch")
    )
    bwt = final.join(prev_ch, ["doc_id", "pos"], "left").select(
        "doc_id", "rank", F.coalesce(F.col("pch"), F.lit("\x00")).alias("bch")
    )
    w = Window.partitionBy("doc_id").orderBy("rank")
    runs = (
        bwt.withColumn("prev", F.lag("bch").over(w))
        .select(
            "doc_id",
            (F.col("prev").isNull() | (F.col("prev") != F.col("bch")))
            .cast("long")
            .alias("brk"),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("doc_len"), F.sum("brk").alias("bwt_runs"))
    )
    for t in tables:
        t.unpersist()
    return runs
