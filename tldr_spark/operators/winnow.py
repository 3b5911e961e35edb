"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS algorithm): sanitize text to [a-z0-9], hash every
character k-gram, then in every window of w consecutive k-gram hashes
select the minimum (rightmost position on ties) and keep the distinct
selected (position, hash) pairs. The guarantee: any substring match of
length >= w + k - 1 between two documents shares at least one selected
fingerprint, with expected density 2/(w+1) — local dedup evidence far
more robust than a whole-document hash and cheaper than MinHash when
the question is "which SPANS are shared", not "how similar overall".

Spark shape: grams are emitted by ONE generator (explode of a
transform(sequence) array — a Generate node is an optimizer barrier, so
every md5 is computed exactly once; an earlier all-higher-order-function
formulation let the interpreted lambdas re-evaluate the gram array per
window, O(len^2) hashing, 263s -> 2s at sf0.01), and the per-window
rightmost-argmin is a codegen'd SQL window aggregate:
max(struct(-h, p, h)) over (partition by doc order by p
rows between current and w-1 following) evaluated at each window START
row. Consecutive-window re-picks of the same gram are deduped with a
lag() on the SAME sorted window partition (picks of one position are
always a consecutive run of windows — once a smaller-or-tie-righter
hash enters from the right it never exits before the position does), so
fingerprint extraction costs exactly ONE doc-keyed sort shuffle of the
gram rows and no distinct. The shared-span pair query is then one
(fp -> doc list) shuffle with the same hot-key prune the TF-IDF/PMI
operators use: a fingerprint present in more than ``max_df`` documents
is boilerplate chrome and is dropped BEFORE the self-join, so fan-out
per surviving fingerprint is bounded by max_df**2, never corpus**2.

Cross-engine determinism: hash = first-8-hex md5(gram) as int64 (the
repo's established md5 bridge — dedup.py simhash, dsir.py buckets);
ties broken by position, all integers.

Degenerate cases: a document with fewer than k sanitized chars yields
no grams and drops out; with g grams where 1 <= g < w the single
window [1, g] selects exactly the global minimum (the paper's
convention for short documents) — the ROWS frame clips at the
partition end, which implements the clipping for the last windows of
every document too."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, fp): the selected winnowing fingerprints per document.
    ``pos`` is the 1-based k-gram start offset in the sanitized text."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if w < 1:
        raise ValueError("w must be >= 1")
    base = (
        docs.select(
            F.col(id_col).alias("id"),
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "").alias("_s"),
        )
        .withColumn("_ng", F.length("_s") - (k - 1))
        .where(F.col("_ng") >= 1)
    )
    grams = base.select(
        "id",
        "_ng",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("_ng")),
                lambda i: F.struct(
                    F.conv(
                        F.substring(F.md5(F.col("_s").substr(i, F.lit(k))), 1, 8), 16, 10
                    )
                    .cast("long")
                    .alias("h"),
                    i.alias("p"),
                ),
            )
        ).alias("g"),
    ).select("id", "_ng", F.col("g.h").alias("h"), F.col("g.p").alias("p"))
    # h < 2^32, so -h is safe in int64 and max(struct(-h, p, h)) is the
    # rightmost-min argmin of the frame
    frame = Window.partitionBy("id").orderBy("p").rowsBetween(0, w - 1)
    order = Window.partitionBy("id").orderBy("p")
    starts = (
        grams.withColumn(
            "_sel",
            F.max(
                F.struct(
                    (-F.col("h")).alias("nh"),
                    F.col("p").alias("p"),
                    F.col("h").alias("h"),
                )
            ).over(frame),
        )
        .where(F.col("p") <= F.greatest(F.col("_ng") - (w - 1), F.lit(1)))
        .withColumn("_prev", F.lag("_sel.p").over(order))
    )
    return starts.where(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("_sel.p"))
    ).select("id", F.col("_sel.p").alias("pos"), F.col("_sel.h").alias("fp"))


def winnow_shared_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 8,
    min_shared: int = 2,
    max_df: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, shared_fps) with id_a < id_b: document pairs sharing
    at least ``min_shared`` distinct fingerprint hashes — shared-span
    (plagiarism / boilerplate-overlap) candidates. Fingerprints present
    in more than ``max_df`` documents are pruned before the self-join
    (web boilerplate would otherwise quadratically dominate)."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    fps = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    doc_fp = fps.select("id", "fp").distinct()
    keep = (
        doc_fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("fp")
    )
    pruned = doc_fp.join(keep, "fp", "left_semi")
    a = pruned.select(F.col("id").alias("id_a"), "fp")
    b = pruned.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
