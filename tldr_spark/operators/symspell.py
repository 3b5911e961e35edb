"""Edit-distance-1 pair discovery via the SymSpell deletion
neighborhood (Garbe 2012, the spelling-correction industry standard):
every string generates itself plus its |s| single-character deletions;
two strings at edit distance <= 1 ALWAYS share a neighborhood entry
(substitution: both delete the differing position; insert/delete: the
longer string's deletion equals the shorter string; equality: the
identity entry), so an equi-join on the deletion variant is a
complete candidate generator and a single levenshtein() check
verifies. No all-pairs comparison ever happens.

Spark shape: the variant list is a per-row array expression (ZERO
shuffles to generate); candidates are ONE variant-keyed equi-join of
(variant, string) against itself — fan-out per string is |s| + 1 rows,
per variant the strings within one deletion of it — then one exact
levenshtein filter (JVM built-in) and a distinct. Linear in total
string length, never quadratic in the vocabulary; the classic trick
that makes fuzzy matching feasible on 10^9-row name columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edit1_pairs(strings: DataFrame, col: str = "s") -> DataFrame:
    """(s_a, s_b) with s_a < s_b for every DISTINCT string pair at
    levenshtein distance exactly 1."""
    toks = strings.select(F.col(col).alias("s")).where(F.col("s").isNotNull()).distinct()
    variants = toks.select(
        "s",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("s")),
                    F.transform(
                        F.sequence(F.lit(1), F.length("s")),
                        lambda i: F.concat(
                            F.col("s").substr(F.lit(1), i - 1),
                            F.col("s").substr(i + 1, F.length("s")),
                        ),
                    ),
                )
            )
        ).alias("v"),
    )
    a = variants.select(F.col("s").alias("s_a"), "v")
    b = variants.select(F.col("s").alias("s_b"), "v")
    return (
        a.join(b, "v")
        .where(F.col("s_a") < F.col("s_b"))
        .select("s_a", "s_b")
        .distinct()
        .where(F.levenshtein("s_a", "s_b") == 1)
    )
