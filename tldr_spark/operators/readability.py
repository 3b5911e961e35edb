"""Classic readability statistics (Flesch '48 Reading Ease, Kincaid
'75 grade level) — the standard cheap quality-filter features
(C4/CCNet-style pipelines gate on exactly these shapes: too-low or
too-high grade text is boilerplate or gibberish).

Counting rules, chosen to be exactly reproducible in any engine:
  words      = whitespace tokens
  sentences  = segments of a split on [.!?]+ containing at least one
               alphanumeric (lowercased); 0 such segments with >= 1
               word counts as ONE sentence (headline convention)
  syllables  = per word, the number of [aeiouy]+ runs in the
               lowercased word, floored at 1 (the standard crude rule)

FRE  = 206.835 - 1.015 * W/S - 84.6 * SYL/W
FKGL = 0.39 * W/S + 11.8 * SYL/W - 15.59

Spark shape: everything is per-row array/regex algebra over one corpus
scan — ZERO shuffles, no UDFs; counts are exact integers and the two
scores are three double ops from those integers."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_sents, n_syll, fre, fkgl). Zero-word
    documents drop out."""
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""
    )
    n_words = F.size(words)
    sents = F.filter(
        F.split(F.lower(F.col(text_col)), r"[.!?]+"),
        lambda s: s.rlike("[a-z0-9]"),
    )
    n_sents = F.greatest(F.size(sents), F.lit(1))
    n_syll = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(F.regexp_count(F.lower(w), F.lit("[aeiouy]+")), F.lit(1)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    wps = n_words.cast("double") / n_sents
    spw = n_syll.cast("double") / n_words
    return docs.where(n_words >= 1).select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sents"),
        n_syll.cast("long").alias("n_syll"),
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias("fre"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias("fkgl"),
    )
