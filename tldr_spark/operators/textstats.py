"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting — all JVM-side built-ins (no UDFs),
so every operator here is whole-stage-codegen'd AND oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny deterministic stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
}


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_alpha_tokens) — whitespace + BPE-ish word regex."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(toks, lambda t: t != "")).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[a-zA-Z']+$"))).alias("n_alpha_tokens"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, punct_ratio_x1000, stopword_ratio_x1000, quality)

    Ratios scaled to integer per-mille so cross-engine float noise cannot
    flip a comparison; ``quality`` is a deterministic 0-3 bucket combining
    length, punctuation density, and stopword density — the standard web
    quality heuristics, relationally.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    n_tok = F.size(toks)
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    punct_pm = F.when(n_chars > 0, (n_punct * 1000) / n_chars).otherwise(0).cast("long")
    stop_pm = F.when(n_tok > 0, (n_stop * 1000) / n_tok).otherwise(0).cast("long")
    quality = (
        F.when(n_tok >= 10, 1).otherwise(0)
        + F.when(punct_pm < 100, 1).otherwise(0)
        + F.when(stop_pm >= 20, 1).otherwise(0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        punct_pm.alias("punct_ratio_x1000"),
        stop_pm.alias("stopword_ratio_x1000"),
        quality.cast("int").alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, en_hits, de_hits, fr_hits) — stopword-hit
    heuristic; argmax with deterministic en > de > fr priority on ties."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")

    # NB: F.filter treats a two-arg lambda as (element, index) — a default
    # arg like `lambda t, sw=sw:` silently binds sw to the INDEX column
    def _hit(sw: list[str]):
        return lambda t: t.isin(sw)

    hits = {
        lang: F.size(F.filter(toks, _hit(sw))).cast("long")
        for lang, sw in STOPWORDS.items()
    }
    pred = (
        F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]), "en")
        .when(hits["de"] >= hits["fr"], "de")
        .otherwise("fr")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        hits["en"].alias("en_hits"),
        hits["de"].alias("de_hits"),
        hits["fr"].alias("fr_hits"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — md5 of the sorted distinct token set: a
    content fingerprint invariant to token order/duplication (bag-of-words
    identity), the relational analogue of a rolling-hash sketch."""
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fingerprint"),
    )
