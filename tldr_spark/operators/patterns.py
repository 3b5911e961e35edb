"""Regex pattern scanning + redaction — the policy pass of a webtext
pipeline (PII masking, contact-info audits, boilerplate-marker scans).

Everything is JVM-side `regexp_extract_all` / `regexp_replace` over the
text column — no Python per row, one corpus scan per call, output bounded
by |docs| (scan) or |patterns| (profile). Patterns must stay in the
RE2-compatible subset (no backreferences / lookaround) so the Spark (Java
regex) and DuckDB (RE2) sides agree; the defaults below are in that
subset, and both engines implement leftmost non-overlapping matching for
them.

Reference parity note: the reference engine has no policy scan — this is
part of the training-data-pipeline surface the brief adds beyond
`/root/reference` (SURVEY.md "beyond the reference" list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Conservative PII-ish defaults: RE2-safe, no \s / \b shorthand drift
# (Java's \s includes \x0B, RE2's does not — spelled-out classes only).
DEFAULT_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}",
    "url": r"https?://[A-Za-z0-9./_%+?=&#:~-]+",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "digit_run9": r"[0-9]{9,}",
}


def pattern_counts(
    docs: DataFrame,
    patterns: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, <one count column per pattern name>): non-overlapping
    match counts per document. One scan, |patterns| regex passes per row,
    all inside whole-stage codegen."""
    patterns = DEFAULT_PATTERNS if patterns is None else patterns
    if not patterns:
        raise ValueError("patterns must be non-empty")
    cols = [F.col(id_col).alias("doc_id")]
    for name, pat in patterns.items():
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
            .cast("long")
            .alias(name)
        )
    return docs.select(*cols)


def pattern_profile(
    docs: DataFrame,
    patterns: dict[str, str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(pattern, docs_hit, total_hits, max_per_doc): corpus rollup of the
    per-doc scan — the number a policy review reads before deciding to
    redact. |patterns| result rows; zero-hit patterns are kept (explicit
    0s beat silently missing rows in an audit). Shape: the per-doc counts
    are unpivoted via a literal |patterns|-element array (stack), then ONE
    map-side-combined aggregate; no shuffle carries text."""
    counts = pattern_counts(docs, patterns, id_col=id_col, text_col=text_col)
    names = [c for c in counts.columns if c != "doc_id"]
    pairs = F.array(
        *[F.struct(F.lit(n).alias("pattern"), F.col(n).alias("n")) for n in names]
    )
    long = counts.select(F.explode(pairs).alias("p")).select("p.pattern", "p.n")
    return long.groupBy("pattern").agg(
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).cast("long").alias("docs_hit"),
        F.sum("n").cast("long").alias("total_hits"),
        F.max("n").cast("long").alias("max_per_doc"),
    )


def redact(
    docs: DataFrame,
    pattern: str,
    mask: str = "<MASK>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, redacted): every non-overlapping match of
    ``pattern`` replaced by ``mask`` (Spark regexp_replace is global,
    matching DuckDB's 'g' flag). The full redacted text stays in the row —
    downstream writes it back out; hash it if only provenance is needed."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(pattern), 0)).cast("long").alias("n_hits"),
        F.regexp_replace(t, F.lit(pattern), F.lit(mask)).alias("redacted"),
    )
