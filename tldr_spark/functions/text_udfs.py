"""Vectorized pandas UDFs over web-page text/html — the engine's only
Python↔JVM crossings (Arrow batches; no per-row Python UDFs anywhere).

``extract_text`` / ``extract_links`` implement the reference-derived
deterministic extraction rules: the SAME module-level Python functions run
row-wise in the pytest oracle and batch-wise here, which is what makes the
north rule's "byte-identical extracted text per url" invariant hold by
construction (BASELINE.json input_hint).

Regexes are compiled once at module import (the pandas-UDF analogue of the
reference's package-level compiled regexes, /root/reference/util.go:9-14).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from tldr_spark.functions.reference import (
    default_word_tokenizer,
    sanitize_word,
    tokenize_sentences,
)

# href extraction: double/single-quoted values of href attributes
_HREF_RE = re.compile(rb"""<a\s[^>]*?href\s*=\s*["']([^"'<>]+)["']""", re.IGNORECASE)
_TAG_RE = re.compile(r"<script\b.*?</script>|<style\b.*?</style>|<[^>]+>", re.DOTALL | re.IGNORECASE)
_WS_RE = re.compile(r"[ \t\f\v]+")
_NL_RE = re.compile(r"\n{3,}")


def extract_text_py(html: bytes | str | None) -> str:
    """Deterministic html→text: strip script/style/tags, collapse spaces,
    cap blank runs at one empty line, trim. Pure function — the oracle and
    the UDF share this exact code path (byte-identical per url)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    text = _TAG_RE.sub(" ", html)
    text = text.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">").replace(
        "&quot;", '"'
    ).replace("&#39;", "'").replace("&nbsp;", " ")
    lines = [_WS_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    return _NL_RE.sub("\n\n", "\n".join(lines)).strip()


def extract_links_py(html: bytes | str | None) -> list[str]:
    if html is None:
        return []
    if isinstance(html, str):
        html = html.encode("utf-8", errors="replace")
    return [m.decode("utf-8", errors="replace") for m in _HREF_RE.findall(html)]


def normalize_url_py(url: str) -> str:
    """Lowercase scheme+host, strip fragments and trailing slash."""
    url = url.strip()
    if "#" in url:
        url = url[: url.index("#")]
    if "://" in url:
        scheme, rest = url.split("://", 1)
        host, _, path = rest.partition("/")
        url = scheme.lower() + "://" + host.lower() + (("/" + path) if path else "")
    return url[:-1] if url.endswith("/") and url.count("/") > 3 else url


# --- pandas UDFs (Arrow-vectorized) ---------------------------------------

@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


@F.pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    return html.map(extract_links_py)


@F.pandas_udf(StringType())
def normalize_url(url: pd.Series) -> pd.Series:
    return url.map(normalize_url_py)


@F.pandas_udf(ArrayType(StringType()))
def split_sentences(text: pd.Series) -> pd.Series:
    return text.map(lambda t: tokenize_sentences(t or ""))


@F.pandas_udf(ArrayType(StringType()))
def tokenize_words(sentence: pd.Series) -> pd.Series:
    return sentence.map(lambda s: default_word_tokenizer(s or ""))


@F.pandas_udf(StringType())
def sanitize(word: pd.Series) -> pd.Series:
    return word.map(lambda w: sanitize_word(w or ""))
