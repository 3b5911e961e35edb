"""Inverted-index retrieval primitives: positional postings, boolean
retrieval, phrase search, BM25 ranking.

A training-data pipeline needs retrieval long before it needs a serving
index — contamination scans, targeted corpus slicing ("all documents
mentioning X near Y"), and quality-weighted sampling are all ranked or
boolean retrieval over the corpus itself. Everything here is expressed
relationally so Catalyst keeps it JVM-side:

  postings      posexplode(tokens) → groupBy (doc, token): ONE shuffle,
                positions kept as a per-(doc,token) sorted int array whose
                length is bounded by the document, never by the corpus.
                The relational (token, doc_id, tf) form IS the index —
                bucket it by token on write (sources/sinks.py) and every
                term lookup below becomes an exchange-free scan.
  boolean       term filter → groupBy doc HAVING n_distinct_terms = |q|
                (AND) or >= 1 (OR). The filter prunes to query-term rows
                BEFORE any shuffle, so cost scales with sum(df(t)), not
                corpus size.
  phrase        k-way self-join of positional postings on
                (doc_id, pos - offset) — the classic positional-index
                adjacency join; fan-out per doc is bounded by tf, and the
                rarest-term-first join order keeps intermediates small.
  BM25          Robertson/Sparck-Jones idf (Lucene's non-negative variant:
                ln(1 + (N - df + .5)/(df + .5))), tf saturation k1, length
                normalization b against the corpus mean doc length; the
                N/avgdl scalars ride as a 1-row broadcast, never a collect.

Tokenization uses the engine-wide explicit class [ \\t\\n\\r\\f]+ (identical
semantics in Java regex and DuckDB RE2 — ADVICE r2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, token) — one row per token occurrence, pos 0-based."""
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != "")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "token")
    )


def token_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, doc_id, tf, positions) — the positional inverted index in
    relational form. ``positions`` is sorted ascending; its length equals
    ``tf`` (bounded per document, safe at any corpus size)."""
    return (
        _tokens(docs, id_col, text_col)
        .groupBy("token", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def boolean_retrieval(
    docs: DataFrame,
    terms: list[str],
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_terms_matched) for documents containing ALL query terms
    (``mode="and"``) or ANY (``mode="or"``). Duplicate query terms are
    collapsed; an empty term list raises (an empty AND would return the
    whole corpus, which is never what a caller wants silently)."""
    if mode not in ("and", "or"):
        raise ValueError(f"unknown mode {mode!r}")
    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("boolean_retrieval needs at least one term")
    hits = (
        _tokens(docs, id_col, text_col)
        .filter(F.col("token").isin(uniq))
        .groupBy("doc_id")
        .agg(F.count_distinct("token").alias("n_terms_matched"))
    )
    if mode == "and":
        hits = hits.filter(F.col("n_terms_matched") == len(uniq))
    return hits


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_matches) for documents containing the exact token
    sequence ``phrase`` (consecutive positions). k-way positional join:
    occurrence i of the match anchors at the FIRST token's position, and
    token j must appear at anchor + j. Fan-out per document is bounded by
    the phrase tokens' tfs."""
    if not phrase:
        raise ValueError("phrase_search needs a non-empty phrase")
    toks = _tokens(docs, id_col, text_col).persist()
    out = (
        toks.filter(F.col("token") == phrase[0])
        .select("doc_id", F.col("pos").alias("anchor"))
    )
    for j, term in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("token") == term).select(
            "doc_id", (F.col("pos") - j).alias("anchor")
        )
        out = out.join(nxt, ["doc_id", "anchor"], "left_semi")
    res = (
        out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .localCheckpoint(eager=True)
    )
    toks.unpersist()
    return res


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) — BM25 over the query ``terms`` for every document
    matching at least one term. idf is Lucene's non-negative variant
    ln(1 + (N - df + 0.5)/(df + 0.5)); doc length = token count; avgdl and
    N are corpus scalars carried as a 1-row broadcast join."""
    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("bm25_scores needs at least one term")
    tok = _tokens(docs, id_col, text_col)
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # avgdl = total tokens / total DOCUMENTS — empty documents count as
    # length 0 (they have no token rows, so avg(dl) over doclen would
    # silently average over non-empty docs only)
    n_avg = docs.select(F.count(F.lit(1)).alias("n_docs")).join(
        F.broadcast(doclen.agg(F.sum("dl").alias("tot_dl")))
    ).select("n_docs", (F.col("tot_dl") / F.col("n_docs")).alias("avgdl"))
    tfs = (
        tok.filter(F.col("token").isin(uniq))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tfs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        tfs.join(F.broadcast(dfq), "token")
        .join(doclen, "doc_id")
        .join(F.broadcast(n_avg))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global top-k by BM25 score, deterministic tie-break on doc_id asc.
    orderBy+limit compiles to TakeOrderedAndProject — per-partition heaps,
    only k rows per partition ever reach the driver-side merge."""
    return (
        bm25_scores(docs, terms, k1, b, id_col, text_col)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


ANCHOR_RE = r'<a\s+href="([^"]*)"\s*>([^<]*)</a>'


def anchor_text_index(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(dst_url, term, n_mentions, n_sources) — the anchor-text index: what
    the rest of the web CALLS each target page, the classic off-page
    retrieval signal (anchor terms often describe a target better than its
    own body text — Brin & Page '98 §2.2; Craswell et al. SIGIR'01).

    All JVM-side, zero UDFs: two `regexp_extract_all` passes over the html
    (same pattern, group 1 = href / group 2 = anchor text — identical match
    lists by construction) zipped and exploded, anchor text whitespace-
    tokenized, then ONE shuffle on (dst_url, term). Cost scales with total
    link count; at web scale this is the page-granularity companion of the
    host-graph rollup (pre-aggregate per partition, then the hash exchange).
    """
    html_s = F.col(html_col).cast("string")
    pat = F.lit(ANCHOR_RE)
    pairs = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(html_s, pat, F.lit(1)).alias("href"),
                F.regexp_extract_all(html_s, pat, F.lit(2)).alias("atext"),
            )
        ).alias("a"),
    ).select("src_url", F.col("a.href").alias("dst_url"), F.col("a.atext").alias("atext"))
    terms = pairs.select(
        "src_url",
        "dst_url",
        F.explode(F.split(F.trim(F.col("atext")), r"[ \t\n\r\f]+")).alias("term"),
    ).filter(F.col("term") != "")
    return terms.groupBy("dst_url", "term").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("src_url").alias("n_sources"),
    )


def posting_varbyte_sizes(
    docs: DataFrame,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index-compression planning: per token, the byte cost of its
    d-gap-encoded varbyte posting list vs the raw 8-byte-per-posting
    cost. The standard capacity model run before building an inverted
    index at scale (Manning IR ch.5).

    Contract: postings are DISTINCT doc ids sorted ascending; gap(1st) =
    doc_id + 1 (ids are 0-based), gap(next) = delta; varbyte cost per
    gap is pure integer threshold arithmetic (1..5 bytes for gaps up to
    2^35-1 — beyond any doc-id domain here), so it is bit-identical in
    any engine. Returns top_k tokens by vb_bytes DESC, token ASC:
    (token, df, vb_bytes, raw_bytes).

    Scale shape: ONE (token-keyed) shuffle for the lag window — the same
    partitioning the bucketed postings sink already provides, making the
    window exchange-free from storage; then a map-side-combined groupBy
    and a TakeOrderedAndProject top-k. No Python anywhere.
    """
    from pyspark.sql import Window

    post = (
        _tokens(docs, id_col, text_col)
        .select(F.col("token"), F.col("doc_id").alias("doc"))
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc")
    gaps = post.select(
        "token",
        (F.col("doc") - F.coalesce(F.lag("doc").over(w), F.lit(-1))).alias("gap"),
    )
    vb = (
        F.when(F.col("gap") < 128, 1)
        .when(F.col("gap") < 16384, 2)
        .when(F.col("gap") < 2097152, 3)
        .when(F.col("gap") < 268435456, 4)
        .otherwise(5)
    )
    return (
        gaps.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum(vb).alias("vb_bytes"),
        )
        .select("token", "df", "vb_bytes", (F.col("df") * 8).alias("raw_bytes"))
        .orderBy(F.desc("vb_bytes"), F.asc("token"))
        .limit(top_k)
    )


def ql_dirichlet_scores(
    docs: DataFrame,
    terms: list[str],
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) — query-likelihood retrieval with Dirichlet-prior
    smoothing (Zhai & Lafferty SIGIR'01), the language-modeling
    counterpart to BM25:

        score(d) = sum over query terms t of
                   ln( (tf(t,d) + mu * cf(t)/|C|) / (|d| + mu) )

    cf(t) = corpus frequency, |C| = total corpus tokens, |d| = doc
    length. Scored over documents matching at least one term — but the
    sum still includes the BACKGROUND contribution of the query terms a
    document lacks (tf=0), which is what makes QL a proper likelihood
    rather than a match-only accumulator.

    Scale shape mirrors :func:`bm25_scores`: the token stream is
    filtered to the |Q| query terms BEFORE any doc-keyed shuffle (cost ~
    sum of df, not corpus size); candidate-docs x terms is a |Q|-row
    broadcast cross join (the documented tiny-broadcast class); |C| and
    cf ride as 1-row / |Q|-row broadcasts.
    """
    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("ql_dirichlet_scores needs at least one term")
    tok = _tokens(docs, id_col, text_col)
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tot = doclen.agg(F.sum("dl").cast("double").alias("tot"))
    qtok = tok.filter(F.col("token").isin(uniq))
    cf = qtok.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    tfs = qtok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    cand = tfs.select("doc_id").distinct()
    grid = cand.crossJoin(F.broadcast(cf))
    return (
        grid.join(tfs, ["doc_id", "token"], "left")
        .join(doclen, "doc_id")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("tf"), F.lit(0)) + F.lit(mu) * F.col("cf") / F.col("tot"))
                / (F.col("dl") + F.lit(mu))
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )
