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
    toks = F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+")
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
    toks = F.filter(F.split(F.trim(text), r"[ \t\n\r\f]+"), lambda t: t != "")
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
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\r\f]+"), lambda t: t != "")

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
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != "")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("fingerprint"),
    )


def _tokens(text_col: str):
    return F.filter(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != "")


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 filters):

      (doc_id, n_lines, dup_line_pm, n_grams, top_gram_pm)

    dup_line_pm: per-mille of lines that are repeats of an earlier line
    (1 - distinct/total). top_gram_pm: per-mille of n-gram occurrences
    taken by the single most frequent n-gram. Repetitious machine-generated
    pages score high on both and get filtered before training.

    Shape: the line stats are per-row array algebra (zero shuffle); the
    n-gram mode is explode + two-level aggregate on (doc, gram) — the
    composite key is high-cardinality and evenly spread, and map-side
    partial aggregation absorbs within-partition repeats, so the shuffle
    carries at most one row per distinct (doc, gram). Integer per-mille
    outputs keep the result bit-comparable across engines.
    """
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda s: F.trim(s) != ""
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.when(
            F.size(lines) > 0,
            ((F.size(lines) - F.size(F.array_distinct(lines))) * 1000)
            / F.size(lines),
        )
        .otherwise(0)
        .cast("long")
        .alias("dup_line_pm"),
        _tokens(text_col).alias("toks"),
    )
    grams = base.select(
        "doc_id",
        "n_lines",
        "dup_line_pm",
        F.when(
            F.size("toks") >= ngram,
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - ngram),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, ngram)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("grams"),
    )
    exploded = grams.select(
        "doc_id", F.explode_outer("grams").alias("g")
    )
    per_gram = exploded.filter(F.col("g").isNotNull()).groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"), F.max("c").alias("top_c")
    )
    return (
        grams.select("doc_id", "n_lines", "dup_line_pm")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_pm",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                (F.col("top_c") * 1000) / F.col("n_grams"),
            )
            .otherwise(0)
            .cast("long")
            .alias("top_gram_pm"),
        )
    )


def paragraph_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the CCNet / RefinedWeb paragraph
    pass): (doc_id, para_idx, para_hash, is_duplicate) — a paragraph is a
    duplicate unless it is the canonical first occurrence, canonical =
    lowest (doc_id, para_idx) among identical md5 hashes.

    Shape: explode to one row per paragraph, ONE shuffle on the hash
    (min_by aggregate to pick the canonical copy, broadcast-joined back is
    wrong at scale — it's a regular join on para_hash, co-partitioned with
    the aggregate so the second exchange is free).
    """
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\n[ \t\n\r\f]*\n"), lambda s: F.trim(s) != ""
            )
        ).alias("para_idx", "para"),
    ).select(
        "doc_id", "para_idx", F.md5(F.trim(F.col("para"))).alias("para_hash")
    )
    canon = paras.groupBy("para_hash").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("first")
    )
    return paras.join(canon, "para_hash").select(
        "doc_id",
        "para_idx",
        "para_hash",
        (
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("para_idx") != F.col("first.para_idx"))
        ).alias("is_duplicate"),
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination scan (the GPT-3-style n-gram
    decontamination pass): (doc_id, n_grams, contaminated, contaminated_pm)
    — per training document, how many of its word n-grams appear verbatim
    anywhere in the (much smaller) benchmark set.

    Shape: the benchmark's distinct gram hashes are the SMALL side —
    broadcast-joined (left-semi shape via inner join + distinct) against
    the exploded doc grams, so the big side never shuffles; at 10^12 docs
    the doc-gram stream stays partition-local and only the per-doc
    aggregate exchanges (one row per doc).
    """
    def gram_col(col: str):
        toks = _tokens(col)
        return F.when(
            F.size(toks) >= ngram,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - ngram),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, ngram))),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bench_grams = (
        benchmark.select(F.explode(gram_col(bench_text_col)).alias("gh"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode_outer(gram_col(text_col)).alias("i", "gh")
    )
    hits = (
        doc_grams.filter(F.col("gh").isNotNull())
        .join(F.broadcast(bench_grams.withColumn("hit", F.lit(1))), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("contaminated"),
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("contaminated", F.lit(0)).cast("long").alias("contaminated"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            (F.col("contaminated") * 1000) / F.col("n_grams"),
        )
        .otherwise(0)
        .cast("long")
        .alias("contaminated_pm"),
    )


def token_length_percentiles(
    docs: DataFrame,
    pcts: tuple = (50, 90, 99),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row (n_docs, p50_tokens, ..., max_tokens): EXACT nearest-rank
    percentiles of the whitespace-token length distribution — the numbers
    a pipeline turns into its length-filter / sequence-capacity knobs.

    Nearest-rank (value at rank ceil(p*n/100), 1-based, ascending) on
    integers is deterministic cross-engine; percentile INTERPOLATION is
    not (float blends), which is why this deliberately matches the
    ``type=1`` / ``quantile_disc`` convention.

    Scale shape: token count per doc (one narrow projection), one
    distributed total sort for ranks (nullmodel._global_ranks — no
    single-partition window), one n-row count broadcast, and a
    #pcts-row filter. A sort's cost class at any corpus size.
    """
    counts = token_count(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    from tldr_spark.operators.nullmodel import _global_ranks

    spark = docs.sparkSession
    n = counts.count()
    if n == 0:
        names = ["n_docs"] + [f"p{p}_tokens" for p in sorted(pcts)] + ["max_tokens"]
        return spark.createDataFrame(
            [tuple([0] * len(names))], ", ".join(f"{k} long" for k in names)
        )
    ranked = _global_ranks(counts, ["n_tokens", "doc_id"], "rk")
    targets = {p: -(-p * n // 100) for p in pcts}  # ceil(p*n/100)
    picks = ranked.filter(
        F.col("rk").isin(list({*targets.values(), n}))
    ).select("rk", "n_tokens").collect()
    by_rank = {r.rk: r.n_tokens for r in picks}
    row = [("n_docs", n)]
    row += [(f"p{p}_tokens", by_rank[targets[p]]) for p in sorted(targets)]
    row.append(("max_tokens", by_rank[n]))
    return spark.createDataFrame(
        [tuple(v for _, v in row)], ", ".join(f"{k} long" for k, _ in row)
    )


def cross_doc_span_stats(
    docs: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Cross-document duplicated-span coverage (the span-level exact-dedup
    measure of Lee et al. ACL'22 / RefinedWeb, at n-gram granularity):

      (doc_id, n_tok, covered_tokens, dup_span_pm)

    A token position is COVERED iff some n-gram window containing it also
    occurs in at least one OTHER document; dup_span_pm = per-mille of the
    document's tokens inside such spans. This is the signal behind
    "remove any substring of >= 50 tokens that appears more than once in
    the corpus" — reported per document so the filter threshold is a
    downstream choice.

    Shape: one gram shuffle (groupBy gram, count distinct doc — map-side
    combined), one semi-join back, then a PER-DOC window over the shared
    gram starts. Interval union collapses to min(n, s - lag(s)) because
    every span has length exactly n and starts arrive sorted — no
    interval tree, no per-row Python. Skew ceiling of the window is the
    longest document, not a hot gram.
    """
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    from pyspark.sql import Window

    from tldr_spark.operators.index import _tokens

    t = _tokens(docs, id_col, text_col)
    ntok = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    grams = (
        t.select(
            "doc_id",
            F.col("pos").alias("s"),
            F.concat_ws(" ", *parts).alias("gram"),
            F.lead("token", n - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )
    shared = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    st = grams.join(shared, "gram", "left_semi").select("doc_id", "s").distinct()
    ws = Window.partitionBy("doc_id").orderBy("s")
    cov = (
        st.withColumn(
            "contrib",
            F.least(F.lit(n), F.col("s") - F.coalesce(F.lag("s").over(ws), F.col("s") - n)),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("covered_tokens"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(ntok, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
        )
        .withColumn(
            "dup_span_pm",
            F.when(
                F.col("n_tok") > 0,
                F.expr("(covered_tokens * 1000) div n_tok"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    top_n: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1-row (n_top, slope, intercept) — OLS fit of ln(count) ~ ln(rank)
    over the corpus's ``top_n`` most frequent tokens: the Zipf
    rank-frequency exponent (slope ≈ -1 for natural language; template
    spam and generated boilerplate bend it visibly — Piantadosi 2014's
    corpus-health diagnostic at a single-number price).

    Shape: ONE map-side-combined token count over the corpus, then a
    TakeOrdered top-``top_n`` (no global sort materialized), a window
    rank over the ``top_n``-row result (bounded single partition — by
    construction, not by data), and one closed-form OLS aggregate:
    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²). Ties rank by (count desc,
    token asc), so the ranking is total and engine-independent. Fewer
    than 2 distinct tokens → NULL slope/intercept."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""
    )
    cnt = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), F.asc("token")).limit(int(top_n))
    w = Window.orderBy(F.desc("c"), F.asc("token"))
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxx, sxy = F.sum(F.col("x") * F.col("x")), F.sum(F.col("x") * F.col("y"))
    den = n * sxx - sx * sx
    slope = F.when(den != 0, (n * sxy - sx * sy) / den)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_top"),
        slope.alias("slope"),
        F.when(den != 0, (sy - ((n * sxy - sx * sy) / den) * sx) / n).alias(
            "intercept"
        ),
    )


def group_shingle_jaccard(
    docs: DataFrame,
    n: int = 3,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(grp_a, grp_b, n_a, n_b, n_common, jaccard) for every unordered
    group pair — exact Jaccard between the groups' distinct token
    ``n``-gram shingle sets. The corpus-overlap audit a training-data
    pipeline runs before mixing sources: two "independent" dumps with
    jaccard near 1 are the same crawl twice; near 0 they genuinely add
    coverage (the source-level view of what per-doc MinHash dedup sees
    pairwise).

    Shape: per-doc distinct shingles (one doc-partitioned window pass),
    one join to the group column, one (group, gram) distinct — THE
    corpus-sized shuffle, everything after is bounded by it — then a
    gram-keyed self-join whose fan-out per gram is at most |groups|²
    (groups are corpus metadata: sources, dumps, snapshots — a handful,
    never data-sized), and a |groups|-row size frame theta-joined for
    the full pair matrix (zero-overlap pairs included, jaccard = 0).
    """
    from tldr_spark.operators.dedup import shingles

    sh = shingles(docs, n, id_col, text_col)
    src = docs.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
    gs = sh.join(src, "id").select("grp", "gram").distinct().persist()
    sizes = gs.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grams"))
    a = gs.select(F.col("grp").alias("grp_a"), "gram")
    b = gs.select(F.col("grp").alias("grp_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("grp").alias("grp_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("grp_b"), F.col("n_grams").alias("n_b"))
    out = (
        sa.join(sb, F.col("grp_a") < F.col("grp_b"))
        .join(inter, ["grp_a", "grp_b"], "left")
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce("n_common", F.lit(0)))
            ).alias("jaccard"),
        )
        .localCheckpoint(eager=True)
    )
    gs.unpersist()
    return out


def boilerplate_top_grams(
    docs: DataFrame,
    n: int = 3,
    top_k: int = 5,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(source, gram, df, n_docs_source, df_ratio, rk) — per group, the
    ``top_k`` token ``n``-grams by document frequency within the group
    (ties broken gram-ascending so the ranking is total and
    cross-engine deterministic).

    The CCNet-style boilerplate probe: a gram that appears in a large
    fraction of one source's documents is template chrome (nav bars,
    cookie banners, footers), not content — this table is what you eyeball
    (or threshold) before stripping it. Shape at 10^12 docs: per-doc
    distinct shingles (doc-partitioned window, no shuffle), one
    (group, gram) count — the corpus-sized shuffle — then a window over
    each group's gram counts. The window partitions by group, which CAN
    skew (one giant dump); the count aggregate that precedes it has
    already collapsed the data to distinct (group, gram) rows, so the
    window input is vocabulary-sized, not corpus-sized.
    """
    from pyspark.sql import Window

    from tldr_spark.operators.dedup import shingles

    sh = shingles(docs, n, id_col, text_col)
    grp = docs.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
    df_ = (
        sh.join(grp, "id")
        .groupBy("grp", "gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs_source")
    )
    w = Window.partitionBy("grp").orderBy(F.desc("df"), F.asc("gram"))
    return (
        df_.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .join(n_docs, "grp")
        .select(
            F.col("grp").alias("source"),
            "gram",
            "df",
            "n_docs_source",
            (F.col("df").cast("double") / F.col("n_docs_source")).alias("df_ratio"),
            "rk",
        )
    )


def heaps_fit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1-row (n_points, slope, intercept) — OLS fit of ln(V) ~ ln(N) over
    the vocabulary-growth curve: after each document (in ``id_col``
    order), N = cumulative token count and V = cumulative distinct-token
    count. Heaps' law predicts V = K·N^beta with beta ≈ 0.4-0.6 for
    natural text; the corpus-health twin of :func:`zipf_fit` (a
    template-heavy corpus flattens beta the same way it bends the Zipf
    slope). slope = beta, intercept = ln K.

    Shape: the growth curve never materializes per-token state — each
    token's FIRST document is one min-aggregate, per-document token and
    new-vocabulary counts are two doc-keyed aggregates, and the cumulative
    sums are one running window over the |docs|-row result. Docs with zero
    tokens contribute flat curve points. Fewer than 2 points (or a
    degenerate all-equal N) → NULL slope/intercept."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+"), lambda t: t != ""
    )
    tok = docs.select(F.col(id_col).alias("d"), F.explode(toks).alias("token"))
    per_doc = tok.groupBy("d").agg(F.count(F.lit(1)).alias("nt"))
    first = tok.groupBy("token").agg(F.min("d").alias("d"))
    new_v = first.groupBy("d").agg(F.count(F.lit(1)).alias("nv"))
    base = (
        docs.select(F.col(id_col).alias("d"))
        .join(per_doc, "d", "left")
        .join(new_v, "d", "left")
        .fillna(0, ["nt", "nv"])
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    curve = base.select(
        F.sum("nt").over(w).alias("N"), F.sum("nv").over(w).alias("V")
    ).where(F.col("N") > 0)
    pts = curve.select(
        F.log(F.col("N").cast("double")).alias("x"),
        F.log(F.col("V").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxx, sxy = F.sum(F.col("x") * F.col("x")), F.sum(F.col("x") * F.col("y"))
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.when(den != 0, slope).alias("slope"),
        F.when(den != 0, (sy - slope * sx) / n).alias("intercept"),
    )


def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_distinct, entropy_bits) — per-document
    character-level Shannon entropy, the cheap two-sided garbage
    detector for webtext filtering: near-zero entropy flags repetition
    floods ("aaaa...", padded boilerplate), abnormally HIGH entropy
    flags base64/hex/minified blobs masquerading as text (normal English
    prose sits ~4.0-4.5 bits/char).

    H = (ln n - (1/n) * sum over chars c of count(c) * ln count(c)) / ln 2

    — the single-pass form: only counts enter the logs, so both engines
    feed libm the same integers. Docs with empty text produce no row.

    Scale shape: one char-level explode, then a (doc_id, char) hash
    aggregate whose map-side combine collapses each partition's stream
    to at most |alphabet| rows per doc before the shuffle, then a
    doc-keyed aggregate. No UDFs, no windows.
    """
    ch = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    hist = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        hist.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_distinct",
            (
                (F.log(F.col("n_chars")) - F.col("clogc") / F.col("n_chars"))
                / F.lit(0.6931471805599453)
            ).alias("entropy_bits"),
        )
    )


def blocklist_hits(
    docs: DataFrame,
    patterns: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, n_patterns_hit) — multi-pattern literal scan
    (policy blocklists, contamination canaries, brand-safety terms):
    per document, total non-overlapping occurrences across ``patterns``
    and how many distinct patterns fire. Occurrence counting is the
    replace-based integer identity

        hits(p) = (len(text) - len(replace(text, p, ''))) / len(p)

    — exact, engine-agnostic, no regex dialect. The doc x pattern grid
    is a |patterns|-row broadcast cross join (the tiny-broadcast class);
    one scan of the corpus, map-side-combined rollup. For thousands of
    patterns swap the grid for an Aho-Corasick pandas UDF — the rollup
    shape is unchanged."""
    pats = sorted(set(patterns))
    if not pats or any(not p for p in pats):
        raise ValueError("patterns must be non-empty strings")
    spark = docs.sparkSession
    pdf = spark.createDataFrame([(p,) for p in pats], "pat string")
    text = F.col(text_col)
    hits = (
        (F.length(text) - F.length(F.replace(text, F.col("pat"), F.lit(""))))
        / F.length(F.col("pat"))
    ).cast("long")
    return (
        docs.select(F.col(id_col).alias("doc_id"), text.alias(text_col))
        .crossJoin(F.broadcast(pdf))
        .select("doc_id", hits.alias("h"))
        .groupBy("doc_id")
        .agg(
            F.sum("h").alias("n_hits"),
            F.sum((F.col("h") > 0).cast("long")).alias("n_patterns_hit"),
        )
    )
