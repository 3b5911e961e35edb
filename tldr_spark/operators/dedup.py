"""Document deduplication for large-scale training-data pipelines.

Generalizes the reference's two-pass sentence dedup
(/root/reference/util.go:159-221 — O(n²) pairwise Jaro + substring
containment) into the shapes that survive 10^12 documents:

  exact_dedup          hash-groupBy on a digest — one shuffle
  minhash_lsh_pairs    shingle → minhash signature → band-bucket join —
                       candidate generation is equi-join on (band, value),
                       NEVER an all-pairs comparison
  simhash              64-bit near-dup fingerprint, bucket by prefix
  ngram_jaccard_pairs  exact Jaccard on shingle sets via inner-join counts
                       (|A∩B| relational algebra — same trick as the
                       engine's hamming weighing, SURVEY.md §2 op-11a)
  containment_pairs    the CSIS pass, relational (bounded self-join)
  embedding_near_dups  cosine >= τ pairs over an embedding column

Hash choice: md5 hex substrings (built-in, JVM-side, identical in DuckDB)
so every operator here is oracle-checkable in SQL. MinHash signatures are
lexicographic minima of fixed-width hex strings — order-isomorphic to the
numeric hash, no UDF needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# tokens / shingles
# ---------------------------------------------------------------------------

def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, token) — whitespace split, JVM-side."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f]+")).alias("pos", "token"),
    ).filter(F.col("token") != "")


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, gram) distinct word n-grams via lead() windows — JVM-side."""
    t = tokens(docs, id_col, text_col)
    w = Window.partitionBy("id").orderBy("pos")
    gram_parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    return (
        t.select("id", F.concat_ws(" ", *gram_parts).alias("gram"),
                 *[F.lead("token", i).over(w).alias(f"_t{i}") for i in range(1, n)])
        .filter(F.col(f"_t{n-1}").isNotNull())
        .select("id", "gram")
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, text_md5, dup_count) — one survivor (min id) per distinct text."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("doc_id", "text_md5", "dup_count")
    )


def group_dup_stats(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group exact-duplicate profile: (group, n_docs, n_distinct,
    dup_docs, dup_ratio) where dup_docs = docs beyond the first copy of
    each distinct text WITHIN the group.

    Corpus-health diagnostic for multilingual crawls: a language whose
    dup_ratio spikes is usually a scraper loop or a mirrored dump, and
    per-language dedup budgets are set from exactly this table. Two
    map-combined hash aggregates — (group, digest) then (group) — so the
    only shuffle key is the digest pair; no text ever moves twice.
    """
    per_text = (
        docs.select(
            F.col(group_col).alias("grp"), F.md5(F.col(text_col)).alias("text_md5")
        )
        .groupBy("grp", "text_md5")
        .agg(F.count(F.lit(1)).alias("copies"))
    )
    return (
        per_text.groupBy("grp")
        .agg(
            F.sum("copies").alias("n_docs"),
            F.count(F.lit(1)).alias("n_distinct"),
            (F.sum("copies") - F.count(F.lit(1))).alias("dup_docs"),
        )
        .select(
            "grp",
            "n_docs",
            "n_distinct",
            "dup_docs",
            (F.col("dup_docs") / F.col("n_docs")).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(sh: DataFrame, num_hashes: int = 4) -> DataFrame:
    """(id, h0..h{k-1}) — hash_i(gram) = md5 hex slice i, min per doc.

    md5's four 8-hex-char slices act as independent 32-bit hash functions;
    min over a doc's shingles = classic minhash. Lexicographic min of
    fixed-width hex == numeric min. All JVM-side built-ins, one shuffle.
    """
    assert 1 <= num_hashes <= 4
    d = F.md5(F.col("gram"))
    aggs = [
        F.min(F.substring(d, 1 + 8 * i, 8)).alias(f"h{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, n_common_bands) candidate near-dup pairs, id_a < id_b.

    Band size 1 (each minhash value is its own band): candidates share at
    least one minhash — recall-oriented; verify with ngram_jaccard_pairs.
    The join is per-(band, value) — hot buckets are bounded by shingle
    diversity, and AQE skew-join splits the rest.
    """
    sig = minhash_signatures(shingles(docs, n, id_col, text_col), num_hashes)
    bands = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"h{i}").alias("val"))
                for i in range(num_hashes)
            ])
        ).alias("bv"),
    ).select("id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(F.col("id").alias("id_a"), "band", "val")
    b = bands.select(F.col("id").alias("id_b"), "band", "val")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common_bands"))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification stage / small-scale oracle)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) pairs with Jaccard(shingles) >= threshold.

    |A∩B| by inner-joining shingle sets on gram (shuffle on gram — sparse,
    no all-pairs), |A∪B| = |A|+|B|-|A∩B|. With ``candidates`` given (e.g.
    LSH output) the shingle table is first semi-joined down to documents
    that appear in any candidate pair, and pair rows are semi-restricted to
    the candidate set BEFORE the aggregation — the restriction reaches the
    expensive stages, it is not a post-filter. Callers verifying many
    thresholds over the same corpus should build ``shingles()`` once,
    persist it, and pass it as ``shingles_df`` — the one cache whose
    lifetime only the caller can manage.
    """
    # the shingle table feeds THREE plan branches (sizes + both join sides);
    # when building it internally, persist it for the duration of the call
    # and release it after checkpointing the (thresholded, small) result —
    # callers managing their own shingles() cache pass shingles_df instead
    own_cache = shingles_df is None
    sh = shingles_df if shingles_df is not None else shingles(docs, n, id_col, text_col)
    cand = None
    if candidates is not None:
        cand = candidates.select("id_a", "id_b")
        ids = (
            cand.select(F.col("id_a").alias("id"))
            .union(cand.select(F.col("id_b").alias("id")))
            .distinct()
        )
        sh = sh.join(ids, "id", "left_semi")
    if own_cache:
        sh = sh.persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "gram")
    b = sh.select(F.col("id").alias("id_b"), "gram")
    pairs = a.join(b, "gram").filter(F.col("id_a") < F.col("id_b"))
    if cand is not None:
        pairs = pairs.join(cand, ["id_a", "id_b"], "left_semi")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if own_cache:
        out = out.localCheckpoint(eager=True)
        sh.unpersist()
    return out


# ---------------------------------------------------------------------------
# Jaro near-dup pairs — the reference's pass-1 dedup (util.go:159-180) at
# corpus scale: candidate pairs from length buckets (Jaro >= τ implies
# similar byte lengths: m <= min(|a|,|b|) and score <= (2m/|short| + 1)/3,
# so τ=0.85 needs |long|/|short| <= ~1.8 — bucket by log-length and compare
# adjacent buckets only), then the EXACT reference Jaro in an Arrow-batched
# pandas UDF. Never an unbucketed all-pairs comparison.
# ---------------------------------------------------------------------------

def textbook_jaro(a: str, b: str) -> float:
    """Standard Jaro similarity (Winkler 1990, no prefix bonus) — the
    non-buggy counterpart of the reference's adapted variant
    (/root/reference/util.go:40-135). Bit-identical to DuckDB's
    ``jaro_similarity`` (verified on 3000 random pairs), so pairs scored
    with it are SQL-oracle-checkable."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    mw = max(max(la, lb) // 2 - 1, 0)
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i, c in enumerate(a):
        for j in range(max(0, i - mw), min(lb, i + mw + 1)):
            if not mb[j] and b[j] == c:
                ma[i] = True
                mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3


def jaro_pairs(
    docs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    variant: str = "reference",
) -> DataFrame:
    """(id_a, id_b, jaro) pairs with Jaro >= threshold.

    ``variant="reference"`` scores with the reference-exact adapted Jaro
    (util.go:40-135, quirks included); ``"textbook"`` with the standard
    formulation (DuckDB-oracle-checkable).

    Length bound: score <= (1 + r + 1)/3 with r = |short|/|long|, so
    score >= τ implies r >= 3τ-2. For τ > 2/3 that prunes to a bucket
    window of ceil(2·log2(1/(3τ-2))) half-octave buckets; for τ <= 2/3 no
    length bound exists and the join is the full candidate set (callers
    should pre-bucket some other way at scale — e.g. LSH candidates).
    """
    import math

    from pyspark.sql.types import DoubleType

    from tldr_spark.functions.jaro_fast import jaro_reference_batch, textbook_jaro_batch

    # fast exact kernels (~10-15x the naive per-pair loops; bit-matched to
    # the straight ports by tests/test_jaro_pairs.py differential tests)
    batch_scorer = jaro_reference_batch if variant == "reference" else textbook_jaro_batch

    @F.pandas_udf(DoubleType())
    def jaro_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return batch_scorer(a, b)

    # the bucket metric MUST be the length the scorer uses, or the prune
    # bound is unsound: the reference variant scores lowercased UTF-8 BYTES
    # (util.go operates on Go strings = bytes), the textbook variant scores
    # raw characters
    ln = (
        F.octet_length(F.lower(F.col(text_col)))
        if variant == "reference"
        else F.length(F.col(text_col))
    )
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        F.floor(F.log2(ln + 1) * 2).alias("bkt"),
    )
    a = d.select(F.col("id").alias("id_a"), F.col("t").alias("ta"), F.col("bkt").alias("ba"))
    b = d.select(F.col("id").alias("id_b"), F.col("t").alias("tb"), F.col("bkt").alias("bb"))
    cond = F.col("id_a") < F.col("id_b")
    if threshold > 2.0 / 3.0:
        win = math.ceil(2 * math.log2(1.0 / (3.0 * threshold - 2.0)))
        cond = cond & (F.abs(F.col("bb") - F.col("ba")) <= win)
    cand = a.join(b, cond)
    return (
        cand.withColumn("jaro", jaro_udf("ta", "tb"))
        .filter(F.col("jaro") >= threshold)
        .select("id_a", "id_b", "jaro")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — sign-sum of per-token hash bits, all JVM-side.

    Token hash = first 8 md5 hex chars as a 32-bit int; bit b contributes
    +1/-1 per DISTINCT token. Explode over bit positions keeps everything
    in whole-stage codegen (no UDF); 32 bits * tokens rows is the
    map-side cost, aggregated partially before the single shuffle.
    """
    t = tokens(docs, id_col, text_col).select("id", "token").distinct()
    h = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    # shiftleft with a COLUMN bit count needs the SQL form
    contrib = F.expr("CASE WHEN (th & shiftleft(CAST(1 AS BIGINT), b)) != 0 THEN 1 ELSE -1 END")
    per_bit = (
        t.select("id", h.alias("th"))
        .select("id", "th", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .groupBy("id", "b")
        .agg(F.sum(contrib).alias("s"))
    )
    return per_bit.groupBy("id").agg(
        F.sum(
            F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END")
        ).alias("simhash")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with simhash hamming distance <=
    ``max_hamming`` — the Manku/Jain/Sarma web-dedup shape (WWW'07).

    Pigeonhole candidate generation: split the ``bits``-bit fingerprint
    into ``bands`` equal bands; any pair within hamming distance <
    ``bands`` matches at least one band EXACTLY, so candidates come from a
    bucket equi-join on (band, band_value) — never an all-pairs scan — and
    are then verified with an exact popcount on the XOR. All JVM built-ins
    (shiftright/bit_count), no UDF. Requires ``max_hamming < bands``.
    """
    if max_hamming >= bands:
        raise ValueError("pigeonhole soundness needs max_hamming < bands")
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    mask = (1 << width) - 1
    s = simhash(docs, bits, id_col, text_col)
    bcols = F.explode(
        F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for b in range(bands)
        ])
    ).alias("bv")
    banded = s.select("id", "simhash", bcols).select(
        "id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"), "band", "val")
    b = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"), "band", "val")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-dups
# ---------------------------------------------------------------------------

def embedding_near_dups(
    embs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    Without ``candidates`` this is the exact all-pairs theta self-join —
    the small-scale verification stage only. The scale path passes an
    (id_a, id_b) candidate DataFrame (e.g. hyperplane-LSH bucket pairs from
    ``similarity.lsh_candidate_pairs``) — the join becomes an equi-join on
    the candidate keys, so only candidate pairs are ever scored, mirroring
    ``ngram_jaccard_pairs(candidates=...)``. Composed pipeline at 10^12:
    ``embedding_near_dups(embs, candidates=lsh_candidate_pairs(embs))``.
    """
    from tldr_spark.operators.similarity import cosine_expr

    a = embs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if candidates is not None:
        cand = candidates.select("id_a", "id_b").filter(F.col("id_a") < F.col("id_b")).distinct()
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", cosine_expr("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# near-dup clustering + survivor selection (the dedup pipeline's OUTPUT step)
# ---------------------------------------------------------------------------

def near_dup_clusters(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, canonical_id, cluster_size, is_survivor): every document
    assigned to its near-duplicate cluster, with the cluster's smallest
    doc_id as the deterministic canonical survivor.

    This is the step that turns pairwise near-dup evidence into the
    actual training-set decision ("keep one copy per cluster"): Jaccard
    pairs >= ``threshold`` become undirected edges, connected components
    merge transitively-linked documents (a~b, b~c clusters a,b,c even
    when jaccard(a,c) < threshold — standard fuzzy-dedup semantics), and
    ``is_survivor`` marks the kept copy. Documents with no near-dup are
    their own singleton clusters.

    Scale path: pass ``candidates=`` (e.g. ``minhash_lsh_pairs`` output)
    to restrict the Jaccard verification to LSH candidates — the
    restriction reaches the expensive join stages (see
    :func:`ngram_jaccard_pairs`); the component step then runs on the
    (tiny, churn-sized) near-dup edge set, never the corpus.
    """
    from tldr_spark.operators.components import connected_components

    pairs = ngram_jaccard_pairs(
        docs, n=n, threshold=threshold, id_col=id_col, text_col=text_col,
        candidates=candidates,
    )
    ids = docs.select(F.col(id_col).alias("id"))
    cc = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        vertices=ids,
    ).assignments
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
        (F.col("id") == F.col("component")).cast("long").alias("is_survivor"),
    )


def prefix_filter_candidates(
    docs: DataFrame,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b) candidate pairs for exact Jaccard >= t_num/t_den via
    PREFIX FILTERING (Chaudhuri et al. ICDE'06; Bayardo et al. WWW'07
    "All-Pairs"): order every document's shingles by global rarity
    (document frequency asc, gram asc) and keep only the first

        p = |d| - ceil(t * |d|) + 1

    rarest grams as the join key. The prefix lemma guarantees any pair
    with J >= t shares at least one prefix gram, so the candidate set is
    a SUPERSET of the answer — verified afterwards by the exact
    :func:`ngram_jaccard_pairs` with ``candidates=``.

    Why this beats the plain gram join at scale: the plain |A-cap-B| join
    fans out df^2 per gram INCLUDING the hot grams; here a hot gram only
    joins documents where it lands inside the tiny rarest-first prefix,
    so the fan-out concentrates on rare grams whose df is small by
    definition. Threshold is a RATIONAL (t_num/t_den): the prefix length
    and the size filter min*den >= num*max are pure integer arithmetic —
    no float boundary can drop a true pair.

    Length filter: J(A,B) >= t implies |A-cap-B| >= t*|A-cup-B|, hence
    min(|A|,|B|) >= t * max(|A|,|B|); applied as integers on the
    candidate stream before the distinct."""
    from pyspark.sql import Window

    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    sh = (
        shingles_df
        if shingles_df is not None
        else shingles(docs, n, id_col, text_col)
    )
    sz = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    gdf = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    w = Window.partitionBy("id").orderBy("gdf", "gram")
    # p = sz - ceil(t*sz) + 1, ceil via integer (num*sz + den - 1) // den
    p = F.col("sz") - F.floor((F.lit(t_num) * F.col("sz") + t_den - 1) / t_den) + 1
    pref = (
        sh.join(gdf, "gram")
        .withColumn("rn", F.row_number().over(w))
        .join(sz, "id")
        .filter(F.col("rn") <= p)
        .select("id", "gram", "sz")
    )
    a = pref.select(F.col("id").alias("id_a"), "gram", F.col("sz").alias("sz_a"))
    b = pref.select(F.col("id").alias("id_b"), "gram", F.col("sz").alias("sz_b"))
    return (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("sz_a", "sz_b") * t_den
            >= F.lit(t_num) * F.greatest("sz_a", "sz_b")
        )
        .select("id_a", "id_b")
        .distinct()
    )


def quality_dedup_survivors(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(canonical_id, survivor_doc, cluster_size, survivor_quality,
    n_removed) — the full fuzzy-dedup DECISION step with quality-aware
    survivor selection: instead of keeping the arbitrary min-id copy
    (:func:`near_dup_clusters`), keep the copy a training pipeline
    actually wants — argmax by (quality bucket DESC, n_chars DESC,
    doc_id ASC) within each near-dup cluster. All-integer ranking keys,
    so the choice is deterministic cross-engine.

    Scale: the per-cluster argmax is one row_number window partitioned
    by cluster id — state bounded by cluster size, which fuzzy-dedup
    keeps small by construction; everything upstream inherits the
    ``candidates=`` LSH restriction path."""
    from pyspark.sql import Window

    from tldr_spark.operators.textstats import quality_score

    clusters = near_dup_clusters(
        docs, n=n, threshold=threshold, id_col=id_col, text_col=text_col,
        candidates=candidates,
    )
    q = quality_score(docs, id_col, text_col).select(
        "doc_id", "quality", F.col("n_chars").alias("q_chars")
    )
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("quality"), F.desc("q_chars"), F.asc("doc_id")
    )
    return (
        clusters.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "canonical_id",
            F.col("doc_id").alias("survivor_doc"),
            "cluster_size",
            F.col("quality").cast("long").alias("survivor_quality"),
            (F.col("cluster_size") - 1).alias("n_removed"),
        )
    )
