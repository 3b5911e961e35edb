"""SimRank — "two pages are similar if similar pages link to them".

Jeh & Widom, "SimRank: a measure of structural-context similarity"
(KDD 2002): s(a,a)=1 and for a≠b

    s(a,b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i,j)

with I(v) the in-neighbor set and decay C (0.8 in the paper). It is the
link-graph dual of the co-citation family already in operators/linksim.py
(cocitation counts = the k=1 numerator here) and completes the pairwise
similarity suite: cocitation / bibliographic coupling (exact overlap),
Jaccard / Adamic-Adar / resource-allocation (degree-weighted overlap),
neighbor-MinHash (sketched overlap), SimRank (recursive overlap).

TRUNCATION (the standard practical one): the exact pair-space is |V|²,
so the tracked support is frozen at the k=1 support — pairs with at
least ``min_cocite`` common in-neighbors — and s_k is read as 0 outside
it (plus the implicit diagonal s(v,v)=1). Since s_1's support IS the
cocitation support, this drops only longer even-length meeting paths
between never-co-cited pairs; scores are exact lower bounds and the
fixed-iteration result is deterministic, so the whole algebra is
SQL-expressible for the cross-engine oracle (same unrolled joins in
DuckDB, quantized at 2⁻²⁰ to absorb summation-order float noise).

Shape per iteration: support ⋈ in-edges(a) ⋈ in-edges(b) ⋈ scores on the
canonicalized in-neighbor pair — cost Σ_{(a,b)∈P} |I(a)|·|I(b)|, every
join an equi-join (never all-pairs). At web scale two knobs bound it:
``min_cocite`` (support pairs need that much co-citation — the classic
"evidence ≥ 2" prune that cut this repo's bib-coupling table 4×) and
``max_in_degree`` (vertices above the cap leave the pair-space entirely;
a 10⁸-in-degree hub's SimRank is ~0 term-by-term anyway, the same
hot-key amputation as tfidf's max_df_ratio). Both prunes are part of the
operator contract, applied identically in the oracle.

Reference parity note: the reference (didasy/tldr) scores sentence pairs
by direct edge weight only (tldr.go:403 area builds the similarity
graph; no transitive similarity); SimRank extends the same pairwise
frame recursively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def simrank(
    edges: DataFrame,
    c: float = 0.8,
    iterations: int = 3,
    min_cocite: int = 1,
    max_in_degree: int = 0,
) -> DataFrame:
    """Fixed-iteration truncated SimRank over the directed simple graph of
    ``edges`` (src, dst). Returns every tracked pair — (id_a < id_b,
    score) with score = s_iterations(a,b) — for pairs having ≥
    ``min_cocite`` common in-neighbors (both endpoints' in-degree ≤
    ``max_in_degree`` when the cap is > 0). ``iterations`` ≥ 1; the k=1
    step is the closed form C·|I(a)∩I(b)|/(|I(a)|·|I(b)|)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    sd = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # in-edges, keyed by the vertex whose in-neighborhood they form
    ein = sd.select(F.col("dst").alias("id"), F.col("src").alias("inn")).persist()
    indeg = ein.groupBy("id").agg(F.count(F.lit(1)).alias("ind"))
    if max_in_degree > 0:
        indeg = indeg.filter(F.col("ind") <= max_in_degree)
        ein = ein.join(indeg.select("id"), "id")  # pair-space leaves hubs out

    # frozen support: co-cited pairs + both in-degrees (pair-partitioned;
    # every later join hits it on (ia, ib))
    pairs = (
        ein.alias("a")
        .join(ein.alias("b"), F.col("a.inn") == F.col("b.inn"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= min_cocite)
        .join(indeg.select(F.col("id").alias("ia"), F.col("ind").alias("inda")), "ia")
        .join(indeg.select(F.col("id").alias("ib"), F.col("ind").alias("indb")), "ib")
        .persist()
    )
    pairs.count()

    # k = 1: only diagonal s_0 terms survive -> closed form
    s = pairs.select(
        "ia", "ib", (F.lit(c) * F.col("cab") / (F.col("inda") * F.col("indb"))).alias("s")
    )
    for _ in range(iterations - 1):
        # off-diagonal mass: enumerate in-neighbor pairs of each tracked
        # pair, read s_k on the canonicalized key (absent == 0)
        off = (
            pairs.select("ia", "ib")
            .join(ein.select(F.col("id").alias("ia"), F.col("inn").alias("ni")), "ia")
            .join(ein.select(F.col("id").alias("ib"), F.col("inn").alias("nj")), "ib")
            .filter(F.col("ni") != F.col("nj"))
            .join(
                s.select(
                    F.col("ia").alias("ki"), F.col("ib").alias("kj"), F.col("s").alias("sk")
                ),
                (F.least("ni", "nj") == F.col("ki")) & (F.greatest("ni", "nj") == F.col("kj")),
            )
            .groupBy("ia", "ib")
            .agg(F.sum("sk").alias("off"))
        )
        s = (
            pairs.join(off, ["ia", "ib"], "left")
            .select(
                "ia",
                "ib",
                (
                    F.lit(c)
                    * (F.col("cab") + F.coalesce(F.col("off"), F.lit(0.0)))
                    / (F.col("inda") * F.col("indb"))
                ).alias("s"),
            )
            .localCheckpoint(eager=False)
        )
    out = s.select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"), F.col("s").alias("score"))
    return out
