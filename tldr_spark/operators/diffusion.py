"""Truncated geometric diffusion centrality over the link graph.

Generalizes the power-iteration eigenvector core (reference: tldr.go's
LexRank loop, /root/reference/tldr.go:200 area) into a seed-personalized
diffusion: inject unit mass at a seed set and let it spread along the
out-weight-normalized transition matrix P with geometrically decaying
retention,

    score = sum_{k=0..K}  base^{k+1} * (P^T)^k s ,     s = 1 on seeds

i.e. a truncated heat-kernel-style diffusion (cf. Chung's heat kernel
PageRank; the geometric-coefficient form is the lazy-walk analogue) whose
coefficients are exact binary fractions when ``base`` is a power of two —
that makes the fixed-K result reproducible bit-tightly across engines
after 2^-20 quantization, same discipline as the Katz / fixed-iteration
PageRank oracles.

Execution shape (Spark-first, mirrors the PageRank iteration):
  * one prep shuffle: duplicate-edge sum + out-weight normalization
    (reuses :func:`tldr_spark.operators.pagerank.prepare_edges`)
  * per level k: mass ⋈ edges on src (hash join) + one partial-aggregated
    groupBy(dst) — the same one-exchange-per-iteration profile as the
    PageRank loop; mass frames stay (id, mass) sized at <= |V| rows
  * the K per-level frames are UNIONed (no shuffle) and folded by ONE
    final groupBy(id) weighted sum — instead of K accumulate-joins

Dangling mass simply exits (no teleport): this is the absorbing/truncated
diffusion used for influence scoring, not a stochastic fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tldr_spark.operators.pagerank import prepare_edges


def geometric_diffusion(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 8,
    base: float = 0.5,
) -> DataFrame:
    """(id, score) for every vertex touched by the diffusion.

    ``seeds``: DataFrame with an ``id`` column (unit mass each).
    ``iters``: K, the deepest propagation level included.
    ``base``: per-level retention; keep it a power of two for cross-engine
    exactness (0.5 default -> coefficients 1/2, 1/4, ..., 1/2^(K+1)).
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    en = prepare_edges(edges, partition_by="src")
    mass = (
        seeds.select(F.col("id").cast("long"))
        .distinct()
        .select("id", F.lit(1.0).alias("mass"))
    )
    levels = [mass.select("id", (F.lit(base)).alias("contrib"))]
    coef = base
    for _ in range(iters):
        mass = (
            mass.join(en, mass["id"] == en["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("mass") * F.col("wn")).alias("mass"))
        )
        # truncate lineage each level — same discipline as the PageRank loop
        mass = mass.localCheckpoint(eager=False)
        coef *= base
        levels.append(mass.select("id", (F.col("mass") * F.lit(coef)).alias("contrib")))
    acc = levels[0]
    for lv in levels[1:]:
        acc = acc.unionByName(lv)
    return acc.groupBy("id").agg(F.sum("contrib").alias("score"))
