"""Quality-weighted corpus mixing: deterministic systematic resampling.

Training mixtures upsample good documents and downsample (or drop) bad
ones. Given an integer weight per document, systematic resampling picks

    n_copies(i) = floor(C_i * M / W) - floor(C_{i-1} * M / W)

where C_i is the INCLUSIVE weight prefix sum in doc_id order, W the
total weight, and M the target corpus size. The telescoping floors
guarantee sum(n_copies) == M EXACTLY (no stochastic rounding residue),
every document's count is within 1 of its real-valued share M*w/W, and
the whole thing is reproducible integer arithmetic — no RNG state to
ship cross-engine (the same determinism-over-RNG stance as walks.py /
nullmodel.py).

Scale shape: ONE global prefix sum (packing._global_prefix_sum — range
sort + per-partition offsets, no single-partition window) + a 1-row
broadcast of (W, M) + per-row integer arithmetic. Products C_i * M
reach ~(mean_w * n) * (mult * n): at n = 10^10 that overflows int64,
so the quotients are computed in DECIMAL(38,0) (Spark) / HUGEINT
(DuckDB) — exact in both, with int64 headroom to n ~ 10^14.

Reference semantics scope: didasy/tldr has no corpus-mixing surface;
this is part of the LLM-pipeline layer (quality scores come from
textstats.quality_score's deterministic 0-3 bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def systematic_resample(
    weighted: DataFrame,
    multiplier: int = 2,
    id_col: str = "doc_id",
    weight_col: str = "w",
) -> DataFrame:
    """(doc_id, w, n_copies) with sum(n_copies) == multiplier * n_docs
    exactly; copies proportional to integer weight ``w`` (>= 0; w = 0
    documents are dropped with n_copies = 0)."""
    if multiplier < 1:
        raise ValueError(f"multiplier must be positive, got {multiplier}")
    from tldr_spark.operators.packing import _global_prefix_sum

    wts = weighted.select(
        F.col(id_col).alias("doc_id"), F.col(weight_col).cast("long").alias("w")
    )
    pre = _global_prefix_sum(wts, ["doc_id"], "w", "_pre")
    tot = wts.agg(
        F.sum("w").alias("_W"), (F.count(F.lit(1)) * multiplier).alias("_M")
    )
    d = "CAST({} AS DECIMAL(38,0))"
    return (
        pre.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "w",
            F.expr(
                f"CAST(({d.format('_pre + w')} * {d.format('_M')}) div {d.format('_W')}"
                f" - ({d.format('_pre')} * {d.format('_M')}) div {d.format('_W')}"
                " AS BIGINT)"
            ).alias("n_copies"),
        )
    )


def temperature_resample(
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "lang",
    scale: int = 65536,
) -> DataFrame:
    """(doc_id, <group_col>, w, n_copies): temperature-sampled corpus
    remix at alpha = 1/2 — language l's share of the output is
    proportional to n_l^alpha instead of n_l, the mC4/XLM-R recipe for
    keeping high-resource languages from drowning out the tail.

    Exact cross-engine arithmetic: every document of language l gets the
    INTEGER weight  w_l = scale // isqrt(n_l)  (isqrt = floor of the
    correctly-rounded IEEE sqrt, identical in Spark and DuckDB; perfect
    squares are exact), giving language mass  n_l * w_l ~ scale *
    sqrt(n_l) — the alpha = 0.5 share up to the 1/scale quantization.
    The systematic resample then redistributes the ORIGINAL corpus size
    across languages by those weights (sum(n_copies) == n_docs exactly,
    telescoping-floor invariant).

    Scale shape: one group count (map-side combined, |langs| rows,
    broadcast back) + the resample's single global prefix sum."""
    n_l = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_nl"))
    weighted = (
        docs.select(id_col, group_col)
        .join(F.broadcast(n_l), group_col)
        .withColumn("_isq", F.floor(F.sqrt(F.col("_nl").cast("double"))).cast("long"))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col),
            F.expr(f"CAST({scale} AS BIGINT) div _isq").alias("w"),
        )
    )
    out = systematic_resample(weighted.select("doc_id", "w"), multiplier=1)
    return out.join(
        weighted.select("doc_id", group_col), "doc_id"
    ).select("doc_id", group_col, "w", "n_copies")


def quality_weighted_mix(
    docs: DataFrame,
    multiplier: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, w, n_copies): systematic resample of the corpus to
    ``multiplier`` x its size, weighted by 1 + the deterministic 0-3
    quality bucket — quality-3 docs appear 4x as often as quality-0."""
    from tldr_spark.operators.textstats import quality_score

    q = quality_score(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", (F.col("quality").cast("long") + 1).alias("w")
    )
    return systematic_resample(q, multiplier=multiplier)
