"""k-center selection via farthest-first traversal (Gonzalez '85) over an
embedding table — the classic 2-approximation, used in training pipelines
as DIVERSITY / coreset selection ("pick k maximally spread exemplars").

Deterministic contract (cross-engine reproducible):
  * seed = the row with MIN(vec_id);
  * each subsequent center = argmax of squared-L2 distance to the chosen
    set, ties broken vec_id-ascending;
  * d2 is computed as dot(v,v) - 2*dot(v,c) + dot(c,c) with in-order
    double folds — the SAME expression shape the DuckDB oracle uses
    (list_dot_product), so the floats agree bit-for-bit;
  * the min-over-centers is an incremental LEAST chain in step order.

Scale shape: k passes over the N-row table; each pass is one vectorized
JVM array-math projection (zip_with + aggregate — no Python, no UDF)
plus a TakeOrderedAndProject top-1 (per-partition top-k, no global
sort).  The chosen center (one row, d floats) is the only thing that
ever reaches the driver — the standard O(1)-scalar-per-iteration loop
shape shared with pagerank's convergence check.  k is small by
definition (a coreset), so total cost is k scans.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_Q = 1048576  # 2^20 output quantizer (output only — selection uses raw doubles)


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def kcenter_farthest_first(
    emb: DataFrame, k: int = 5, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Return (step, vec_id, d2_q): the k chosen centers in selection
    order; d2_q = floor(2^20 * squared-L2 distance from the new center
    to the previously chosen set) — the coverage radius sequence (non-
    increasing after step 1). Step 0 (the seed) reports d2_q = 0. If the
    table has fewer than k rows, returns all of them."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = emb.sparkSession
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    seed = base.orderBy("vec_id").limit(1).collect()
    if not seed:
        return spark.createDataFrame([], "step int, vec_id long, d2_q long")
    chosen = [(0, seed[0]["vec_id"], 0)]
    cvec = list(seed[0]["v"])

    def lit_vec(vals):
        return F.array(*[F.lit(float(x)) for x in vals])

    def d2_to(center_vals):
        c = lit_vec(center_vals)
        return _dot(F.col("v"), F.col("v")) - 2 * _dot(F.col("v"), c) + _dot(c, c)

    df = base.withColumn("d2", d2_to(cvec))
    for step in range(1, k):
        nxt = (
            df.where(~F.col("vec_id").isin([c[1] for c in chosen]))
            .orderBy(F.desc("d2"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not nxt:
            break
        row = nxt[0]
        chosen.append((step, row["vec_id"], math.floor(row["d2"] * _Q)))
        df = df.withColumn("d2", F.least(F.col("d2"), d2_to(list(row["v"]))))
    return spark.createDataFrame(chosen, "step int, vec_id long, d2_q long")
