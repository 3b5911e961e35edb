"""Product quantization for billion-scale ANN (Jégou, Douze & Schmid
TPAMI'11) — the memory-side of the ANN family (similarity.py covers the
search-side with brute/LSH/IVF).

The D-dim embedding splits into m subspaces; each subspace gets its own
k-centroid codebook (k <= 256 -> one byte per subspace). A vector is
stored as m small integers — 4 bytes here vs 4*D bytes of floats, the
compression that makes a 10^11-vector index fit a cluster's RAM.
Queries use ADC (asymmetric distance): the query stays exact, and its
distance to any database vector is the sum of m table lookups

    d(q, x)^2 ~ sum_j || q_j - C_j[code_j(x)] ||^2

computed from a per-query m x k lookup table that is built once and
shipped as literals — the corpus scan does NO float vector math at all.

Spark shape: codebooks train on the same bounded deterministic sample
as similarity._train_centroids (hash-filter pick, seeded numpy k-means
— bounded driver work, the documented IVF contract); encoding is one
JVM-side argmin expression per subspace over a single corpus scan;
ADC search is one broadcast join of the (tiny) probe table against the
codes, with the per-probe lookup tables inlined as literal arrays —
scan cost is O(corpus * m) integer lookups, zero per-row Python.

No SQL oracle (k-means training, like ann_ivf_topk) — semantics are
pinned by tests: encode matches an exact numpy mirror, ADC distances
match the table sums exactly, and PQ top-k recall against brute-force
cosine is asserted on a clustered corpus.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window, functions as F

from tldr_spark.operators.similarity import _train_centroids


def train_pq_codebooks(
    embs: DataFrame,
    m: int = 4,
    k: int = 16,
    sample: int = 2048,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, k, D/m) codebooks — one seeded k-means per subspace over the
    deterministic bounded sample. D must divide evenly by m."""
    dim = len(embs.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = embs.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("_sub"),
        )
        books.append(
            _train_centroids(sliced, k, sample, seed + j, id_col, "_sub")
        )
    return np.stack(books)


def _sub_argmin(vec_col: str, j: int, sub: int, book: np.ndarray) -> Column:
    """argmin_c || v[j] - c ||^2 over one subspace codebook, JVM-side
    (same 2*v.c - |c|^2 maximization as similarity._cell_expr)."""
    sv = F.slice(F.col(vec_col), j * sub + 1, sub)
    scores = []
    for c in book:
        arr = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(sv, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scores.append(2.0 * dot - float(c @ c))
    s = F.array(*scores)
    return (F.array_position(s, F.array_max(s)) - 1).cast("int")


def pq_encode(
    embs: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code) with code = array<int> of length m — one corpus scan,
    all m argmins evaluated in the same projection."""
    m, _, sub = codebooks.shape
    return embs.select(
        F.col(id_col).alias("id"),
        F.array(
            *[_sub_argmin(vec_col, j, sub, codebooks[j]) for j in range(m)]
        ).alias("code"),
    )


def pq_topk(
    embs: DataFrame,
    probes: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(probe_id, neighbor_id, adc_dist, rank) — ADC top-k by estimated
    squared L2. Probes are collected (bounded probe sets, same contract
    as brute_force_topk's broadcast side); each probe's m x k distance
    table ships as literal arrays, so the corpus side is one broadcast
    join + m integer lookups per row."""
    m, kk, sub = codebooks.shape
    spark = embs.sparkSession
    codes = pq_encode(embs, codebooks, id_col, vec_col).withColumnRenamed(
        "id", "neighbor_id"
    )
    rows = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")).collect()
    if not rows:
        return spark.createDataFrame(
            [], "probe_id long, neighbor_id long, adc_dist double, rank int"
        )
    # per-probe m x k lookup tables, shipped once as a broadcast frame —
    # the corpus is scanned ONCE; every row costs m integer lookups per
    # probe (the documented tiny-broadcast cross-join class: |probes|
    # rows, like the landmark pair grid)
    lut_rows = []
    for r in rows:
        q = np.asarray(r["pv"], dtype=np.float64)
        lut = [
            [float(x) for x in ((codebooks[j] - q[j * sub : (j + 1) * sub][None, :]) ** 2).sum(axis=1)]
            for j in range(m)
        ]
        lut_rows.append((int(r["probe_id"]), lut))
    luts = spark.createDataFrame(
        lut_rows, "probe_id long, lut array<array<double>>"
    )
    dist = None
    for j in range(m):
        term = F.element_at(
            F.element_at(F.col("lut"), j + 1),
            F.element_at(F.col("code"), j + 1) + 1,
        )
        dist = term if dist is None else dist + term
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id", dist.alias("adc_dist"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
