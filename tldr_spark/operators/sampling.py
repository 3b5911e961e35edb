"""Deterministic hash sampling for training-data pipelines — the
downsample-by-stratum pass every 100 TB corpus build runs (per-language /
per-source / per-quality-bucket rates) where the sample must be
REPRODUCIBLE across reruns, engines, and partitionings.

Mechanism: a Lehmer/MINSTD integer hash of the row key,
``h = ((key mod M) * 48271) mod M`` with M = 2^31−1, accepted when
``h mod 10^6 < rate_ppm``. Pure bounded integer arithmetic — no engine
hash function — so Spark (JVM longs) and any SQL oracle (DuckDB BIGINT,
which errors on overflow rather than wrapping) compute bit-identical
verdicts; intermediates stay < 2^48. Rates are parts-per-million ints to
keep the comparison integral.

Scale shape: zero shuffle — the rate table is a broadcast dim of
|strata| rows and the accept test is per-row JVM codegen; the sample of a
10^12-row table is one map-side filter. Sampling is salt-keyed so
independent samples (train/eval splits) come from disjoint hash streams.

Reference parity note: the reference (didasy/tldr) has no sampling stage;
this is pipeline tooling the north rule's training-data scope calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M = 2_147_483_647  # 2^31 − 1 (Mersenne prime, MINSTD modulus)
_A = 48271
_PPM = 1_000_000


def hash_bucket_ppm(key, salt: int = 0):
    """Column expr: deterministic bucket in [0, 10^6) from an integer key.
    ``(((key + salt) mod M) * 48271 mod M) mod 10^6`` — every intermediate
    fits comfortably in a signed 64-bit integer."""
    k = F.pmod(key.cast("long") + F.lit(int(salt)), F.lit(_M))
    return F.pmod(k * F.lit(_A), F.lit(_M)) % F.lit(_PPM)


def hash_bucket_ppm_sql(key_expr: str, salt: int = 0) -> str:
    """The identical bucket computation as a SQL fragment (DuckDB/ANSI):
    guaranteed to agree with :func:`hash_bucket_ppm` row for row."""
    return f"((((({key_expr}) + {int(salt)}) % {_M}) * {_A}) % {_M}) % {_PPM}"


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: int = 0
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose key hashes
    under ``rate`` (0..1). Same key + salt ⇒ same verdict, forever."""
    ppm = int(round(rate * _PPM))
    return df.filter(hash_bucket_ppm(F.col(key_col), salt) < F.lit(ppm))


def reservoir_per_key(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Deterministic fixed-size uniform sample per key: keep the ``n`` rows
    with the smallest key-hash in each group (bottom-n-by-hash ≡ a
    reproducible reservoir; ties broken by the id itself). One shuffle on
    the group key + a per-partition window top-n — the same cost as any
    per-key top-k; no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        hash_bucket_ppm(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value keeps its own
    rate (``rates``), everything else keeps ``default_rate``. The rate
    table broadcasts (|strata| rows); the accept test is a map-side filter
    — the whole sample of a 10^12-row table costs zero shuffles."""
    spark = df.sparkSession
    rate_rows = [(k, int(round(v * _PPM))) for k, v in sorted(rates.items())]
    rdf = spark.createDataFrame(rate_rows, f"{strata_col} string, rate_ppm int")
    default_ppm = int(round(default_rate * _PPM))
    return (
        df.join(F.broadcast(rdf), strata_col, "left")
        .withColumn("rate_ppm", F.coalesce("rate_ppm", F.lit(default_ppm)))
        .filter(hash_bucket_ppm(F.col(key_col), salt) < F.col("rate_ppm"))
        .drop("rate_ppm")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res, IPL 2006): each row gets priority u^(1/w) with u a
    uniform drawn from the same MINSTD hash stream as the rest of this
    module (ppm bucket midpoint, so u in (0,1) exactly); the k largest
    priorities are the sample, so P(select) is proportional to weight,
    reproducibly across engines, reruns, and partitionings.

    We rank by ln(u)/w — monotone in u^(1/w) for w>0 — to stay in safe
    double range. Rows with weight <= 0 or NULL are excluded (P=0).
    Shape: a map-side filter + ONE TakeOrderedAndProject; no global sort,
    no shuffle beyond the k-row reduction. Ties (same priority) break by
    key ascending; the returned ``priority_q`` is 2^-20-quantized so the
    value itself is comparable cross-engine.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    u = (hash_bucket_ppm(F.col(key_col), salt).cast("double") + 0.5) / F.lit(1e6)
    pri = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("__pri", pri)
        .orderBy(F.desc("__pri"), F.col(key_col).asc())
        .limit(k)
        .withColumn(
            "priority_q", F.round(F.col("__pri") * 1048576).cast("long")
        )
        .drop("__pri")
    )
