"""Bloom filter (Bloom, CACM'70) — the membership pre-filter a crawler
runs before hitting the URL store ("have we crawled this id?"): k salted
hash positions per key over an m-bit array; a probe is a (possible)
member iff all k bits are set. False positives happen, false negatives
cannot — both properties are pinned by the pytest and MEASURED by the
driver query (the sketch is deterministic, so its exact FPR on a given
probe set is a reproducible number, not a bound).

Representation: the bit array is a DataFrame of set positions (distinct
``pos``), bounded by m rows — for any practical m it broadcasts, so
probing a 10^12-row candidate stream is a map-side broadcast join + one
per-key count: zero shuffles on the big side beyond the k-way explode.
Hashes are the repo's MINSTD stream with the quadratic mix (hrw.py's
rationale: affine-only salted streams correlate), all int64, bit-exact in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M = 2_147_483_647
_A = 48271
_SALT_STRIDE = 1_000_003


def _pos(key, i: int, m: int, salt: int):
    g = F.pmod(
        F.pmod(key.cast("long") + F.lit(i * _SALT_STRIDE + salt), F.lit(_M)) * _A,
        F.lit(_M),
    )
    return F.pmod(g * g + g, F.lit(_M)) % F.lit(m)


def bloom_build(
    df: DataFrame, key_col: str, m: int, k: int, salt: int = 0
) -> DataFrame:
    """The set bits: distinct ``pos`` over every member's k hash
    positions. At most m rows regardless of member count."""
    if m < 2 or k < 1:
        raise ValueError("need m >= 2 and k >= 1")
    key = F.col(key_col)
    pos = F.explode(F.array(*[_pos(key, i, m, salt) for i in range(k)]))
    return df.select(pos.alias("pos")).distinct()


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    m: int,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """(key, hit): hit = every one of the probe's k positions is set.
    ``bits``/m/k/salt must match the build call. The bits side broadcasts
    (≤ m rows); the probe side never shuffles on its own key."""
    key = F.col(key_col)
    exploded = probes.select(
        key.alias("key"),
        F.explode(F.array(*[_pos(key, i, m, salt) for i in range(k)])).alias("pos"),
    )
    marked = exploded.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "pos", "left"
    )
    return marked.groupBy("key").agg(
        (F.sum(F.coalesce("__set", F.lit(0))) == k).alias("hit")
    )
