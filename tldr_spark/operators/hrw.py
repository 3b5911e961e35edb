"""Rendezvous (highest-random-weight, Thaler-Ravishankar '96) hashing —
the shard assigner behind stable partition layouts: key k goes to the
shard s maximizing hash(k, s). Its defining property is MINIMAL
DISRUPTION: growing S shards to S+1 moves exactly the keys the new shard
wins (≈ 1/(S+1) of them) and nothing else — unlike modulo sharding, where
nearly every key moves. A 100 TB corpus rebalancing onto new storage
nodes re-copies only the moved fraction.

Hashes come from the repo's MINSTD stream (sampling.py's convention) with
the shard id folded into the salt, so assignments are engine- and
rerun-stable and the DuckDB oracle reproduces them bit-for-bit. Shape:
assignment is a pure per-row expression — GREATEST over the |S| salted
hashes plus a CASE chain picking the winner — so sharding a 10^12-row
table costs ZERO shuffles and stays entirely inside whole-stage codegen;
|S| is a job parameter (storage nodes), never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M = 2_147_483_647
_A = 48271
_SHARD_STRIDE = 1_000_003  # prime stride keeps shard salt streams apart


def _h(key, shard: int):
    # MINSTD pass + a quadratic mix: a purely affine hash keeps hash(k,s1)
    # and hash(k,s2) correlated across salts (the argmax winner then skews
    # away from uniform — observed as a new-shard win rate of 0.124
    # instead of 1/6), while g² + g mod M breaks the linear structure and
    # stays in int64 (g < 2^31 ⇒ g² < 2^62) so DuckDB computes it exactly.
    salt = shard * _SHARD_STRIDE
    g = F.pmod(F.pmod(key.cast("long") + F.lit(salt), F.lit(_M)) * _A, F.lit(_M))
    return F.pmod(g * g + g, F.lit(_M))


def hrw_assign(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Input rows + ``shard`` (0-based): the HRW winner. Ties (equal hash)
    break to the lower shard id — deterministic, though with MINSTD on
    distinct salts a tie needs hash collision across salted streams."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if "shard" in df.columns:
        raise ValueError("input already has a 'shard' column")
    key = F.col(key_col)
    best = F.greatest(*[_h(key, s) for s in range(n_shards)]) if n_shards > 1 else _h(key, 0)
    # argmax via the first shard whose hash equals the max (lowest-id tie break)
    shard = None
    for s in reversed(range(n_shards)):
        cond = _h(key, s) == best
        shard = F.when(cond, F.lit(s)) if shard is None else F.when(cond, F.lit(s)).otherwise(shard)
    # reversed() + overwrite-on-match ⇒ the LOWEST matching shard wins
    return df.withColumn("shard", shard.cast("int"))


def hrw_moved(df: DataFrame, key_col: str, n_before: int, n_after: int) -> DataFrame:
    """1-row (n_keys, n_moved): how many keys change shard when the shard
    count changes. For n_after = n_before + 1 HRW guarantees every moved
    key lands on the NEW shard (minimal disruption) — pinned by pytest."""
    a = hrw_assign(df.select(key_col), key_col, n_before)
    b = hrw_assign(df.select(key_col), key_col, n_after).withColumnRenamed(
        "shard", "shard_after"
    )
    j = a.join(b, key_col)
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(F.col("shard") != F.col("shard_after"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
    )
