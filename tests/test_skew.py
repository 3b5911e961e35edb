"""Salted aggregation / join produce identical results to unsalted."""

from __future__ import annotations

from pyspark.sql import functions as F

from tldr_spark.operators.skew import hot_keys, salted_aggregate, salted_join


def _skewed_df(spark, n=20_000, hot_frac=0.6):
    # key 0 is a hub receiving hot_frac of all rows; tail uniform over 500
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 10 * hot_frac, F.lit(0))
        .otherwise(F.col("id") % 500)
        .alias("dst"),
        (F.col("id") % 7).cast("double").alias("w"),
    )


def test_hot_keys_detects_hub(spark):
    df = _skewed_df(spark)
    hot = {r["dst"] for r in hot_keys(df, "dst", threshold=1000).collect()}
    assert hot == {0}


def test_salted_aggregate_matches_plain(spark):
    df = _skewed_df(spark).persist()
    plain = {r["dst"]: (r["s"], r["c"]) for r in df.groupBy("dst")
             .agg(F.sum("w").alias("s"), F.count(F.lit(1)).alias("c")).collect()}
    salted = {
        r["dst"]: (r["s"], r["c"])
        for r in salted_aggregate(
            df,
            "dst",
            lambda: [F.sum("w").alias("s1"), F.count(F.lit(1)).alias("c1")],
            lambda: [F.sum("s1").alias("s"), F.sum("c1").alias("c")],
            hot_threshold=1000,
            n_salts=8,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k][0] - salted[k][0]) < 1e-9 and plain[k][1] == salted[k][1]


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark).persist()
    small = spark.range(500).select(F.col("id").alias("dst"), (F.col("id") * 2).alias("attr"))
    plain = big.join(small, "dst").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("w") + F.col("attr")).alias("s")
    ).collect()[0]
    hot = hot_keys(big, "dst", 1000)
    salted = salted_join(big, small, "dst", hot, n_salts=4).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("w") + F.col("attr")).alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"]
    assert abs(plain["s"] - salted["s"]) < 1e-6


def test_salted_aggregate_deterministic_across_partitionings(spark):
    """Salts are row-content hashes, not rand(): the salted result must be
    bit-identical whether the input arrived in 7 or 13 partitions
    (checkpoint/resume and cluster-resize safety). Integer-valued sums so
    FP ordering cannot mask a salt nondeterminism."""
    df = _skewed_df(spark).select("dst", F.col("w").cast("long").alias("w"))

    def run(parts):
        return sorted(
            (r["dst"], r["s"], r["c"])
            for r in salted_aggregate(
                df.repartition(parts),
                "dst",
                lambda: [F.sum("w").alias("s1"), F.count(F.lit(1)).alias("c1")],
                lambda: [F.sum("s1").alias("s"), F.sum("c1").alias("c")],
                hot_threshold=1000,
                n_salts=8,
            ).collect()
        )

    assert run(7) == run(13)


def test_salted_join_deterministic_across_partitionings(spark):
    big = _skewed_df(spark).select("dst", F.col("w").cast("long").alias("w"))
    small = spark.range(500).select(F.col("id").alias("dst"), (F.col("id") * 2).alias("attr"))
    hot = hot_keys(big, "dst", 1000)

    def run(parts):
        return sorted(
            (r["dst"], r["w"], r["attr"])
            for r in salted_join(big.repartition(parts), small, "dst", hot, n_salts=4).collect()
        )

    assert run(7) == run(13)
