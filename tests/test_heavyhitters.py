"""Heavy-hitter + count-min differential and guarantee tests."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from tldr_spark.operators.heavyhitters import (
    countmin_estimate,
    countmin_sketch,
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _stream(spark, tokens, parts=4):
    return spark.createDataFrame(
        [(t,) for t in tokens], "token string"
    ).repartition(parts)


def _exact(tokens):
    out = {}
    for t in tokens:
        out[t] = out.get(t, 0) + 1
    return out


def _hh_map(df):
    return {r["token"]: r["n_occurrences"] for r in df.collect()}


@pytest.mark.parametrize("seed", [0, 1])
def test_heavy_hitters_match_naive_zipf(spark, seed):
    rnd = random.Random(seed)
    # zipf-ish: token i drawn with weight 1/(i+1)
    pop = [f"t{i}" for i in range(200)]
    wts = [1.0 / (i + 1) for i in range(200)]
    tokens = rnd.choices(pop, weights=wts, k=5000)
    s = 50
    want = {t: c for t, c in _exact(tokens).items() if c >= s}
    got = _hh_map(heavy_hitters_exact(_stream(spark, tokens), "token", min_count=s))
    assert got == want


def test_heavy_hitters_evenly_spread_at_threshold(spark):
    # the adversarial case for a per-partition sketch: a token spread
    # perfectly evenly across partitions, sitting exactly at the
    # threshold, among uniform noise
    tokens = ["hh"] * 40 + [f"n{i}" for i in range(960)]
    random.Random(7).shuffle(tokens)
    got = _hh_map(heavy_hitters_exact(_stream(spark, tokens, parts=8), "token", min_count=40))
    assert got == {"hh": 40}


def test_heavy_hitters_default_k_and_validation(spark):
    tokens = ["a"] * 30 + ["b"] * 10 + ["c"]
    got = _hh_map(heavy_hitters_exact(_stream(spark, tokens), "token", min_count=10))
    assert got == {"a": 30, "b": 10}
    with pytest.raises(ValueError):
        heavy_hitters_exact(_stream(spark, tokens), "token", min_count=0)
    with pytest.raises(ValueError):
        misra_gries_candidates(_stream(spark, tokens), "token", k=0)


def test_misra_gries_superset_guarantee(spark):
    # with k counters, every token of global count > N/(k+1) must appear
    # in the unioned candidates — even with a deliberately tiny k
    rnd = random.Random(3)
    tokens = ["big"] * 300 + [f"x{rnd.randrange(500)}" for _ in range(700)]
    rnd.shuffle(tokens)
    k = 10  # N/(k+1) = 1000/11 ~ 91 < 300
    cand = {
        r["token"]
        for r in misra_gries_candidates(_stream(spark, tokens, parts=8), "token", k).collect()
    }
    assert "big" in cand


def test_countmin_overestimates_never_under(spark):
    rnd = random.Random(11)
    tokens = [f"w{rnd.randrange(300)}" for _ in range(3000)]
    df = _stream(spark, tokens)
    sk = countmin_sketch(df, "token", depth=4, width=64)
    probes = df.select("token").distinct()
    est = {
        r["token"]: r["n_cms"]
        for r in countmin_estimate(sk, probes, depth=4, width=64).collect()
    }
    exact = _exact(tokens)
    assert est.keys() == exact.keys()
    assert all(est[t] >= exact[t] for t in exact)
    # total mass per sketch row equals the stream length
    rows = sk.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert {r["m"] for r in rows} == {len(tokens)}


def test_countmin_merge_is_cellwise_sum(spark):
    a = ["x"] * 5 + ["y"] * 3
    b = ["x"] * 2 + ["z"] * 4
    sa = countmin_sketch(_stream(spark, a, 2), "token", depth=2, width=16)
    sb = countmin_sketch(_stream(spark, b, 2), "token", depth=2, width=16)
    merged = (
        sa.unionByName(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = countmin_sketch(_stream(spark, a + b, 3), "token", depth=2, width=16)
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_countmin_bucket_matches_duckdb(spark):
    # the md5-slice bucket must be bit-identical cross-engine — probe a
    # few tokens through both engines' hash paths
    import duckdb

    toks = ["the", "zebra", "états", "a b", ""]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    sk = countmin_sketch(df, "token", depth=3, width=128)
    got = {(r["row"], r["bucket"]) for r in sk.collect()}
    want = set()
    con = duckdb.connect()
    for j in range(3):
        for t in toks:
            b = con.execute(
                "SELECT CAST(concat('0x', substr(md5(concat(?, ':', ?)), 1, 8)) AS BIGINT) % 128",
                [str(j), t],
            ).fetchone()[0]
            want.add((j, b))
    con.close()
    assert got == want
