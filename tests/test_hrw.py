"""HRW sharding: python argmax oracle, the minimal-disruption law (every
S→S+1 moved key lands on the NEW shard; moved fraction ≈ 1/(S+1)),
assignment balance sanity, single-shard case, raises."""

from __future__ import annotations

import pytest

from tldr_spark.operators.hrw import _A, _M, _SHARD_STRIDE, hrw_assign, hrw_moved


def _h(key: int, shard: int) -> int:
    g = ((key + shard * _SHARD_STRIDE) % _M) * _A % _M
    return (g * g + g) % _M


def _py_assign(key: int, n: int) -> int:
    hs = [_h(key, s) for s in range(n)]
    best = max(hs)
    return hs.index(best)  # lowest id on tie


def _keys(n):
    x, out = 2024, []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(x % 10**9)
    return out


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "doc_id long")


def test_matches_python_oracle(spark):
    keys = _keys(400)
    for n in (1, 3, 8):
        got = {
            r["doc_id"]: r["shard"]
            for r in hrw_assign(_df(spark, keys), "doc_id", n).collect()
        }
        assert got == {k: _py_assign(k, n) for k in keys}


def test_minimal_disruption_law(spark):
    keys = _keys(3000)
    n = 5
    a = {r["doc_id"]: r["shard"] for r in hrw_assign(_df(spark, keys), "doc_id", n).collect()}
    b = {r["doc_id"]: r["shard"] for r in hrw_assign(_df(spark, keys), "doc_id", n + 1).collect()}
    moved = [k for k in keys if a[k] != b[k]]
    # every moved key lands on the NEW shard — the HRW guarantee
    assert all(b[k] == n for k in moved)
    # moved fraction ≈ 1/(n+1)
    frac = len(moved) / len(keys)
    assert abs(frac - 1 / (n + 1)) < 0.03
    # and hrw_moved reports the same count
    row = hrw_moved(_df(spark, keys), "doc_id", n, n + 1).collect()[0]
    assert (row["n_keys"], row["n_moved"]) == (len(keys), len(moved))


def test_balance(spark):
    keys = _keys(5000)
    got = hrw_assign(_df(spark, keys), "doc_id", 4).groupBy("shard").count().collect()
    counts = {r["shard"]: r["count"] for r in got}
    assert set(counts) == {0, 1, 2, 3}
    for c in counts.values():
        assert abs(c - 1250) < 1250 * 0.15


def test_raises(spark):
    df = _df(spark, [1])
    with pytest.raises(ValueError):
        hrw_assign(df, "doc_id", 0)
    with pytest.raises(ValueError):
        hrw_assign(df.withColumn("shard", df.doc_id), "doc_id", 2)
