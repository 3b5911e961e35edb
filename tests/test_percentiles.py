"""Token-length percentiles — nearest-rank exactness."""

from __future__ import annotations

import math

from tldr_spark.operators.textstats import token_length_percentiles


def _oracle(lengths, pcts=(50, 90, 99)):
    d = sorted(lengths)
    n = len(d)
    out = {"n_docs": n}
    for p in pcts:
        out[f"p{p}_tokens"] = d[math.ceil(p * n / 100) - 1]
    out["max_tokens"] = d[-1]
    return out


def _run(spark, lengths):
    docs = [(i, "tok " * L) for i, L in enumerate(lengths)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return token_length_percentiles(df).collect()[0].asDict()


def test_matches_python_oracle(spark):
    lengths = [1 + (i * 37) % 100 for i in range(97)]
    assert _run(spark, lengths) == _oracle(lengths)


def test_nearest_rank_not_interpolated(spark):
    # n=4, p50 -> rank ceil(2)=2: the 2nd value EXACTLY, never (10+20)/2.
    lengths = [1, 10, 20, 1000]
    got = _run(spark, lengths)
    assert got["p50_tokens"] == 10
    assert got["p90_tokens"] == 1000  # rank ceil(3.6)=4
    assert got["max_tokens"] == 1000


def test_empty_and_constant_corpora(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    z = token_length_percentiles(df).collect()[0]
    assert tuple(z) == (0, 0, 0, 0, 0)
    const = _run(spark, [7] * 25)
    assert const == {
        "n_docs": 25, "p50_tokens": 7, "p90_tokens": 7,
        "p99_tokens": 7, "max_tokens": 7,
    }


# -- zipf_fit ------------------------------------------------------------------


def test_zipf_fit_matches_numpy(spark):
    import math

    from tldr_spark.operators.textstats import zipf_fit

    # deterministic zipf-ish corpus: token t_i appears ceil(60/i) times
    words = []
    for i in range(1, 13):
        words += [f"t{i:02d}"] * ((60 + i - 1) // i)
    texts = [(0, " ".join(words[:40])), (1, " ".join(words[40:]))]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    row = zipf_fit(df, top_n=8).collect()[0]

    # python oracle: counts over the SAME corpus, same tie rule
    from collections import Counter

    cnt = Counter(words)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    xs = [math.log(r + 1) for r in range(len(top))]
    ys = [math.log(c) for _, c in top]
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert row["n_top"] == 8
    assert abs(row["slope"] - slope) < 1e-9
    assert abs(row["intercept"] - intercept) < 1e-9


def test_zipf_fit_degenerate_single_token(spark):
    from tldr_spark.operators.textstats import zipf_fit

    df = spark.createDataFrame([(0, "a a a a")], "doc_id long, text string")
    row = zipf_fit(df).collect()[0]
    assert row["n_top"] == 1
    assert row["slope"] is None and row["intercept"] is None


def test_zipf_true_powerlaw_recovers_exponent(spark):
    from tldr_spark.operators.textstats import zipf_fit

    # counts exactly proportional to rank^-1 -> slope == -1 up to the
    # integer rounding of the counts
    words = []
    for i in range(1, 33):
        words += [f"w{i:02d}"] * max(1, round(3200 / i))
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    row = zipf_fit(df, top_n=32).collect()[0]
    assert abs(row["slope"] + 1.0) < 0.01
