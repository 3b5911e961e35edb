"""Ranking metrics: exact python oracle (trec_eval conventions), perfect
and inverted-ranking pins, no-relevant conventions, R>k AP denominator,
tie determinism, k=1 edge, arg validation."""

from __future__ import annotations

import math

import pytest

from tldr_spark.operators.ranking_eval import ranking_metrics


def _py(rows, k):
    byq = {}
    for q, it, s, r in rows:
        byq.setdefault(q, []).append((it, s, r))
    out = {}
    for q, items in byq.items():
        pred = sorted(items, key=lambda t: (-t[1], t[0]))
        ideal = sorted(items, key=lambda t: (-t[2], t[0]))
        dcg = sum(
            (2 ** r - 1) / math.log2(i + 2)
            for i, (_, _, r) in enumerate(pred[:k])
        )
        idcg = sum(
            (2 ** r - 1) / math.log2(i + 2)
            for i, (_, _, r) in enumerate(ideal[:k])
        )
        nrel = sum(1 for _, _, r in items if r > 0)
        first = next(
            (i + 1 for i, (_, _, r) in enumerate(pred[:k]) if r > 0), None
        )
        hits = 0
        prec = 0.0
        for i, (_, _, r) in enumerate(pred[:k]):
            if r > 0:
                hits += 1
                prec += hits / (i + 1)
        out[q] = (
            len(items),
            nrel,
            dcg / idcg if idcg > 0 else None,
            1.0 / first if first else 0.0,
            prec / min(nrel, k) if nrel > 0 else None,
        )
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "q long, item long, score double, rel long")
    return {
        r["query"]: (r["n_items"], r["n_rel"], r["ndcg_k"], r["mrr_k"], r["ap_k"])
        for r in ranking_metrics(df, "q", "item", "score", "rel", k).collect()
    }


def _check(got, exp):
    assert set(got) == set(exp)
    for q in exp:
        for a, b in zip(got[q], exp[q]):
            if b is None:
                assert a is None, (q, got[q], exp[q])
            else:
                assert a == pytest.approx(b, rel=1e-12), (q, got[q], exp[q])


def test_matches_python_random(spark):
    import random

    rng = random.Random(7)
    rows = [
        (q, it, round(rng.random() * 10, 3), rng.choice([0, 0, 0, 1, 1, 2, 3]))
        for q in range(6)
        for it in range(rng.randint(1, 12))
    ]
    for k in (1, 3, 5):
        _check(_run(spark, rows, k), _py(rows, k))


def test_perfect_and_inverted(spark):
    # scores aligned with relevance -> ndcg=mrr=ap=1
    rows = [(1, i, 10.0 - i, 3 - min(i, 3)) for i in range(5)]
    got = _run(spark, rows, 3)[1]
    assert got[2] == pytest.approx(1.0) and got[3] == 1.0 and got[4] == pytest.approx(1.0)
    # inverted: the single relevant item ranked last, outside top-k
    rows = [(1, 0, 1.0, 1)] + [(1, i, 10.0 + i, 0) for i in range(1, 6)]
    got = _run(spark, rows, 3)[1]
    assert got[1] == 1 and got[2] == pytest.approx(0.0) and got[3] == 0.0 and got[4] == pytest.approx(0.0)


def test_no_relevant_conventions(spark):
    got = _run(spark, [(1, 0, 5.0, 0), (1, 1, 4.0, 0)], 5)[1]
    assert got == (2, 0, None, 0.0, None)


def test_ap_denominator_min_r_k(spark):
    # 4 relevant, k=2, both top slots relevant -> AP@2 = 1 (divides by k)
    rows = [(1, i, 10.0 - i, 1) for i in range(4)]
    assert _run(spark, rows, 2)[1][4] == pytest.approx(1.0)


def test_score_tie_breaks_on_item(spark):
    # equal scores: item 0 (relevant) sorts first deterministically
    rows = [(1, 0, 5.0, 1), (1, 1, 5.0, 0)]
    assert _run(spark, rows, 2)[1][3] == 1.0


def test_k_validation(spark):
    df = spark.createDataFrame([(1, 1, 1.0, 1)], "q long, item long, score double, rel long")
    with pytest.raises(ValueError):
        ranking_metrics(df, "q", "item", "score", "rel", 0)
