"""A-priori pair support: brute-force python oracle (supports, lift),
the A-priori prune law (no pair survives whose item is infrequent),
max_basket cap semantics, duplicate-event insensitivity, raises."""

from __future__ import annotations

import itertools

import pytest

from tldr_spark.operators.itemsets import pair_support

BASKETS = {
    1: {"a", "b", "c"},
    2: {"a", "b"},
    3: {"a", "c", "d"},
    4: {"b", "c"},
    5: {"a", "b", "c", "d", "e"},
    6: {"e"},
    7: {"f"},  # infrequent singleton item
}


def _events(spark, baskets=BASKETS, dup=False):
    rows = [(u, i) for u, items in baskets.items() for i in items]
    if dup:
        rows = rows + rows[::2]
    return spark.createDataFrame(rows, "user_id long, item string")


def _py(baskets, min_support, max_basket=None):
    if max_basket is not None:
        baskets = {u: s for u, s in baskets.items() if len(s) <= max_basket}
    u_n = len(baskets)
    cnt: dict[str, int] = {}
    for s in baskets.values():
        for i in s:
            cnt[i] = cnt.get(i, 0) + 1
    out = {}
    pair_n: dict[tuple[str, str], int] = {}
    for s in baskets.values():
        for a, b in itertools.combinations(sorted(s), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    for (a, b), nab in pair_n.items():
        if nab >= min_support and cnt[a] >= min_support and cnt[b] >= min_support:
            out[(a, b)] = (cnt[a], cnt[b], nab, nab * u_n / (cnt[a] * cnt[b]))
    return out


@pytest.mark.parametrize("ms", [1, 2, 3])
def test_matches_python(spark, ms):
    got = {
        (r.item_a, r.item_b): (r.n_a, r.n_b, r.n_ab, r.lift)
        for r in pair_support(_events(spark), min_support=ms).collect()
    }
    want = _py(BASKETS, ms)
    assert set(got) == set(want)
    for k, (na, nb, nab, lift) in want.items():
        gna, gnb, gnab, glift = got[k]
        assert (gna, gnb, gnab) == (na, nb, nab), k
        assert abs(glift - lift) < 1e-12, k


def test_apriori_prune(spark):
    # item f appears once: with min_support=2 no pair may contain it,
    # and every reported pair's items meet the support floor
    res = pair_support(_events(spark), min_support=2).collect()
    for r in res:
        assert r.n_a >= 2 and r.n_b >= 2
        assert "f" not in (r.item_a, r.item_b)


def test_max_basket_cap(spark):
    got = {
        (r.item_a, r.item_b): r.n_ab
        for r in pair_support(_events(spark), min_support=2, max_basket=3).collect()
    }
    want = {k: v[2] for k, v in _py(BASKETS, 2, max_basket=3).items()}
    assert got == want
    # basket 5 (size 5) dropped: pairs touching d/e lose its contribution
    assert ("d", "e") not in got


def test_duplicate_events_insensitive(spark):
    a = {
        (r.item_a, r.item_b): (r.n_a, r.n_b, r.n_ab)
        for r in pair_support(_events(spark), min_support=2).collect()
    }
    b = {
        (r.item_a, r.item_b): (r.n_a, r.n_b, r.n_ab)
        for r in pair_support(_events(spark, dup=True), min_support=2).collect()
    }
    assert a == b


def test_raises(spark):
    df = _events(spark)
    with pytest.raises(ValueError):
        pair_support(df, min_support=0)
    with pytest.raises(ValueError):
        pair_support(df, max_basket=1)
