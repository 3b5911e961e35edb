"""Motif pattern matching pinned against a brute-force itertools oracle
(pure relational semantics: bindings are unconstrained variable
assignments, negated terms are anti-joins), plus parser error contracts."""

from __future__ import annotations

import itertools

import pytest

from tldr_spark.operators.motif import motif_count_by, motif_find, parse_pattern

# a small digraph with triangles, 2-cycles, a self-loop feeder, and hubs
_EDGES = [
    (1, 2), (2, 3), (1, 3),          # feed-forward triangle
    (3, 1),                          # closes a directed 3-cycle too
    (2, 1),                          # 2-cycle with (1,2)
    (4, 1), (4, 2), (4, 3),          # hub out
    (5, 4), (6, 4),                  # hub in
    (3, 5), (5, 6), (6, 3),          # second cycle
]


def _brute(edges, pattern):
    """Enumerate bindings by brute force over the vertex set."""
    terms = parse_pattern(pattern)
    vset = sorted({v for e in edges for v in e})
    names = sorted({n for _, u, v in terms for n in (u, v)})
    es = set(edges)
    out = set()
    for combo in itertools.product(vset, repeat=len(names)):
        b = dict(zip(names, combo))
        ok = all(
            ((b[u], b[v]) in es) != negated for negated, u, v in terms
        )
        if ok:
            out.add(tuple(b[n] for n in names))
    return out


def _df(spark):
    return spark.createDataFrame(_EDGES, "src long, dst long")


@pytest.mark.parametrize(
    "pattern",
    [
        "a->b; b->c; a->c",
        "a->b; b->c; !a->c",
        "a->b; b->a",
        "a->b; b->c; c->a; !a->a",
        "x->y",
    ],
)
def test_matches_brute_force(spark, pattern):
    got = {tuple(r) for r in motif_find(_df(spark), pattern).collect()}
    assert got == _brute(_EDGES, pattern)


def test_count_by_matches_brute_force(spark):
    got = {
        (r["a"], r["cnt"])
        for r in motif_count_by(_df(spark), "a->b; b->c; a->c", "a").collect()
    }
    want: dict[int, int] = {}
    for a, _b, _c in _brute(_EDGES, "a->b; b->c; a->c"):
        want[a] = want.get(a, 0) + 1
    assert got == set(want.items())


def test_columns_sorted_by_vertex_name(spark):
    cols = motif_find(_df(spark), "z->m; m->q").columns
    assert cols == ["m", "q", "z"]


def test_parser_rejects_bad_input(spark):
    with pytest.raises(ValueError, match="bad motif term"):
        parse_pattern("a=>b")
    with pytest.raises(ValueError, match="empty"):
        parse_pattern(" ; ;")
    with pytest.raises(ValueError, match="positive"):
        parse_pattern("!a->b")
    with pytest.raises(ValueError, match="connected"):
        motif_find(_df(spark), "a->b; c->d")
    with pytest.raises(ValueError, match="binds"):
        motif_find(_df(spark), "a->b; !c->d")
