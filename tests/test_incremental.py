"""Incremental CC differential tests: old assignment + delta == full CC."""

from __future__ import annotations

import random

import pytest

from tldr_spark.operators.components import connected_components
from tldr_spark.operators.incremental import incremental_components


def _df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "src long, dst long")
    return spark.createDataFrame(edges, "src long, dst long")


def _assign(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _split(edges, frac, seed):
    rnd = random.Random(seed)
    old, delta = [], []
    for e in edges:
        (delta if rnd.random() < frac else old).append(e)
    return old, delta


def _check(spark, old_edges, delta_edges, lf=1_000_000):
    old = connected_components(_df(spark, old_edges)).assignments
    got = _assign(
        incremental_components(old, _df(spark, delta_edges), local_finish_edges=lf)
    )
    want = _assign(connected_components(_df(spark, old_edges + delta_edges)).assignments)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_matches_full_random(spark, seed):
    rnd = random.Random(seed)
    edges = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(120)]
    old, delta = _split(edges, 0.3, seed)
    _check(spark, old, delta)


def test_incremental_merges_components_and_new_vertices(spark):
    # old: two chains {0-1-2} and {10-11}; delta bridges them through a
    # brand-new vertex 100 and adds a disconnected new pair (200, 201)
    old = [(0, 1), (1, 2), (10, 11)]
    delta = [(2, 100), (100, 10), (200, 201)]
    _check(spark, old, delta)


def test_incremental_new_vertex_becomes_min_label(spark):
    # new vertex 1 is SMALLER than the old component roots — the merged
    # root must be 1, exercising the min-over-labels-includes-new-ids path
    old = [(3, 4), (7, 8)]
    delta = [(1, 4), (1, 8)]
    _check(spark, old, delta)


def test_incremental_empty_delta_and_empty_old(spark):
    _check(spark, [(0, 1), (2, 3)], [])
    _check(spark, [], [(0, 1), (2, 3)])


def test_incremental_self_loop_only_new_vertex(spark):
    # a self-loop-only vertex counts as linked (singleton component),
    # matching connected_components' linked-vertex rule
    _check(spark, [(0, 1)], [(5, 5)])


def test_incremental_distributed_contraction_path(spark):
    # local_finish_edges=0 forces the star-contraction rounds on the
    # contracted graph
    old = [(i, i + 1) for i in range(0, 20, 2)]
    delta = [(i + 1, i + 2) for i in range(0, 18, 2)] + [(30, 31)]
    _check(spark, old, delta, lf=0)


def test_warm_start_pagerank_reaches_same_fixpoint(spark):
    # seeding the current snapshot's PageRank from the previous
    # snapshot's converged ranks must reach the SAME fixpoint (it is
    # unique — the driver-checked half of the resume contract). NOTE:
    # no fewer-iterations assertion on purpose: the deterministic block
    # generator makes the uniform cold start orthogonal to the slowest
    # eigenmodes (~0.65/round observed) while any perturbed seed decays
    # at the true asymptotic damping rate (~0.85/round), so warm seeding
    # SLOWS convergence here (measured: cold 48 rounds, warm 118 at
    # tol=1e-10) — see q_pagerank_warm_start's docstring.
    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.sources.tables import derive_edges, derive_edges_prev

    sf = "/root/testdata/sf0.001"
    seed = pagerank(derive_edges_prev(spark, sf), tolerance=1e-9, max_iter=200).ranks
    cold = pagerank(derive_edges(spark, sf), tolerance=1e-10, max_iter=300)
    warm = pagerank(
        derive_edges(spark, sf), tolerance=1e-10, max_iter=300, init_ranks=seed
    )
    assert warm.iterations <= 300 and warm.l1_delta <= 1e-10
    c = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    w = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    assert c.keys() == w.keys()
    assert all(abs(c[i] - w[i]) < 1e-8 for i in c)


def test_warm_start_from_own_fixpoint_converges_immediately(spark):
    # the sharp half of the seed-independence property: seeding with the
    # graph's OWN converged ranks terminates in one iteration
    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.sources.tables import derive_edges

    sf = "/root/testdata/sf0.001"
    e = derive_edges(spark, sf)
    cold = pagerank(e, tolerance=1e-10, max_iter=300)
    again = pagerank(e, tolerance=1e-10, max_iter=300, init_ranks=cold.ranks)
    assert again.iterations == 1


def test_incremental_snapshot_pair_matches_union(spark):
    # the two deterministic crawl snapshots at sf0.001: incremental from
    # the prev assignment + (cur minus prev) equals full CC on the union
    from tldr_spark.sources.tables import derive_edges, derive_edges_prev

    sf = "/root/testdata/sf0.001"
    prev = derive_edges_prev(spark, sf).select("src", "dst")
    cur = derive_edges(spark, sf).select("src", "dst")
    delta = cur.exceptAll(prev)
    old = connected_components(prev).assignments
    got = _assign(incremental_components(old, delta))
    want = _assign(connected_components(prev.union(cur)).assignments)
    assert got == want
