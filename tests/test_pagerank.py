"""Distributed PageRank vs the NumPy §2.7 oracle on hand-checked graphs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tldr_spark.functions.reference import pagerank_fixpoint
from tldr_spark.operators.pagerank import pagerank


def _run_both(spark, edges, tol=1e-9, damping=0.5, **kw):
    """Oracle and engine run the SAME contract (same damping/tol -> same
    iteration count), so scores agree to float-sum noise (<<1e-6).
    damping=0.5 converges ~4x faster than the 0.85 default — the golden
    test below still exercises the default."""
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    w = np.array([float(e[2]) if len(e) > 2 else 1.0 for e in edges])
    expected = pagerank_fixpoint(src, dst, w, damping=damping, tolerance=tol)
    df = spark.createDataFrame(
        [(int(s), int(d), float(ww)) for s, d, ww in zip(src, dst, w)],
        "src long, dst long, weight double",
    )
    res = pagerank(df, damping=damping, tolerance=tol, **kw)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    return expected, got, res


GRAPHS = {
    "path4": [(1, 2), (2, 3), (3, 4)],  # dangling tail
    "star5_dangling_leaves": [(1, 2), (1, 3), (1, 4), (1, 5)],
    "cycle3": [(0, 1), (1, 2), (2, 0)],
    "two_components": [(0, 1), (1, 0), (5, 6), (6, 7), (7, 5)],
    "self_loop_and_dups": [(0, 1), (0, 1), (1, 0), (1, 1), (2, 0)],
    "weighted_hub": [(1, 0, 5.0), (2, 0, 1.0), (3, 0, 1.0), (0, 1, 1.0), (2, 3, 2.0)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_numpy_oracle(spark, name):
    expected, got, res = _run_both(spark, GRAPHS[name])
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6), (name, k)
    # ranks over linked nodes sum to ~1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_shuffle_join_path(spark):
    expected, got, _ = _run_both(spark, GRAPHS["weighted_hub"], broadcast_ranks=False)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src long, dst long, weight double")
    res = pagerank(df)
    assert res.ranks.count() == 0 and res.n_vertices == 0


def test_isolated_vertices_excluded(spark):
    # isolated vertices never enter the graph (linked-nodes-only N, §2.7)
    expected, got, res = _run_both(spark, GRAPHS["cycle3"])
    assert res.n_vertices == 3
    assert all(got[k] == pytest.approx(1 / 3, abs=1e-6) for k in got)


def test_pagerank_default_damping_allclose_1e6(spark):
    """North-rule gate: engine scores allclose(1e-6) vs the NumPy §2.7
    fixpoint at the DEFAULT damping and tolerance 1e-6."""
    expected, got, _ = _run_both(
        spark, GRAPHS["weighted_hub"], tol=1e-6, damping=0.85
    )
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6)


def test_golden_sentence_graph_pagerank(spark):
    """17-node / 272-edge graph from sample.txt via reference ops 3-11;
    Spark top-3 == {5,7,11} == the committed golden's sentences."""
    from tldr_spark.functions import reference as R

    sample = open("/root/reference/sample.txt", encoding="utf-8").read().strip()
    sents = R.tokenize_sentences(sample)
    bags = [R.default_word_tokenizer(s) for s in sents]
    kept = R.uniq_sentence_indices(bags)
    assert kept == list(range(17))
    mat = R.binary_vectors(bags, R.create_dictionary(sample))
    src, dst, w = R.edge_list(R.pairwise_weights(mat))
    assert len(src) == 272

    df = spark.createDataFrame(
        [(int(s), int(d), float(ww)) for s, d, ww in zip(src, dst, w)],
        "src long, dst long, weight double",
    )
    res = pagerank(df, tolerance=1e-4)  # reference default tolerance
    top3 = [r["id"] for r in res.ranks.orderBy(F.desc("rank")).limit(3).collect()]
    assert sorted(top3) == [5, 7, 11]


def test_per_iteration_metrics(spark):
    _, _, res = _run_both(spark, GRAPHS["path4"])
    assert res.iterations == len(res.metrics)
    deltas = [m["l1_delta"] for m in res.metrics]
    assert deltas[-1] <= 1e-9


def test_warm_start_converges_faster_to_same_fixpoint(spark):
    from tldr_spark.operators.pagerank import pagerank

    edges = [
        (s, d, 1.0 + (s * d) % 3)
        for s in range(20)
        for d in range(20)
        if s != d and (s * 7 + d * 3) % 5 == 0
    ]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    cold = pagerank(df, tolerance=1e-10)
    warm = pagerank(df, tolerance=1e-10, init_ranks=cold.ranks)
    assert warm.iterations < cold.iterations
    assert warm.iterations <= 2  # seeded at the fixpoint: immediate converge
    got_c = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    got_w = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    assert set(got_c) == set(got_w)
    for v in got_c:
        assert abs(got_c[v] - got_w[v]) < 1e-8

    # delta graph: add a few edges, warm-start from the old fixpoint; the
    # result must equal the cold fixpoint of the NEW graph
    edges2 = edges + [(0, 19, 2.0), (19, 0, 1.0), (5, 18, 3.0)]
    df2 = spark.createDataFrame(edges2, "src long, dst long, weight double")
    cold2 = pagerank(df2, tolerance=1e-10)
    warm2 = pagerank(df2, tolerance=1e-10, init_ranks=cold.ranks)
    g2c = {r["id"]: r["rank"] for r in cold2.ranks.collect()}
    g2w = {r["id"]: r["rank"] for r in warm2.ranks.collect()}
    for v in g2c:
        assert abs(g2c[v] - g2w[v]) < 1e-8
    assert warm2.iterations <= cold2.iterations


def test_warm_start_rejects_degenerate_seed(spark):
    import pytest

    from tldr_spark.operators.pagerank import pagerank

    df = spark.createDataFrame([(0, 1, 1.0), (1, 0, 1.0)], "src long, dst long, weight double")
    zeros = spark.createDataFrame([(0, 0.0), (1, 0.0)], "id long, rank double")
    with pytest.raises(ValueError, match="positive"):
        pagerank(df, init_ranks=zeros)


def test_pagerank_from_bucketed_prepared_edges(spark):
    """The storage-layout path: normalize once, persist dst-bucketed, then
    iterate straight from the table — same fixpoint as the in-memory path,
    and the per-iteration aggregate is exchange-free from storage."""
    from pyspark.sql import functions as F

    from tldr_spark.operators.pagerank import pagerank, save_prepared_edges

    rng_edges = [
        (i, (i * 7 + 3) % 23, 1.0 + (i % 3)) for i in range(60)
    ] + [(i % 23, (i * 5 + 1) % 23, 1.0) for i in range(40)]
    df = spark.createDataFrame(rng_edges, "src long, dst long, weight double")
    base = pagerank(df, tolerance=1e-12)
    want = {r["id"]: r["rank"] for r in base.ranks.collect()}

    spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed")
    save_prepared_edges(df, "pr_edges_bucketed", num_buckets=4)
    t = spark.table("pr_edges_bucketed")
    res = pagerank(t, tolerance=1e-12, edges_prepared=True)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9

    # the iteration-shaped aggregate over the bucketed table: NO exchange
    # (the bucket layout satisfies the groupBy(dst) distribution); the same
    # aggregate over a plain in-memory frame needs one
    r = F.broadcast(res.ranks)
    contrib = (
        r.join(t, r["id"] == t["src"])
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("wn")).alias("c"))
    )
    plan = contrib._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    plain = (
        r.join(df.withColumnRenamed("weight", "wn"), r["id"] == df["src"])
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("wn")).alias("c"))
    )
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plain_plan
    spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed")


def test_auto_strategy_selects_shuffle_past_vertex_limit(spark):
    """broadcast_ranks=None picks the strategy from the counted vertex set:
    a tiny broadcast_vertex_limit forces the shuffle-join path through the
    AUTO selector and the fixpoint still matches the oracle (the dual-path
    equality test, exercised via auto instead of the explicit flag)."""
    expected, got, _ = _run_both(
        spark, GRAPHS["weighted_hub"], broadcast_ranks=None, broadcast_vertex_limit=2
    )
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6)
    # and above the limit auto picks broadcast, same fixpoint
    expected, got, _ = _run_both(
        spark, GRAPHS["weighted_hub"], broadcast_ranks=None,
        broadcast_vertex_limit=10_000,
    )
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6)


def test_auto_strategy_personalized(spark):
    """The auto selector in personalized_pagerank: both forced paths and
    the auto-forced-shuffle path agree on the PPR fixpoint."""
    from tldr_spark.operators.pagerank import personalized_pagerank

    df = spark.createDataFrame(
        [(s, d, w) for s, d, w in GRAPHS["weighted_hub"]],
        "src long, dst long, weight double",
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    want = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            df, seeds, tolerance=1e-12, broadcast_ranks=True
        ).ranks.collect()
    }
    for kw in (
        {"broadcast_ranks": False},
        {"broadcast_ranks": None, "broadcast_vertex_limit": 2},
    ):
        got = {
            r["id"]: r["rank"]
            for r in personalized_pagerank(
                df, seeds, tolerance=1e-12, **kw
            ).ranks.collect()
        }
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), (kw, v)
