"""Physical-plan hygiene, asserted (not just printed by
scripts/plan_audit.py): at 100 TB a scan that reads unprojected columns,
a filter that misses the parquet reader, or an accidental cartesian is
the difference between a job and an outage. These assertions pin the
plan shapes the engine's scale story depends on."""

from __future__ import annotations

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

# the documented O(n²) verification-stage theta joins — the ONLY places a
# BroadcastNestedLoopJoin is acceptable (at scale they run behind LSH
# candidate restriction instead)
THETA_WHITELIST = {
    "jaro_textbook_pairs",
    "jaro_dedup_pairs",
    "containment_pairs",
    "embedding_near_dups",
    "ann_brute_topk",  # broadcast probes against the full table
}


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "edges",
        "out_degree",
        "top_in_degree",
        "pairwise_hamming",
        "minhash_lsh_pairs",
        "quality_scores",
        "pricing_summary",
        "top_customers",
        "ann_brute_topk",
        "jaro_textbook_pairs",
        "containment_pairs",
        "char_budget",
        "token_counts",
    ]
    out = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def _scans(plan: str) -> list[tuple[str, str]]:
    """[(pushed_filters, read_schema)] per FileScan in the plan."""
    found = []
    for line in plan.splitlines():
        if "FileScan" not in line:
            continue
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        rs = re.search(r"ReadSchema: struct<([^>]*)>", line)
        found.append((pf.group(1) if pf else "", rs.group(1) if rs else ""))
    return found


def test_column_pruning_reaches_scans(plans):
    # documents has 5 columns; these queries need exactly (doc_id, text)
    for name in ("quality_scores", "token_counts", "minhash_lsh_pairs"):
        for _, schema in _scans(plans[name]):
            cols = {c.split(":")[0] for c in schema.split(",") if c}
            assert cols <= {"doc_id", "text"}, (name, schema)
    # degree queries prune the edge derivation to the single needed column
    for name in ("edges", "out_degree", "top_in_degree"):
        for _, schema in _scans(plans[name]):
            cols = {c.split(":")[0] for c in schema.split(",") if c}
            assert cols == {"doc_id"}, (name, schema)


def test_predicate_pushdown_reaches_scans(plans):
    # the doc_id/vec_id range restrictions must reach the parquet reader
    for name, pred in [
        ("pairwise_hamming", "LessThan(doc_id,40)"),
        ("jaro_textbook_pairs", "LessThan(doc_id,80)"),
        ("containment_pairs", "LessThan(doc_id,200)"),
    ]:
        assert any(pred in pf for pf, _ in _scans(plans[name])), (
            name,
            _scans(plans[name]),
        )


def test_no_cartesian_products(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name


def test_theta_joins_only_where_documented(plans):
    for name, plan in plans.items():
        if name in THETA_WHITELIST:
            continue
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_dimension_join_broadcasts(plans):
    # orders ⋈ customer: the dimension side must broadcast, not sort-merge
    assert "BroadcastHashJoin" in plans["top_customers"]
    assert "SortMergeJoin" not in plans["top_customers"]


def test_running_sum_is_single_window(plans):
    # char_budget is one windowed running sum — no join, no extra shuffle
    plan = plans["char_budget"]
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan


def test_stratified_sample_zero_shuffle(spark):
    """The corpus downsample must stay a map-side filter: the only Exchange
    allowed is the BroadcastExchange of the tiny rate dimension, and the
    documents scan must read exactly (doc_id, lang) — at 10^12 rows any
    shuffle or wider scan here dominates the whole pipeline."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["stratified_sample_docs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 0, plan
    for _, schema in _scans(plan):
        cols = {c.split(":")[0] for c in schema.split(",") if c}
        assert cols <= {"doc_id", "lang"}, schema


def test_triad_wedge_join_is_equi(spark):
    """The census wedge self-join must hash/merge on the center vertex
    (the x.w < y.w bound is a post-filter) — a nested-loop plan here is
    the V² disaster the Batagelj-Mrvar strategy exists to avoid."""
    from pyspark.sql import functions as F

    from tldr_spark.operators.triads import _pair_codes
    from tldr_spark.sources.tables import derive_edges

    pc = _pair_codes(derive_edges(spark, SF_DIR))
    adj = pc.select(F.col("a").alias("v"), F.col("b").alias("w")).union(
        pc.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    x, y = adj.alias("x"), adj.alias("y")
    tri = x.join(y, (F.col("x.v") == F.col("y.v")) & (F.col("x.w") < F.col("y.w")))
    plan = tri._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_token_pmi_no_unbounded_broadcast_hint(spark):
    """VERDICT r3: the PMI marginal table is VOCABULARY-sized (hapax-heavy,
    10^8-10^9 rows on a web corpus) — a forced broadcast hint there OOMs
    where a shuffle join just works. Only the 1-row corpus-count frame may
    carry a hint; the marginal joins ride a pair-survivor semi-join with
    strategy left to AQE."""
    from tldr_spark.operators.cooccur import token_pmi

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{(i + 1) % 5} common") for i in range(40)],
        "doc_id long, text string",
    )
    plan = (
        token_pmi(docs, min_pair_docs=2, _checkpoint=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("strategy=broadcast") <= 1, plan


def test_spam_mass_normalizes_edges_once(spark, monkeypatch):
    """spam_mass composes TWO fixpoints over ONE logical graph — the
    duplicate-sum + out-weight normalization shuffles over E (the most
    expensive prep in the repo) must run exactly once, shared by both
    (VERDICT r2). Asserted by counting prepare_edges invocations."""
    from tldr_spark.operators import pagerank as prmod

    calls = {"n": 0}
    real = prmod.prepare_edges

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(prmod, "prepare_edges", counting)
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 4, 1.0), (4, 3, 1.0)],
        "src long, dst long, weight double",
    )
    trusted = spark.createDataFrame([(0,)], "id long")
    out = prmod.spam_mass(edges, trusted, tolerance=1e-10).collect()
    assert calls["n"] == 1
    rows = {r["id"]: r for r in out}
    # farm component (3,4) unreachable from the trusted seed -> spam ~1
    assert rows[3]["spam_mass"] > 0.999 and rows[4]["spam_mass"] > 0.999
    assert rows[0]["spam_mass"] < 0.5
