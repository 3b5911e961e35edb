"""Plan-shape assertions for the round-4 operators — the scale story
each one documents, pinned against regressions:

  winnow        one doc-keyed sort exchange, no joins, pruned scan
  readability   pure projection: ZERO exchanges of any kind
  ams           single global aggregate: no hash exchanges
  symspell      candidate join is an EQUI join (never nested-loop)
  itemsets      pair join equi; no cartesian
  dsir/lmdiv    no cartesian / nested-loop beyond 1-row broadcasts
"""

from __future__ import annotations

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_cols(plan: str) -> list[set[str]]:
    out = []
    for line in plan.splitlines():
        if "FileScan" in line:
            rs = re.search(r"ReadSchema: struct<([^>]*)>", line)
            schema = rs.group(1) if rs else ""
            out.append({c.split(":")[0] for c in schema.split(",") if c})
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_winnow_single_sort_exchange_no_joins(spark, docs):
    from tldr_spark.operators.winnow import winnow_fingerprints

    plan = _plan(winnow_fingerprints(docs))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    for cols in _scan_cols(plan):
        assert cols <= {"doc_id", "text"}, cols


def test_readability_zero_exchanges(spark, docs):
    from tldr_spark.operators.readability import readability

    plan = _plan(readability(docs))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    for cols in _scan_cols(plan):
        assert cols <= {"doc_id", "text"}, cols


def test_mattr_no_window_enumeration_joins(spark, docs):
    from tldr_spark.operators.mattr import mattr

    plan = _plan(mattr(docs))
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ams_no_hash_exchange(spark, docs):
    from pyspark.sql import functions as F

    from tldr_spark.operators.ams import ams_sketch

    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"[ \t\n\r\f]+")).alias("token")
    ).where(F.col("token") != "")
    plan = _plan(ams_sketch(toks, k=16))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_symspell_equi_join_only(spark):
    from tldr_spark.operators.symspell import edit1_pairs

    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    plan = _plan(edit1_pairs(sup, col="s_name"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    for cols in _scan_cols(plan):
        assert cols <= {"s_name"}, cols


def test_itemsets_equi_join_only(spark):
    from pyspark.sql import functions as F

    from tldr_spark.operators.itemsets import pair_support

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            "user_id", F.get_json_object("props", "$.k").cast("long").alias("item")
        )
        .where(F.col("item").isNotNull())
    )
    plan = _plan(pair_support(ev, min_support=40))
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop allowed is the 1-row basket-total broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_dsir_no_cartesian(spark, docs):
    from pyspark.sql import functions as F

    from tldr_spark.operators.dsir import dsir_logweights

    plan = _plan(dsir_logweights(docs, F.col("lang") == "en"))
    assert "CartesianProduct" not in plan, plan
    # LM joins are keyed on the bounded bucket id -> hash joins; the
    # nested-loops are the 1-row totals broadcast and the 1-row x 1-row
    # join that BUILDS the totals frame
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_winnow_pairs_prune_before_selfjoin(spark, docs):
    """The df-bounded fingerprint prune must sit BELOW the pair
    self-join: the join operates on the semi-joined (pruned) side, so
    the plan contains a LeftSemi before the inner fp join."""
    from tldr_spark.operators.winnow import winnow_shared_pairs

    plan = _plan(winnow_shared_pairs(docs, min_shared=8, max_df=50))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
