"""Checkpoint/resume: a PageRank run killed mid-way resumes from the last
committed snapshot and reaches the SAME fixpoint (north rule: 'resumable
from checkpoint with per-partition lineage + metrics')."""

from __future__ import annotations

import json
import os

import pytest

from tldr_spark.operators.pagerank import pagerank
from tldr_spark.plans.checkpoint import IterativeCheckpoint

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (0, 3), (5, 0)]


def _edges_df(spark):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in EDGES], "src long, dst long, weight double"
    )


def test_resume_reaches_identical_fixpoint(spark, tmp_path):
    full = pagerank(_edges_df(spark), damping=0.5, tolerance=1e-10)
    want = {r["id"]: r["rank"] for r in full.ranks.collect()}

    # phase 1: "crash" after a few iterations (max_iter caps the run)
    ck = IterativeCheckpoint(spark, str(tmp_path / "ck"))
    partial = pagerank(
        _edges_df(spark), damping=0.5, tolerance=1e-10, max_iter=6,
        checkpoint=ck, checkpoint_every=2,
    )
    assert partial.iterations == 6
    latest = ck.latest()
    assert latest is not None and latest[0] == 6

    # phase 2: restart with the same checkpoint root -> resumes at iter 6
    resumed = pagerank(
        _edges_df(spark), damping=0.5, tolerance=1e-10,
        checkpoint=ck, checkpoint_every=2,
    )
    got = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    assert resumed.metrics[0]["iteration"] == 7  # continued, not restarted
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_metadata_commit_protocol(spark, tmp_path):
    ck = IterativeCheckpoint(spark, str(tmp_path / "ck2"))
    pagerank(
        _edges_df(spark), damping=0.5, tolerance=1e-10, max_iter=4,
        checkpoint=ck, checkpoint_every=2,
    )
    meta = json.load(open(os.path.join(str(tmp_path / "ck2"), "metadata.json")))
    snaps = {s["iteration"]: s for s in meta["snapshots"]}
    assert set(snaps) == {2, 4}
    for s in snaps.values():
        assert s["committed"] is True
        assert s["partitions"], "per-partition lineage recorded"
        assert "l1_delta" in s["metrics"] and "wall_ms" in s["metrics"]
    hist = ck.metrics_history()
    assert [h["iteration"] for h in hist] == [2, 4]
    # deltas shrink monotonically across snapshots
    assert hist[-1]["l1_delta"] < hist[0]["l1_delta"]


def test_cc_resume_reaches_identical_components(spark, tmp_path):
    """Connected components killed mid-contraction resumes from the last
    committed star-set snapshot and yields the exact same assignment."""
    from tldr_spark.operators.components import connected_components

    # two chains + a cycle: needs several star rounds to contract
    chain = [(i, i + 1) for i in range(20, 35)] + [(i, i + 1) for i in range(50, 60)]
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    e = spark.createDataFrame(chain + cyc, "src long, dst long")
    want = {r["id"]: r["component"] for r in connected_components(e).assignments.collect()}

    ck = IterativeCheckpoint(spark, str(tmp_path / "ck_cc"))
    partial = connected_components(e, max_rounds=2, checkpoint=ck, checkpoint_every=1)
    assert partial.rounds == 2
    latest = ck.latest()
    assert latest is not None and latest[0] == 2
    assert latest[2]["n"] > 0  # checksum metrics committed

    resumed = connected_components(e, checkpoint=ck, checkpoint_every=1)
    got = {r["id"]: r["component"] for r in resumed.assignments.collect()}
    assert resumed.rounds > 2  # continued from round 2, not restarted
    assert got == want


def test_lpa_resume_reaches_identical_labels(spark, tmp_path):
    from tldr_spark.operators.labelprop import label_propagation

    # two cliques + a path tail: converges in a handful of rounds
    cl1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    cl2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    path = [(4, 10), (15, 16), (16, 17), (17, 18)]
    e = spark.createDataFrame(cl1 + cl2 + path + [(14, 15)], "src long, dst long")
    want = {r["id"]: r["label"] for r in label_propagation(e, max_rounds=12).labels.collect()}

    ck = IterativeCheckpoint(spark, str(tmp_path / "ck_lpa"))
    partial = label_propagation(e, max_rounds=2, checkpoint=ck, checkpoint_every=1)
    assert partial.rounds == 2 and not partial.converged
    assert ck.latest()[0] == 2

    resumed = label_propagation(e, max_rounds=12, checkpoint=ck, checkpoint_every=1)
    got = {r["id"]: r["label"] for r in resumed.labels.collect()}
    assert resumed.rounds > 2
    assert got == want
    # a third call resumes AT convergence and returns immediately
    again = label_propagation(e, max_rounds=12, checkpoint=ck, checkpoint_every=1)
    assert again.converged
    assert {r["id"]: r["label"] for r in again.labels.collect()} == want
