"""Cross-JVM-executor differential: the flagship PageRank fixpoint, the
distributed connected-components fixpoint, and synchronous label
propagation on ``local-cluster[2,8,4096]`` must equal the ``local[N]``
results (scores allclose 1e-9; components/labels exact).

Everything else in the repo runs ``local[N]`` — one JVM, where task
dispatch, broadcast variables, and the shuffle all short-circuit
in-process. Spark's local-cluster master spins REAL separate executor
JVMs with serialized task dispatch and the network shuffle stack, so
this test exercises the failure modes ``local[N]`` structurally cannot
catch (a closure capturing a non-serializable handle, a broadcast that
only works in-process) — the cheapest stand-in for the north rule's
multi-executor cluster that exists in a sandbox (VERDICT r4 task #4).
Components run with ``local_finish_edges=0`` on BOTH sides so the
distributed small-star/large-star fixpoint itself crosses the executor
boundary instead of the driver finisher absorbing the tiny graph.

Runs in a SUBPROCESS because the suite shares one session-scoped
local[4] JVM; a second master inside the same process would collide.
One JVM pair (~60-90s) computes all three results.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"

_CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from tldr_spark.session import build_session
from tldr_spark.sources.tables import derive_edges
from tldr_spark.operators.pagerank import pagerank
from tldr_spark.operators.components import connected_components
from tldr_spark.operators.labelprop import label_propagation

spark = build_session(
    "lc-differential",
    master="local-cluster[2,8,4096]",
    shuffle_partitions=16,
    extra_conf={"spark.executor.memory": "3g"},
)
edges = derive_edges(spark, %(sf_dir)r)
pr = pagerank(edges, damping=0.85, tolerance=1e-6)
cc = connected_components(edges, local_finish_edges=0)
lp = label_propagation(edges, max_rounds=10)
print("LCRESULT " + json.dumps({
    "iters": pr.iterations,
    "ranks": {str(r["id"]): r["rank"] for r in pr.ranks.collect()},
    "components": {str(r["id"]): r["component"]
                   for r in cc.assignments.collect()},
    "labels": {str(r["id"]): r["label"] for r in lp.labels.collect()},
}))
spark.stop()
"""


@pytest.mark.skipif(
    os.environ.get("TLDR_SKIP_LOCAL_CLUSTER") == "1",
    reason="local-cluster JVM pair disabled via TLDR_SKIP_LOCAL_CLUSTER",
)
def test_fixpoints_match_across_executor_boundary(spark):
    from tldr_spark.operators.components import connected_components
    from tldr_spark.operators.labelprop import label_propagation
    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.sources.tables import derive_edges

    proc = subprocess.run(
        [sys.executable, "-c", _CHILD % {"sf_dir": SF_DIR}],
        capture_output=True,
        text=True,
        timeout=900,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("LCRESULT ")
    )
    lc = json.loads(line[len("LCRESULT "):])

    edges = derive_edges(spark, SF_DIR)
    res = pagerank(edges, damping=0.85, tolerance=1e-6)
    local_ranks = {str(r["id"]): r["rank"] for r in res.ranks.collect()}

    assert set(lc["ranks"]) == set(local_ranks)
    # same deterministic iteration count and per-vertex fixpoint: the
    # iteration is pure double arithmetic with order-independent
    # aggregation semantics only up to FP addition order, hence 1e-9
    # allclose rather than bit equality
    assert lc["iters"] == res.iterations
    worst = max(
        abs(lc["ranks"][k] - local_ranks[k]) / max(abs(local_ranks[k]), 1e-300)
        for k in local_ranks
    )
    assert worst < 1e-9, f"max rel diff {worst}"

    # components and labels are EXACT contracts (north rule): integer
    # min-label fixpoints, no FP tolerance
    local_cc = {
        str(r["id"]): r["component"]
        for r in connected_components(
            edges, local_finish_edges=0
        ).assignments.collect()
    }
    assert lc["components"] == local_cc

    local_lp = {
        str(r["id"]): r["label"]
        for r in label_propagation(edges, max_rounds=10).labels.collect()
    }
    assert lc["labels"] == local_lp
