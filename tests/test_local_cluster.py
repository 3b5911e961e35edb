"""Cross-JVM-executor differential: the flagship PageRank fixpoint on
``local-cluster[2,8,4096]`` must equal the ``local[N]`` run to 1e-9.

Everything else in the repo runs ``local[N]`` — one JVM, where task
dispatch, broadcast variables, and the shuffle all short-circuit
in-process. Spark's local-cluster master spins REAL separate executor
JVMs with serialized task dispatch and the network shuffle stack, so
this test exercises the failure modes ``local[N]`` structurally cannot
catch (a closure capturing a non-serializable handle, a broadcast that
only works in-process) — the cheapest stand-in for the north rule's
multi-executor cluster that exists in a sandbox (VERDICT r4 task #4).

Runs in a SUBPROCESS because the suite shares one session-scoped
local[4] JVM; a second master inside the same process would collide.
Marked slow-ish but kept in the default suite: one extra JVM pair is
~60-90s, and this is the repo's only cross-executor evidence.
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

spark = build_session(
    "lc-differential",
    master="local-cluster[2,8,4096]",
    shuffle_partitions=16,
    extra_conf={"spark.executor.memory": "3g"},
)
edges = derive_edges(spark, %(sf_dir)r)
res = pagerank(edges, damping=0.85, tolerance=1e-6)
rows = res.ranks.collect()
print("LCRESULT " + json.dumps(
    {"iters": res.iterations, "ranks": {str(r["id"]): r["rank"] for r in rows}}
))
spark.stop()
"""


@pytest.mark.skipif(
    os.environ.get("TLDR_SKIP_LOCAL_CLUSTER") == "1",
    reason="local-cluster JVM pair disabled via TLDR_SKIP_LOCAL_CLUSTER",
)
def test_pagerank_scores_match_across_executor_boundary(spark):
    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.sources.tables import derive_edges

    proc = subprocess.run(
        [sys.executable, "-c", _CHILD % {"sf_dir": SF_DIR}],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("LCRESULT ")
    )
    lc = json.loads(line[len("LCRESULT "):])

    res = pagerank(derive_edges(spark, SF_DIR), damping=0.85, tolerance=1e-6)
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
