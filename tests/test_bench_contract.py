"""The grading driver's single most load-bearing dependency is bench.py's
stdout contract: ONLY summary JSON lines, the last one complete. Round 3
lost its entire bench row to a driver timeout because the old bench
emitted once at the very end — this test pins the round-4 contract
(incremental emission + wall-clock budget) end to end by running the real
bench binary at sf0.001 with a 1-second budget, which forces the minimal
schedule: shared prep + one trial per level, secondary skipped."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_stdout_is_json_only_and_budget_degrades_gracefully():
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "TLDR_BENCH_TRIALS": "3",          # budget must cut this to 1+1
        "TLDR_BENCH_INNER_REPEATS": "1",
        "TLDR_BENCH_EXTRA_TRIALS": "2",    # budget must suppress extras
        "TLDR_BENCH_BUDGET_S": "1",
        "TLDR_BENCH_SECONDARY_RESERVE_S": "0",
        # pin everything the assertions depend on against ambient exports
        "TLDR_BENCH_LOW_CPUS": "4",
        "TLDR_BENCH_HIGH_CPUS": "16",
        "TLDR_BENCH_EDGE_MULT": "15000",
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    # driver contract: every stdout line is a COMPLETE summary JSON
    assert len(lines) >= 2, proc.stdout
    summaries = [json.loads(l) for l in lines]
    for s in summaries:
        assert s["metric"] == "pagerank_edges_per_sec_per_iter_to_1e-6"
        assert s["value"] > 0
        assert isinstance(s["scaling_efficiency"], float)
        assert s["per_iter_s_low_trials"] and s["per_iter_s_high_trials"]
    # all but the last are partial; the last is final
    assert all(s["partial"] for s in summaries[:-1])
    final = summaries[-1]
    assert final["partial"] is False
    # the 1-second budget forces exactly one trial per level, no extras,
    # and a skipped secondary table — graceful degradation, not a crash
    assert final["trials_completed"] == {"4": 1, "16": 1}
    assert set(final["queries"]) == {"pagerank_local4", "pagerank_local16"}
    assert "budget: skipping" in proc.stderr
