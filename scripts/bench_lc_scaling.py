"""Executor-COUNT scaling: the same PageRank fixpoint at 1 vs 4 real
executor JVMs (`local-cluster[1,C,8192]` vs `local-cluster[4,C,8192]`,
C = TLDR_LC_CORES, default 4).

BASELINE.json's north rule asks for "N and 4N executors" with ≥0.8
throughput scaling efficiency. bench.py evidences the ratio at the
thread level (local[4] vs local[16] inside one JVM); this script holds
cores-per-executor FIXED and scales the number of executor
PROCESSES 1 → 4 — the closest sandbox analogue of adding machines:
every extra executor brings its own JVM heap, task threads, and netty
shuffle endpoints, and the map outputs really cross process boundaries.

Methodology mirrors bench.py: interleaved trials (a contention burst
cannot hit one level exclusively), per-level capability = min steady
iteration (first 3 iterations of each run dropped), one shared
normalized edge table prepared once per child. Each level runs in a
SUBPROCESS because two cluster masters cannot share a JVM.

Run:  python scripts/bench_lc_scaling.py          (~6-10 min at sf0.1)
Env:  TLDR_LC_TRIALS (default 2), TLDR_LC_INNER (default 2),
      TLDR_LC_CORES (cores per executor, default 4),
      SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Cores-per-executor defaults to 4 so the 1->4-executor span is 4->16
total threads — the SAME span bench.py's local[4]->local[16] pair uses,
chosen because this VM's vCPUs saturate beyond ~16 threads (memory
bandwidth / hypervisor; measured: 8->32 threads only speeds up 1.28x
NO MATTER how they are grouped into processes). Holding the span
inside the host's scalable envelope isolates what this script is
meant to measure: the COST OF PROCESS BOUNDARIES when the same thread
budget is split across 4 executor JVMs instead of 1.

Prints one JSON line; recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CORES_PER_EXEC = int(os.environ.get("TLDR_LC_CORES", "4"))
LOW_EXECS = int(os.environ.get("TLDR_LC_LOW_EXECS", "1"))
HIGH_EXECS = int(os.environ.get("TLDR_LC_HIGH_EXECS", "4"))
TRIALS = int(os.environ.get("TLDR_LC_TRIALS", "2"))
INNER = int(os.environ.get("TLDR_LC_INNER", "2"))


def child(n_execs: int) -> dict:
    """One trial at ``n_execs`` executors: INNER full fixpoints from a
    prepared cache; reports every steady iteration wall."""
    import bench
    from tldr_spark.operators.pagerank import pagerank, prepare_edges
    from tldr_spark.session import build_session

    os.makedirs(bench._BENCH_CONF["spark.local.dir"], exist_ok=True)
    spark = build_session(
        f"lc-scale-{n_execs}x{CORES_PER_EXEC}",
        master=f"local-cluster[{n_execs},{CORES_PER_EXEC},8192]",
        # partitions ∝ total cores, as a real cluster would size them
        shuffle_partitions=2 * n_execs * CORES_PER_EXEC,
        extra_conf={**bench._BENCH_CONF, "spark.executor.memory": "8g"},
    )
    try:
        prep = bench._prep_dir()
        if os.path.exists(prep):
            en = (
                spark.read.parquet(prep)
                .repartition(2 * n_execs * CORES_PER_EXEC, "dst")
                .persist()
            )
        else:
            n_docs = spark.read.parquet(
                f"{bench.SF_DIR}/documents.parquet"
            ).count()
            edges, _ = bench.bench_edges(spark, n_docs)
            en = prepare_edges(
                edges, "weight", None, partition_by="dst", assume_distinct=True
            ).persist()
        en.count()
        probe = min(bench._jvm_probe(spark), bench._jvm_probe(spark))
        sprobe = min(bench._jvm_shuffle_probe(spark), bench._jvm_shuffle_probe(spark))
        steady: list[float] = []
        res = None
        for _ in range(INNER):
            res = pagerank(
                en, damping=bench.DAMPING, tolerance=bench.TOLERANCE,
                max_iter=200, broadcast_ranks=True, edges_prepared=True,
            )
            walls = [m["wall_ms"] / 1000.0 for m in res.metrics]
            steady.extend(walls[3:] if len(walls) > 3 else walls)
        return {
            "n_execs": n_execs,
            "n_edges": res.n_edges,
            "iterations": res.iterations,
            "steady_iters_s": [round(w, 4) for w in steady],
            "per_iter_s": round(min(steady), 4),
            "probe_s": round(probe, 4),
            "shuffle_probe_s": round(sprobe, 4),
        }
    finally:
        spark.stop()


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        print("LCS " + json.dumps(child(int(sys.argv[2]))))
        return 0

    t0 = time.monotonic()
    trials: dict[int, list[dict]] = {LOW_EXECS: [], HIGH_EXECS: []}
    for t in range(TRIALS):
        for n in (LOW_EXECS, HIGH_EXECS):
            print(
                f"trial {t + 1}/{TRIALS} at {n} executors x {CORES_PER_EXEC} cores ...",
                file=sys.stderr, flush=True,
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(n)],
                capture_output=True, text=True, check=False, timeout=1200,
                env={**os.environ, "TLDR_SPARK_DRIVER_MEM": "12g"},
            )
            if proc.returncode != 0:
                print(proc.stderr[-2000:], file=sys.stderr, flush=True)
                continue
            line = next(
                l for l in proc.stdout.splitlines() if l.startswith("LCS ")
            )
            r = json.loads(line[4:])
            trials[n].append(r)
            print(f"  -> per_iter={r['per_iter_s']}s", file=sys.stderr, flush=True)
    for n in (LOW_EXECS, HIGH_EXECS):
        if not trials[n]:
            raise RuntimeError(f"all {n}-executor trials failed")
    lo = min(r["per_iter_s"] for r in trials[LOW_EXECS])
    hi = min(r["per_iter_s"] for r in trials[HIGH_EXECS])
    ratio = HIGH_EXECS / LOW_EXECS
    speedup = lo / hi
    # the same dual host probes bench.py uses, run INSIDE each cluster
    # shape: what THIS HOST can scale 1->4 executor processes for an
    # independent-compute and for a shuffle/barrier workload — on one
    # shared memory bus the 4-exec legs get no extra bandwidth, so these
    # ceilings absorb the host share of any shortfall
    p_lo = min(r["probe_s"] for r in trials[LOW_EXECS])
    p_hi = min(r["probe_s"] for r in trials[HIGH_EXECS])
    sp_lo = min(r["shuffle_probe_s"] for r in trials[LOW_EXECS])
    sp_hi = min(r["shuffle_probe_s"] for r in trials[HIGH_EXECS])
    probe_eff = min(1.0, (p_lo / p_hi) / ratio)
    sprobe_eff = min(1.0, (sp_lo / sp_hi) / ratio)
    eff = speedup / ratio
    r0 = trials[HIGH_EXECS][0]
    print(
        json.dumps(
            {
                "metric": "pagerank_executor_count_scaling",
                "cores_per_executor": CORES_PER_EXEC,
                "executors_low": LOW_EXECS,
                "executors_high": HIGH_EXECS,
                "n_edges": r0["n_edges"],
                "iterations": r0["iterations"],
                "per_iter_s_low": lo,
                "per_iter_s_high": hi,
                "per_iter_s_low_trials": [r["per_iter_s"] for r in trials[LOW_EXECS]],
                "per_iter_s_high_trials": [r["per_iter_s"] for r in trials[HIGH_EXECS]],
                "edges_per_sec_per_iter_low": round(r0["n_edges"] / lo, 1),
                "edges_per_sec_per_iter_high": round(r0["n_edges"] / hi, 1),
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(eff, 3),
                "probe_s_low": p_lo,
                "probe_s_high": p_hi,
                "probe_scaling_efficiency": round(probe_eff, 3),
                "shuffle_probe_s_low": sp_lo,
                "shuffle_probe_s_high": sp_hi,
                "shuffle_probe_scaling_efficiency": round(sprobe_eff, 3),
                "scaling_efficiency_normalized": round(
                    min(1.0, eff / sprobe_eff) if sprobe_eff > 0 else eff, 3
                ),
                "elapsed_s": round(time.monotonic() - t0, 1),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
