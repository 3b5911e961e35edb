"""One-order-of-magnitude-up PageRank wall (VERDICT r4 optional #7).

Synthesizes the bench graph at sf1.0-equivalent size — n_docs=50_000 →
10M vertices / 750M edges, the exact generator bench.py uses at sf0.1
scaled 10x — and runs ONE full 1e-6-convergence fixpoint at local[16],
reporting per-iteration walls and edges/s/iter so the headline metric's
cost class can be read directly against the sf0.1 figure (same plan,
10x the rows: per-iteration wall should scale ~linearly in E, i.e.
edges/s/iter holds within host noise; a superlinear blowup would mean a
broadcast or partial-agg structure stopped fitting).

Memory shape: the prepared (src, dst, wn) table is ~18 GB on-heap, so
the driver gets 64g and the persist is MEMORY_AND_DISK (the default) —
any overflow spills to the DISK local dir, not /dev/shm (a 750M-edge
shuffle would blow the tmpfs). Run:

    TLDR_SPARK_DRIVER_MEM=64g python scripts/bench_sf1.py

Prints one JSON line; takes tens of minutes. Not part of bench.py's
driver-budgeted run — this is the round-5 evidence script whose result
is recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TLDR_SPARK_DRIVER_MEM", "64g")
# disk, not /dev/shm: the iteration shuffles ~6 GB/iter and the prep
# layout moves the whole 750M-row table once
os.environ.setdefault("TLDR_BENCH_LOCAL_DIR", "/root/repo/spark-warehouse/_sf1_local")

N_DOCS = int(os.environ.get("TLDR_SF1_NDOCS", "50000"))
CPUS = int(os.environ.get("TLDR_SF1_CPUS", "16"))
SHUFFLE_PARTS = int(os.environ.get("TLDR_SF1_SHUFFLE", "64"))


def main() -> int:
    import bench
    from tldr_spark.operators.pagerank import pagerank, prepare_edges
    from tldr_spark.session import build_session

    os.makedirs(os.environ["TLDR_BENCH_LOCAL_DIR"], exist_ok=True)
    spark = build_session(
        "bench-sf1",
        master=f"local[{CPUS}]",
        shuffle_partitions=SHUFFLE_PARTS,
        extra_conf={
            **bench._BENCH_CONF,
            "spark.local.dir": os.environ["TLDR_BENCH_LOCAL_DIR"],
        },
    )
    try:
        edges, n_edges_nominal = bench.bench_edges(spark, N_DOCS)
        t_prep0 = time.monotonic()
        en = prepare_edges(
            edges, "weight", None, partition_by="dst", assume_distinct=True
        ).persist()
        n_edges = en.count()
        prep_s = time.monotonic() - t_prep0
        print(f"prep done: {n_edges} edges in {prep_s:.0f}s", file=sys.stderr, flush=True)
        t0 = time.monotonic()
        res = pagerank(
            en,
            damping=bench.DAMPING,
            tolerance=bench.TOLERANCE,
            max_iter=200,
            broadcast_ranks=True,
            edges_prepared=True,
        )
        wall = time.monotonic() - t0
        iter_walls = [m["wall_ms"] / 1000.0 for m in res.metrics]
        steady = iter_walls[3:] if len(iter_walls) > 3 else iter_walls
        per_iter = min(steady)
        print(
            json.dumps(
                {
                    "metric": "pagerank_sf1_single_trial",
                    "n_docs": N_DOCS,
                    "n_vertices": res.n_vertices,
                    "n_edges": res.n_edges,
                    "iterations": res.iterations,
                    "l1_delta": res.l1_delta,
                    "prep_s": round(prep_s, 1),
                    "wall_s": round(wall, 1),
                    "iter_walls_s": [round(w, 2) for w in iter_walls],
                    "per_iter_s": round(per_iter, 3),
                    "edges_per_sec_per_iter": round(res.n_edges / per_iter, 1),
                    "cpus": CPUS,
                    "shuffle_partitions": SHUFFLE_PARTS,
                }
            ),
            flush=True,
        )
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(os.environ["TLDR_BENCH_LOCAL_DIR"], ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
