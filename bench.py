"""Benchmark harness. Prints ONE JSON line to stdout (driver contract).

Headline metric (BASELINE.json): PageRank edges/sec per power iteration to
L1 <= 1e-6 convergence on a deterministic Common-Crawl-style edge table,
measured at TWO parallelism levels — local[N] vs local[4N] (the sandbox
stand-in for N vs 4N executor clusters; no real cluster here) — plus the
scaling efficiency between them. Each level runs in its own subprocess
(own JVM) so `--master` is honest.

Secondary: wall seconds for the other headline operators at
$SPARK_GRAFT_SF_DIR (default sf0.1).

Graph: scaled from the sf dir's document count (sf0.1 -> 1M vertices,
~75M edges), generated JVM-side from spark.range with 20% of edges
targeting a V/150 hub set (power-law-ish in-degree skew) — the shape the
engine's skew design exists for. All debug goes to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# N vs 4N parallelism pair. Default 4 vs 16, NOT 8 vs 32: a pure-JVM compute
# microbenchmark (sum of xxhash64 over range(3e9)) scales 3.98x from 2->8
# and 3.70x from 4->16 threads on this VM, but only 1.19x from 8->32 — the
# 32 vCPUs oversubscribe the host beyond ~16 threads, so an 8-vs-32 run
# measures host contention, not the engine. See BENCH/BASELINE.md.
LOW_CPUS = int(os.environ.get("TLDR_BENCH_LOW_CPUS", "4"))
HIGH_CPUS = int(os.environ.get("TLDR_BENCH_HIGH_CPUS", "16"))
EDGE_MULT = int(os.environ.get("TLDR_BENCH_EDGE_MULT", "15000"))  # edges ≈ mult * n_docs
TOLERANCE = 1e-6
DAMPING = 0.85

# Iteration-workload session tuning (rationale in BENCH/BASELINE.md):
#  - AQE off: the iteration plan is static; AQE's per-stage re-planning is
#    serial driver time repeated every iteration
#  - shuffled-hash over sort-merge: no point re-sorting a cached edge table
#    every iteration
#  - shuffle on tmpfs: local-mode shuffle files on /dev/shm (a cluster would
#    use local NVMe); bounded by the 126G tmpfs
_BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.local.dir": os.environ.get("TLDR_BENCH_LOCAL_DIR", "/dev/shm/spark-local"),
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_edges(spark, n_docs: int):
    """Deterministic synthetic link graph, JVM-side only, distinct
    (src,dst) pairs BY CONSTRUCTION (dst affine in k with a stride coprime
    to V), so PageRank prep can skip the duplicate-sum shuffle. 20% of
    edges target a V/150 hub set -> power-law-ish in-degree skew."""
    from pyspark.sql import functions as F

    n_vertices = n_docs * 200
    n_edges = n_docs * EDGE_MULT
    hubs = max(100, n_vertices // 150)
    r = spark.range(n_edges)
    src = F.col("id") % n_vertices
    k = (F.col("id") / n_vertices).cast("long")
    dst = F.when(k % 5 < 1, (src * 7 + k) % hubs).otherwise(
        (src * 131 + k * 9973 + 17) % n_vertices
    )
    return (
        r.select(
            src.alias("src"),
            dst.alias("dst"),
            (F.lit(1.0) + (F.col("id") % 3).cast("double")).alias("weight"),
        ).filter(F.col("src") != F.col("dst"))
    ), n_edges


def run_pagerank(cpus: int) -> dict:
    """Subprocess worker: one parallelism level, returns metrics dict."""
    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.session import build_session

    os.makedirs(_BENCH_CONF["spark.local.dir"], exist_ok=True)
    spark = build_session(
        f"bench-pr-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf=_BENCH_CONF,
    )
    try:
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        edges, _ = bench_edges(spark, n_docs)
        t0 = time.monotonic()
        res = pagerank(
            edges, damping=DAMPING, tolerance=TOLERANCE, max_iter=200,
            broadcast_ranks=True, assume_distinct_edges=True,
        )
        wall = time.monotonic() - t0
        iter_walls = [m["wall_ms"] for m in res.metrics]
        # steady-state per-iteration time: drop the first 3 (cache warm-up,
        # initial AQE planning) before averaging
        steady = iter_walls[3:] or iter_walls
        per_iter_s = sum(steady) / len(steady) / 1000.0
        return {
            "cpus": cpus,
            "n_vertices": res.n_vertices,
            "n_edges": res.n_edges,
            "iterations": res.iterations,
            "l1_delta": res.l1_delta,
            "wall_s": round(wall, 2),
            "per_iter_s": round(per_iter_s, 4),
            "edges_per_sec_per_iter": round(res.n_edges / per_iter_s, 1),
        }
    finally:
        spark.stop()


def run_secondary() -> dict:
    """One-shot operator timings at SF_DIR on local[CPUS]."""
    from pyspark.sql import functions as F

    from tldr_spark.operators.components import connected_components
    from tldr_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from tldr_spark.operators.similarity import brute_force_topk
    from tldr_spark.operators.textstats import quality_score
    from tldr_spark.operators.triangles import triangle_count
    from tldr_spark.session import build_session
    from tldr_spark.sources.tables import derive_edges, load

    # HIGH_CPUS, not CPUS: this VM's vCPUs saturate beyond ~16 threads
    spark = build_session(
        "bench-secondary", master=f"local[{HIGH_CPUS}]", shuffle_partitions=HIGH_CPUS
    )
    out: dict[str, float] = {}
    try:
        edges = derive_edges(spark, SF_DIR).persist()
        edges.count()
        docs = load(spark, SF_DIR, "documents").persist()
        docs.count()
        embs = load(spark, SF_DIR, "embeddings").persist()
        embs.count()

        def t(name, fn):
            t0 = time.monotonic()
            fn()
            out[name] = round(time.monotonic() - t0, 3)
            log(f"  {name}: {out[name]}s")

        t("cc", lambda: connected_components(edges).assignments.count())
        from tldr_spark.operators.scc import strongly_connected_components
        t("scc", lambda: strongly_connected_components(edges).assignments.count())
        t("triangles", lambda: triangle_count(edges).per_vertex.count())

        from tldr_spark.operators.bfs import bfs_distances
        from tldr_spark.operators.hits import hits
        from tldr_spark.operators.kcore import k_core
        from tldr_spark.operators.pagerank import personalized_pagerank

        seeds = (
            edges.select(F.col("src").alias("id"))
            .filter(F.col("id") % 50 == 0)
            .distinct()
        )
        t("bfs", lambda: bfs_distances(edges, seeds).distances.count())
        from tldr_spark.operators.sssp import sssp
        t("sssp", lambda: sssp(edges, seeds).distances.count())
        from tldr_spark.operators.walks import random_walks
        t("walks8x2", lambda: random_walks(edges, walk_length=8, walks_per_vertex=2).count())
        t("hits10", lambda: hits(edges, iterations=10).scores.count())
        t("kcore3", lambda: k_core(edges, 3).vertices.count())
        t("ppr15", lambda: personalized_pagerank(
            edges, seeds, tolerance=-1.0, max_iter=15).ranks.count())
        t("dedup_exact", lambda: exact_dedup(docs).count())
        t("minhash_lsh", lambda: minhash_lsh_pairs(docs).count())
        t("ann_brute_topk", lambda: brute_force_topk(embs, embs.filter("vec_id < 20"), k=10).count())
        t("quality_score", lambda: quality_score(docs).count())
        t(
            "degree_topk",
            lambda: edges.groupBy("dst").count().orderBy(F.desc("count")).limit(20).collect(),
        )
        # the V-too-big-to-broadcast iteration path, on a quarter-size graph
        from tldr_spark.operators.pagerank import pagerank
        n_docs = docs.count()
        bedges, _ = bench_edges(spark, max(1, n_docs // 4))
        t("pagerank_shuffle_join_quarter", lambda: pagerank(
            bedges, tolerance=1e-6, broadcast_ranks=False, assume_distinct_edges=True
        ).ranks.count())
    finally:
        spark.stop()
    return out


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--pagerank-worker":
        print(json.dumps(run_pagerank(int(sys.argv[2]))))
        return 0

    results = {}
    for cpus in (LOW_CPUS, HIGH_CPUS):
        log(f"pagerank bench at local[{cpus}] ...")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pagerank-worker", str(cpus)],
            capture_output=True,
            text=True,
            env={**os.environ, "TLDR_SPARK_DRIVER_MEM": os.environ.get("TLDR_SPARK_DRIVER_MEM", "24g")},
            check=False,
        )
        if proc.returncode != 0:
            log(proc.stderr[-2000:])
            raise RuntimeError(f"pagerank worker local[{cpus}] failed")
        results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        log(f"  -> {results[cpus]}")

    lo, hi = results[LOW_CPUS], results[HIGH_CPUS]
    speedup = lo["per_iter_s"] / hi["per_iter_s"]
    efficiency = speedup / (HIGH_CPUS / LOW_CPUS)

    log("secondary operator benches ...")
    secondary = run_secondary()

    queries = {
        f"pagerank_local{LOW_CPUS}": lo["wall_s"],
        f"pagerank_local{HIGH_CPUS}": hi["wall_s"],
        **secondary,
    }
    out = {
        "metric": "pagerank_edges_per_sec_per_iter_to_1e-6",
        "value": hi["edges_per_sec_per_iter"],
        "unit": "edges/sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_edges": hi["n_edges"],
        "n_vertices": hi["n_vertices"],
        "iterations": hi["iterations"],
        "edges_per_sec_per_iter_low": lo["edges_per_sec_per_iter"],
        "edges_per_sec_per_iter_high": hi["edges_per_sec_per_iter"],
        "parallelism_low": LOW_CPUS,
        "parallelism_high": HIGH_CPUS,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
