"""spark-submit entry point for the PageRank job.

Usage (cluster or local):

    python scripts/make_pyfiles.py                      # -> dist/tldr_spark.zip
    spark-submit --master <master> \\
        --py-files dist/tldr_spark.zip \\
        scripts/pagerank_job.py \\
        --edges <parquet path with (src,dst[,weight])> \\
        --output <parquet path for (id, rank)> \\
        [--damping 0.85] [--tolerance 1e-6] [--checkpoint-dir <path>] \\
        [--shuffle-join] [--synth-docs N]

With --synth-docs N a deterministic benchmark graph (bench.bench_edges
shape) replaces --edges — useful for cluster shakeout without data.
Metrics (per-iteration L1 delta, wall ms) print to stderr as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--edges")
    p.add_argument("--output", required=True)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tolerance", type=float, default=1e-6)
    p.add_argument("--max-iter", type=int, default=200)
    p.add_argument("--checkpoint-dir")
    p.add_argument("--checkpoint-every", type=int, default=5)
    p.add_argument("--shuffle-join", action="store_true",
                   help="co-partitioned shuffle join instead of broadcasting ranks (use when V is large)")
    p.add_argument("--synth-docs", type=int)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("tldr-spark-pagerank").getOrCreate()

    from tldr_spark.operators.pagerank import pagerank
    from tldr_spark.plans.checkpoint import IterativeCheckpoint

    if args.synth_docs:
        sys.path.insert(0, ".")  # bench.py ships alongside via --py-files
        from bench import bench_edges

        edges, _ = bench_edges(spark, args.synth_docs)
    elif args.edges:
        edges = spark.read.parquet(args.edges)
    else:
        p.error("--edges or --synth-docs required")

    ck = (
        IterativeCheckpoint(spark, args.checkpoint_dir)
        if args.checkpoint_dir
        else None
    )
    res = pagerank(
        edges,
        damping=args.damping,
        tolerance=args.tolerance,
        max_iter=args.max_iter,
        broadcast_ranks=not args.shuffle_join,
        checkpoint=ck,
        checkpoint_every=args.checkpoint_every,
        assume_distinct_edges=bool(args.synth_docs),
    )
    for m in res.metrics:
        print(json.dumps(m), file=sys.stderr)
    res.ranks.write.mode("overwrite").parquet(args.output)
    print(
        json.dumps(
            {
                "vertices": res.n_vertices,
                "edges": res.n_edges,
                "iterations": res.iterations,
                "l1_delta": res.l1_delta,
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
