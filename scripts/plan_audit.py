"""Physical-plan audit of the driver-contract queries.

For each query: the parquet scans' ReadSchema (column pruning) and
PushedFilters (predicate pushdown), plus join/exchange operator counts.
Red flags it guards against at 100 TB:
  * a scan reading columns the query doesn't project (pruning broken)
  * a doc_id/vec_id filter NOT in PushedFilters (pushdown broken)
  * SortMergeJoin/CartesianProduct where a broadcast was intended
BroadcastNestedLoopJoin is expected ONLY for the documented O(n²)
verification-stage theta joins (jaro/containment/near-dup all-pairs, which
at scale run behind LSH candidate pruning instead).

Usage: python scripts/plan_audit.py [query ...]   (default: headline set)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

HEADLINE = [
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
    # round-4 additions
    "stratified_sample_docs",
    "reservoir_per_lang",
    "lang_mixing_matrix",
    "dyad_census",
    "rich_club_coeffs",
]

FEATURES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "Exchange hashpartitioning",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
]


def main() -> int:
    import __spark_entry__ as entrymod
    from tldr_spark.session import build_session

    spark = build_session()
    sf_dir = "/root/testdata/sf0.01"
    names = sys.argv[1:] or HEADLINE
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"== {name}")
        for line in plan.splitlines():
            if "FileScan" not in line:
                continue
            pf = re.search(r"PushedFilters: \[[^\]]*\]", line)
            rs = re.search(r"ReadSchema: \S+", line)
            print("    scan:", pf.group(0) if pf else "", (rs.group(0)[:140] if rs else ""))
        for feat in FEATURES:
            c = plan.count(feat)
            if c:
                print(f"    {feat}: {c}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
