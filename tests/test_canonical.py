"""Canonical-chain resolution — python oracle parity incl. cap/cycle cases."""

from __future__ import annotations

import pytest

from tldr_spark.operators.canonical import canonical_map, resolve_canonical_chains

# Hand-built graph exercising every semantic branch:
#   0 -> 1 -> 2 -> 3           chain of 3 to terminal 3
#   4 -> 5, 5 -> 4             pure 2-cycle
#   6 -> 7 -> 4                chain entering the cycle
#   8                          terminal reached only as a dst (via 9)
#   9: multi-edge 9->8 (1+1=2) must beat 9->10 (weight 2 once, tie) —
#      collapsed sum wins argmax; tie at w=2 then broken to min dst (8)
#   10 -> 10 is impossible (self-loops filtered upstream); 10 -> 11 ... a
#   chain of length 9 (10..19) so the cap bites at hop 8.
EDGES = (
    [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    + [(4, 5, 1.0), (5, 4, 1.0)]
    + [(6, 7, 1.0), (7, 4, 1.0)]
    + [(9, 8, 1.0), (9, 8, 1.0), (9, 10, 2.0)]
    + [(i, i + 1, 1.0) for i in range(10, 19)]
    # decoy low-weight out-edges that argmax must ignore
    + [(0, 3, 0.5), (12, 4, 0.5)]
)


def _canon_py(edges):
    nw: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        nw[(s, d)] = nw.get((s, d), 0.0) + w
    best: dict[int, tuple[float, int]] = {}
    for (s, d), w in nw.items():
        cur = best.get(s)
        if cur is None or (w, -d) > (cur[0], -cur[1]):
            best[s] = (w, d)
    return {s: d for s, (_, d) in best.items()}


def _resolve_py(edges, max_hops=8):
    canon = _canon_py(edges)
    verts = sorted({v for s, d, _ in edges for v in (s, d)})
    out = {}
    for v in verts:
        cur, hops = v, 0
        while cur in canon and hops < max_hops:
            cur = canon[cur]
            hops += 1
        out[v] = (cur, hops, 0 if cur in canon else 1)
    return out


def _df(spark, edges=EDGES):
    return spark.createDataFrame(edges, "src long, dst long, weight double")


def test_canonical_map_argmax_and_ties(spark):
    got = {r.v: r.ptr for r in canonical_map(_df(spark)).collect()}
    assert got == _canon_py(EDGES)
    assert got[9] == 8  # multi-edge sum 2.0 ties weight-2 edge; min dst wins
    assert got[0] == 1  # decoy 0.5-weight edge ignored


def test_resolution_matches_python_oracle(spark):
    got = {
        r.src: (r.resolved_dst, r.hops, r.resolved)
        for r in resolve_canonical_chains(_df(spark)).collect()
    }
    assert got == _resolve_py(EDGES)


def test_cap_and_cycle_semantics(spark):
    got = {
        r.src: (r.resolved_dst, r.hops, r.resolved)
        for r in resolve_canonical_chains(_df(spark)).collect()
    }
    assert got[3] == (3, 0, 1)  # terminal: itself, 0 hops
    assert got[0] == (3, 3, 1)  # 3-chain resolves exactly
    assert got[4] == (4, 8, 0)  # 2-cycle: back at 4 after 8 steps
    assert got[6] == (4, 8, 0)  # enters cycle; position after exactly 8 steps
    assert got[11] == (19, 8, 1)  # chain of exactly 8: resolved at the cap
    assert got[10] == (18, 8, 0)  # chain of 9: capped, unresolved


def test_exact_power_of_two_hops_cap(spark):
    with pytest.raises(ValueError):
        resolve_canonical_chains(_df(spark), max_hops=6)
    got = {
        r.src: (r.resolved_dst, r.hops, r.resolved)
        for r in resolve_canonical_chains(_df(spark), max_hops=2).collect()
    }
    assert got == _resolve_py(EDGES, max_hops=2)


def test_random_functional_graph_differential(spark):
    # Deterministic pseudo-random functional graph with shared dsts so
    # chains, merges, and cycles all occur.
    edges = [
        (v, (v * 37 + 11) % 60, float(1 + (v * 13) % 3)) for v in range(60)
    ] + [(v, (v * 29 + 3) % 60, 0.25) for v in range(0, 60, 2)]
    edges = [(s, d, w) for s, d, w in edges if s != d]
    got = {
        r.src: (r.resolved_dst, r.hops, r.resolved)
        for r in resolve_canonical_chains(_df(spark, edges)).collect()
    }
    assert got == _resolve_py(edges)


def test_plan_is_udf_free(spark):
    plan = (
        resolve_canonical_chains(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
