"""Adjacency-gap compression stats vs a pure-Python integer mirror."""

from __future__ import annotations

from collections import defaultdict

from tldr_spark.operators.webgraph import adjacency_gap_bits


def _py_stats(edges):
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    buckets = defaultdict(lambda: [0, 0, 0])  # n_srcs, n_edges, total_bits
    for s, ds in adj.items():
        ds = sorted(ds)
        bits = (2 * abs(ds[0] - s) + 1).bit_length()
        for prev, cur in zip(ds, ds[1:]):
            bits += (cur - prev).bit_length()
        b = buckets[len(ds).bit_length()]
        b[0] += 1
        b[1] += len(ds)
        b[2] += bits
    return {
        k: (
            v[0],
            v[1],
            v[2],
            round(v[2] * 16384 / v[1]),
            64 * v[1],
        )
        for k, v in buckets.items()
    }


def _check(spark, edges):
    df = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    got = {
        r["deg_bucket"]: (
            r["n_srcs"],
            r["n_edges"],
            r["total_bits"],
            r["bits_per_edge_q"],
            r["raw_bits"],
        )
        for r in adjacency_gap_bits(df).collect()
    }
    assert got == _py_stats(edges)


def test_hand_case(spark):
    # src 10 -> {11, 12, 20}: first zigzag(1)=3 -> bitlen 2; gaps 1,8 -> 1+4
    # outdeg 3 -> bucket 2
    edges = [(10, 11), (10, 12), (10, 20)]
    got = adjacency_gap_bits(
        spark.createDataFrame(
            [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
        )
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["deg_bucket"], r["n_srcs"], r["n_edges"], r["total_bits"]) == (2, 1, 3, 7)
    assert r["raw_bits"] == 192


def test_matches_python_mirror(spark):
    # deterministic scatter incl. duplicates, reversed ids, distant dsts,
    # power-of-two gaps (the bitlen boundary cases)
    edges = []
    for s in range(40):
        for k in range(1 + (s * s) % 5):
            edges.append((s, (s * 131 + k * 101 + 7) % 64))
        edges.append((s, s + 2 ** (s % 6)))
    edges += edges[:17]  # duplicates must collapse
    _check(spark, [e for e in edges if e[0] != e[1]])


def test_locality_beats_scatter(spark):
    """Clustered ids compress better — the reason Z-order/locality layout
    matters for edge storage."""
    local = [(s, s + 1 + g) for s in range(0, 100, 2) for g in range(5)]
    scattered = [(s, (s * 7919 + g * 104729) % 100000) for s in range(0, 100, 2) for g in range(5)]

    def total_bits(edges):
        d = spark.createDataFrame(
            [(s, t, 1.0) for s, t in edges if s != t],
            "src long, dst long, weight double",
        )
        return sum(r["total_bits"] for r in adjacency_gap_bits(d).collect())

    assert total_bits(local) < total_bits(scattered)
