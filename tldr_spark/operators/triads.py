"""Dyad and triad census over the directed link graph — the classic
Holland-Leinhardt (1970) structural signature, computed with the
Batagelj-Mrvar (Social Networks 2001) subquadratic strategy:

* enumerate ONLY triples with ≥2 linked dyads (every such triple has a
  "center" vertex undirected-adjacent to the other two, so a wedge
  self-join of the undirected adjacency finds each exactly once per
  qualifying center; distinct on the sorted triple dedupes),
* count single-linked-dyad triads (types 012 / 102) analytically per dyad
  as ``(n-2) − |N(a) ∪ N(b) − {a,b}|``,
* the empty type 003 by complement against C(n,3).

Cost: the wedge join is Σ_v deg(v)² — the same frontier every triangle
counter pays; at web scale the undirected adjacency is built once and the
wedge join shuffles on the center key, so hub skew is the usual salting /
AQE-skew story, not a new one. The census output is 16 rows; the analytic
tail collapses to two aggregates. All joins are equi-joins (the OR-shaped
"neighbors of a or b" probe is a union of two equi-joins, keeping
tests/test_plan_hygiene.py's no-theta-join rule).

The 64-entry (code_ab, code_ac, code_bc) → type classifier lives here in
pure Python and is shared by the Spark path (broadcast 64-row lookup) and
the DuckDB oracle (inline VALUES from :func:`lookup_sql_values`), so the
two engines cannot disagree by construction. Type names follow the
standard MAN + orientation convention (021D/U/C, 111D/U, 030T/C,
120D/U/C).

Reference parity note: the reference (didasy/tldr) has no census operator;
this extends its sentence-graph connectivity analysis (tldr.go edge
builder) with the SNA primitive a link-graph engine is expected to ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIAD_TYPES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

_PAIRS = [(0, 1), (0, 2), (1, 2)]


def _type_of(arcs: set[tuple[int, int]]) -> str:
    """Triad isomorphism class of an arc set over vertices {0,1,2}."""
    m = a = 0
    mpair: set[int] = set()
    for x, y in _PAIRS:
        fx, fy = (x, y) in arcs, (y, x) in arcs
        if fx and fy:
            m += 1
            mpair = {x, y}
        elif fx or fy:
            a += 1
    base = f"{m}{a}{3 - m - a}"
    if base in ("003", "012", "102", "201", "210", "300"):
        return base
    outd = {v: sum((v, w) in arcs for w in range(3) if w != v) for v in range(3)}
    ind = {v: sum((w, v) in arcs for w in range(3) if w != v) for v in range(3)}
    if base == "021":
        if 2 in outd.values():
            return "021D"  # A<-B->C: one vertex sends both arcs
        if 2 in ind.values():
            return "021U"  # A->B<-C: one vertex receives both
        return "021C"  # A->B->C: chain
    if base == "111":
        head = next(y for (x, y) in arcs if (y, x) not in arcs)
        return "111D" if head in mpair else "111U"
    if base == "030":
        return "030C" if all(outd[v] == 1 for v in range(3)) else "030T"
    if base == "120":
        out_v = ({0, 1, 2} - mpair).pop()
        sent = sum((out_v, w) in arcs for w in mpair)
        if sent == 2:
            return "120D"
        if sent == 0:
            return "120U"
        return "120C"
    raise AssertionError(f"unreachable base {base}")  # pragma: no cover


def _arcs(c12: int, c13: int, c23: int) -> set[tuple[int, int]]:
    """Arc set from per-dyad codes (0 none, 1 lo→hi, 2 hi→lo, 3 mutual)."""
    arcs: set[tuple[int, int]] = set()
    for code, (x, y) in zip((c12, c13, c23), _PAIRS):
        if code in (1, 3):
            arcs.add((x, y))
        if code in (2, 3):
            arcs.add((y, x))
    return arcs


#: all 64 (code_ab, code_ac, code_bc) combinations → triad type
LOOKUP: dict[tuple[int, int, int], str] = {
    (c12, c13, c23): _type_of(_arcs(c12, c13, c23))
    for c12 in range(4)
    for c13 in range(4)
    for c23 in range(4)
}


def lookup_sql_values() -> str:
    """The classifier as a SQL VALUES list: ``(c12,c13,c23,ttype), ...``."""
    return ", ".join(
        f"({k[0]},{k[1]},{k[2]},'{v}')" for k, v in sorted(LOOKUP.items())
    )


def _pair_codes(edges: DataFrame) -> DataFrame:
    """(a, b, code) per linked unordered pair, a < b; code 1 = a→b only,
    2 = b→a only, 3 = mutual. Self-loops dropped."""
    g = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return (
        g.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("f1"),
            F.when(F.col("src") > F.col("dst"), 2).otherwise(0).alias("f2"),
        )
        .groupBy("a", "b")
        .agg((F.max("f1") + F.max("f2")).alias("code"))
    )


def dyad_census(edges: DataFrame) -> DataFrame:
    """One row: (mutual, asym, null_pairs) over C(n,2) unordered pairs of
    the edge-endpoint vertex set (isolated vertices don't exist in an edge
    table). Two aggregates; the null count is the complement."""
    pc = _pair_codes(edges).persist()
    agg = pc.agg(
        F.coalesce(F.sum(F.when(F.col("code") == 3, 1)), F.lit(0)).alias("m"),
        F.coalesce(F.sum(F.when(F.col("code") < 3, 1)), F.lit(0)).alias("a"),
    ).collect()[0]
    mutual, asym = int(agg["m"]), int(agg["a"])
    g = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).filter(
        F.col("src") != F.col("dst")
    )
    n = (
        g.select(F.col("src").alias("id"))
        .union(g.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    pc.unpersist()
    null_pairs = n * (n - 1) // 2 - mutual - asym
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(mutual, asym, null_pairs)], "mutual long, asym long, null_pairs long"
    )


def triad_census(edges: DataFrame) -> DataFrame:
    """16 rows: (triad_type, n_triads), the full directed triad census over
    C(n,3) vertex triples of the edge-endpoint set. Distributed work is the
    wedge enumeration + three code joins; the 012/102/003 tails are
    analytic aggregates; final assembly is a 16-value driver dict."""
    spark = edges.sparkSession
    pc = _pair_codes(edges).persist()
    pc.count()

    adj = pc.select(F.col("a").alias("v"), F.col("b").alias("w")).union(
        pc.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    x = adj.alias("x")
    y = adj.alias("y")
    tri = (
        x.join(y, (F.col("x.v") == F.col("y.v")) & (F.col("x.w") < F.col("y.w")))
        .select(
            F.array_sort(F.array("x.v", "x.w", "y.w")).alias("t")
        )
        .select(
            F.col("t")[0].alias("t1"), F.col("t")[1].alias("t2"), F.col("t")[2].alias("t3")
        )
        .distinct()
    )
    c12 = pc.select(F.col("a").alias("t1"), F.col("b").alias("t2"), F.col("code").alias("c12"))
    c13 = pc.select(F.col("a").alias("t1"), F.col("b").alias("t3"), F.col("code").alias("c13"))
    c23 = pc.select(F.col("a").alias("t2"), F.col("b").alias("t3"), F.col("code").alias("c23"))
    coded = (
        tri.join(c12, ["t1", "t2"], "left")
        .join(c13, ["t1", "t3"], "left")
        .join(c23, ["t2", "t3"], "left")
        .select(
            F.coalesce("c12", F.lit(0)).alias("c12"),
            F.coalesce("c13", F.lit(0)).alias("c13"),
            F.coalesce("c23", F.lit(0)).alias("c23"),
        )
    )
    lut = spark.createDataFrame(
        [(k[0], k[1], k[2], v) for k, v in sorted(LOOKUP.items())],
        "c12 int, c13 int, c23 int, ttype string",
    )
    enum_rows = (
        coded.join(F.broadcast(lut), ["c12", "c13", "c23"])
        .groupBy("ttype")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts = {r["ttype"]: int(r["cnt"]) for r in enum_rows}

    # analytic 012/102: per linked dyad, triples where it is the ONLY link
    za = pc.join(adj, F.col("v") == F.col("a")).select("a", "b", "code", "w")
    zb = pc.join(adj, F.col("v") == F.col("b")).select("a", "b", "code", "w")
    thirds = (
        za.union(zb)
        .filter((F.col("w") != F.col("a")) & (F.col("w") != F.col("b")))
        .groupBy("a", "b")
        .agg(F.count_distinct("w").alias("u"))
    )
    g = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).filter(
        F.col("src") != F.col("dst")
    )
    n = (
        g.select(F.col("src").alias("id"))
        .union(g.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    single_rows = (
        pc.join(thirds, ["a", "b"], "left")
        .select(
            F.when(F.col("code") == 3, "102").otherwise("012").alias("ttype"),
            (F.lit(n - 2) - F.coalesce("u", F.lit(0))).alias("s"),
        )
        .groupBy("ttype")
        .agg(F.sum("s").alias("cnt"))
        .collect()
    )
    pc.unpersist()
    for r in single_rows:
        counts[r["ttype"]] = counts.get(r["ttype"], 0) + int(r["cnt"])
    counts["003"] = n * (n - 1) * (n - 2) // 6 - sum(counts.values())

    return spark.createDataFrame(
        [(t, counts.get(t, 0)) for t in TRIAD_TYPES],
        "triad_type string, n_triads long",
    )
