"""k-core: the maximal subgraph where every vertex has undirected degree
>= k — the standard graph-mining density filter (e.g. spam-farm and
community pre-filtering on web graphs).

Iterative peeling: drop vertices with degree < k, remove their incident
edges, recompute — to fixpoint (or a fixed round count, for the
driver-contract oracle which mirrors the rounds exactly). Each round is one
degree aggregate + two semi-joins on the shrinking edge set; the edge set
only ever shrinks, so wall-clock per round falls monotonically. Lineage
truncated per round via localCheckpoint, as in every other iterative
operator here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class KCoreResult:
    vertices: DataFrame  # (id: long, degree: long) — members of the k-core
    rounds: int


def k_core(edges: DataFrame, k: int, max_rounds: int = 1000) -> KCoreResult:
    """Vertices of the k-core of the undirected simple graph underlying
    (src, dst): self-loops dropped, parallel/reciprocal edges collapsed.
    ``max_rounds`` caps peeling (set it to the oracle's fixed round count
    for bit-exact cross-engine comparison; convergence is flagged by
    ``rounds < max_rounds``)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    und.count()

    rounds = 0
    prev_n = -1
    last_keep = None  # persisted frame of the n==0 early exit, if taken
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
    while rounds < max_rounds:
        keep = deg.filter(F.col("degree") >= k).persist()
        n = keep.count()
        if n == prev_n:
            keep.unpersist()
            break
        rounds += 1
        prev_n = n
        if n == 0:
            deg = keep
            last_keep = keep
            break
        ids = keep.select("id")
        new_und = (
            und.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
            .persist()
        )
        new_und.count()
        und.unpersist()
        und = new_und
        deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
        keep.unpersist()

    # checkpoint the (small) core before releasing the cached edge set —
    # no cached blocks outlive the call
    out = deg.filter(F.col("degree") >= k).localCheckpoint(eager=True)
    und.unpersist()
    if last_keep is not None:
        last_keep.unpersist()
    return KCoreResult(out, rounds)


@dataclass
class CoreDecompositionResult:
    assignments: DataFrame  # (id: long, coreness: long) — every vertex
    max_k: int              # the graph's degeneracy (largest non-empty core)
    rounds_per_k: list[int]  # peel rounds spent at each k level (index k-1)


def _core_decomposition_local(
    edge_rows: list[tuple[int, int]], max_rounds_per_k: int
) -> tuple[list[tuple[int, int]], int, list[int]]:
    """Progressive wave-peel on a collected undirected edge list, mirroring
    the distributed algorithm EXACTLY including rounds_per_k (all deg<k
    vertices removed simultaneously per wave — the per-level wave count is
    part of the operator contract, asserted against the SQL oracle's
    unroll depth). Driver-side FINISHER only — callers bound the input."""
    adj: dict[int, set[int]] = {}
    for s, d in edge_rows:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = set(adj)
    assigned: list[tuple[int, int]] = []
    rounds_per_k: list[int] = []
    k = 0
    while alive:
        k += 1
        rounds = 0
        while rounds < max_rounds_per_k:
            drop = {v for v in alive if len(adj[v] & alive) < k}
            if not drop:
                break
            rounds += 1
            alive -= drop
        rounds_per_k.append(rounds)
        # everything not yet assigned and no longer alive fell at THIS
        # level → coreness k-1 (same rule as the distributed fell_out)
        fell = set(adj) - alive - {v for v, _ in assigned}
        assigned.extend((v, k - 1) for v in fell)
    return sorted(assigned), k - 1 if k else 0, rounds_per_k


def core_decomposition(
    edges: DataFrame,
    max_rounds_per_k: int = 1000,
    local_finish_edges: int = 500_000,
) -> CoreDecompositionResult:
    """Full core decomposition: coreness(v) = max k such that v belongs to
    the k-core. Progressive peel — the (k+1)-core is a subgraph of the
    k-core, so each level peels the previous level's survivor subgraph
    rather than restarting from the full edge set: total work is
    O(sum over k of peel-rounds × |surviving E|), and the edge set only
    ever shrinks. Vertices dropped between the k-core and the (k+1)-core
    have coreness exactly k.

    ``rounds_per_k`` is surfaced so the driver query can assert the
    DuckDB oracle's fixed unroll depth covers the observed peel depth
    (same contract as the k-truss oracle). For a 100-TB web graph the
    degeneracy is O(sqrt(E)) worst case but tens-to-hundreds in practice;
    each level is the same shrinking-semi-join peel as ``k_core``. See
    ``core_decomposition_hindex`` for the O(iterations)-shuffle scale
    path (differential-tested equal).

    LOCAL FINISH: under ``local_finish_edges`` collected undirected rows
    the whole decomposition runs as a wave-peel on the driver (exact
    integers, identical rounds_per_k contract — the distributed peel's
    k_max × depth round count is pure barrier cost at that size).
    ``local_finish_edges=0`` forces the distributed path."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    und.count()

    spark = edges.sparkSession
    if local_finish_edges > 0:
        probe = und.take(local_finish_edges + 1)
        if len(probe) <= local_finish_edges:
            und.unpersist()
            pairs, max_k, rpk = _core_decomposition_local(
                [(r["src"], r["dst"]) for r in probe], max_rounds_per_k
            )
            out = (
                spark.createDataFrame(pairs, "id long, coreness long")
                if pairs
                else spark.createDataFrame([], "id long, coreness long")
            )
            return CoreDecompositionResult(out, max_k, rpk)
    # coreness assignments accumulate as small (id, coreness) frames.
    # The alive set is tracked EXPLICITLY (not derived from the surviving
    # edge set): a vertex whose last surviving neighbor is peeled has zero
    # edges left but still costs one more counted wave to drop — the wave
    # semantics of the local finisher and the SQL oracle's survivor-join
    # recursion (ADVICE r3: deriving members from `und` dropped it
    # implicitly, under-counting rounds_per_k by 1 at the boundary and
    # letting a too-shallow oracle unroll pass the q_coreness gate).
    assigned = spark.createDataFrame([], "id long, coreness long")
    alive = und.select(F.col("src").alias("id")).distinct().localCheckpoint(eager=True)
    if alive.isEmpty():
        # no effective edges (empty input or self-loops only): the local
        # finisher returns rounds_per_k=[] here — match it instead of
        # spinning one level that reports a spurious [0]
        und.unpersist()
        return CoreDecompositionResult(assigned, 0, [])
    rounds_per_k: list[int] = []
    k = 0
    while True:
        k += 1
        level_start = alive
        # peel current subgraph to its k-core: a wave drops every alive
        # vertex with fewer than k alive neighbors, INCLUDING degree-0
        # vertices that no longer appear in the edge set
        rounds = 0
        while rounds < max_rounds_per_k:
            deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
            keepers = deg.filter(F.col("degree") >= k).select("id")
            drop = alive.join(keepers, "id", "left_anti").persist()
            n_drop = drop.count()
            if n_drop == 0:
                drop.unpersist()
                break
            rounds += 1
            alive = alive.join(drop, "id", "left_anti").localCheckpoint(eager=True)
            ids = drop.select("id")
            new_und = (
                und.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .localCheckpoint(eager=False)
                .persist()
            )
            new_und.count()
            und.unpersist()
            drop.unpersist()
            und = new_und
        rounds_per_k.append(rounds)
        # vertices in the (k-1)-core but not the k-core have coreness k-1
        fell_out = level_start.join(alive, "id", "left_anti").select(
            "id", F.lit(k - 1).cast("long").alias("coreness")
        )
        assigned = assigned.union(fell_out).localCheckpoint(eager=True)
        if alive.isEmpty():
            break
    und.unpersist()
    return CoreDecompositionResult(assigned, k - 1, rounds_per_k)


def core_decomposition_hindex(edges: DataFrame, max_iter: int = 1000) -> CoreDecompositionResult:
    """Coreness via distributed h-index iteration (Montresor, De Pellegrini
    & Miorandi, "Distributed k-core decomposition", IEEE TPDS 2013; also
    Lü et al. 2016 "The H-index of a network node"): start every vertex at
    c(v) = deg(v) and repeatedly set c(v) to the h-index of its neighbors'
    current values (the largest h such that >= h neighbors have c >= h).
    The sequence is monotone non-increasing and converges to the exact
    coreness. Each iteration is ONE shuffle (edge ⋈ ranks + a windowed
    per-vertex aggregate) regardless of the graph's degeneracy — the scale
    path when the progressive peel's k_max × peel-depth round count would
    dominate. h-index of a desc-sorted neighbor list v_1 >= v_2 >= ... is
    max_i min(i, v_i), computed with a window rank, no per-vertex array
    materialization (hub-degree rows never collect into one buffer)."""
    from pyspark.sql import Window

    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    und.count()

    cur = (
        und.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("coreness"))
        .persist()
    )
    cur.count()
    it = 0
    while it < max_iter:
        it += 1
        nb = und.join(
            cur.select(F.col("id").alias("dst"), F.col("coreness").alias("c_nb")), "dst"
        ).select(F.col("src").alias("id"), "c_nb")
        w = Window.partitionBy("id").orderBy(F.desc("c_nb"))
        nxt = (
            nb.select("id", "c_nb", F.row_number().over(w).alias("rn"))
            .groupBy("id")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("c_nb"))).alias("coreness"))
            .localCheckpoint(eager=False)
            .persist()
        )
        changed = (
            nxt.join(cur.withColumnRenamed("coreness", "prev"), "id")
            .filter(F.col("coreness") != F.col("prev"))
            .count()
        )
        cur.unpersist()
        cur = nxt
        if changed == 0:
            break
    out = cur.localCheckpoint(eager=True)
    max_k = out.agg(F.coalesce(F.max("coreness"), F.lit(0))).first()[0]
    cur.unpersist()
    und.unpersist()
    return CoreDecompositionResult(out, int(max_k), [it])


@dataclass
class OnionResult:
    assignments: DataFrame   # (id: long, coreness: long, layer: long)
    max_k: int
    n_layers: int
    rounds_per_k: list[int]  # identical contract to CoreDecompositionResult


def _onion_local(
    edge_rows: list[tuple[int, int]], max_rounds_per_k: int
) -> tuple[list[tuple[int, int, int]], int, int, list[int]]:
    """Driver-side onion finisher: the :func:`_core_decomposition_local`
    wave peel with a global nonempty-wave counter — the wave a vertex is
    removed in IS its onion layer (Hebert-Dufresne, Grochow & Allard,
    Sci Rep 2016)."""
    adj: dict[int, set[int]] = {}
    for s, d in edge_rows:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = set(adj)
    assigned: list[tuple[int, int, int]] = []
    rounds_per_k: list[int] = []
    layer = 0
    k = 0
    while alive:
        k += 1
        rounds = 0
        while rounds < max_rounds_per_k:
            drop = {v for v in alive if len(adj[v] & alive) < k}
            if not drop:
                break
            rounds += 1
            layer += 1
            assigned.extend((v, k - 1, layer) for v in drop)
            alive -= drop
        rounds_per_k.append(rounds)
    return sorted(assigned), k - 1 if k else 0, layer, rounds_per_k


def onion_decomposition(
    edges: DataFrame,
    max_rounds_per_k: int = 1000,
    local_finish_edges: int = 500_000,
) -> OnionResult:
    """Onion decomposition (Hebert-Dufresne, Grochow & Allard, Sci Rep
    6:31708, 2016): the k-core peel refined by WHEN a vertex falls — every
    nonempty peel wave is one onion layer, so (coreness, layer) separates
    a core's crust from its center and flags topological anomalies
    (e.g. link farms peel in few fat layers; organic webs in many thin
    ones). Exactly :func:`core_decomposition`'s progressive wave peel —
    same wave semantics, same rounds_per_k contract asserted against the
    SQL oracle's unroll — with each wave's drop set labeled by a global
    nonempty-wave counter instead of being folded into the level batch.
    coreness(v) = k-1 for a vertex dropped while peeling toward the
    k-core; layer(v) = 1-based index of its wave.

    Scale shape is the peel's: one degree aggregate + two anti-join
    prunes per wave over a strictly shrinking edge set; the per-wave
    assignment frames are V rows total across the run. LOCAL FINISH under
    ``local_finish_edges`` collected undirected rows (``=0`` forces the
    distributed path; both differential-tested equal and both projecting
    to core_decomposition's output when the layer column is dropped)."""
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    und.count()

    spark = edges.sparkSession
    if local_finish_edges > 0:
        probe = und.take(local_finish_edges + 1)
        if len(probe) <= local_finish_edges:
            und.unpersist()
            triples, max_k, n_layers, rpk = _onion_local(
                [(r["src"], r["dst"]) for r in probe], max_rounds_per_k
            )
            out = (
                spark.createDataFrame(triples, "id long, coreness long, layer long")
                if triples
                else spark.createDataFrame([], "id long, coreness long, layer long")
            )
            return OnionResult(out, max_k, n_layers, rpk)

    assigned = spark.createDataFrame([], "id long, coreness long, layer long")
    alive = und.select(F.col("src").alias("id")).distinct().localCheckpoint(eager=True)
    if alive.isEmpty():
        und.unpersist()
        return OnionResult(assigned, 0, 0, [])
    rounds_per_k: list[int] = []
    layer = 0
    k = 0
    while True:
        k += 1
        rounds = 0
        while rounds < max_rounds_per_k:
            deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
            keepers = deg.filter(F.col("degree") >= k).select("id")
            drop = alive.join(keepers, "id", "left_anti").persist()
            n_drop = drop.count()
            if n_drop == 0:
                drop.unpersist()
                break
            rounds += 1
            layer += 1
            assigned = assigned.union(
                drop.select(
                    "id",
                    F.lit(k - 1).cast("long").alias("coreness"),
                    F.lit(layer).cast("long").alias("layer"),
                )
            ).localCheckpoint(eager=True)
            alive = alive.join(drop, "id", "left_anti").localCheckpoint(eager=True)
            ids = drop.select("id")
            new_und = (
                und.join(ids.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(ids.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .localCheckpoint(eager=False)
                .persist()
            )
            new_und.count()
            und.unpersist()
            drop.unpersist()
            und = new_und
        rounds_per_k.append(rounds)
        if alive.isEmpty():
            break
    und.unpersist()
    return OnionResult(assigned, k - 1, layer, rounds_per_k)
