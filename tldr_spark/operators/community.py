"""Community validation & contraction over a vertex partition (labels from
label propagation, connected components, or any (id, label) frame):

  community_stats       per-community size / internal edges / cut edges /
                        volume / conductance — the standard quality check
                        before trusting communities downstream
  contract_communities  the Louvain phase-2 supergraph: one vertex per
                        community, weighted edges between communities —
                        composes labelprop → contract → pagerank for
                        multilevel analysis at a fraction of the scale

Modularity itself lives in operators/stats.py:partition_modularity.

Shape: the assignment table joins onto the edge list twice (broadcast-able
when communities fit in memory, shuffle-join otherwise) and everything else
is per-community aggregates — degree mass collapses community-side, so no
per-pair or all-pairs term exists and the dataflow survives web scale.
Generalizes the reference's single-machine ranking pipeline
(/root/reference/tldr.go) to partition-aware analytics it has no analog for.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


def _labeled_undirected(edges: DataFrame, assignments: DataFrame):
    """Distinct undirected simple edges (a<b) with both endpoint labels."""
    label_col = [c for c in assignments.columns if c != "id"][0]
    asg = assignments.select(F.col("id").cast("long"), F.col(label_col).alias("_c"))
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .join(asg.withColumnRenamed("id", "a").withColumnRenamed("_c", "ca"), "a")
        .join(asg.withColumnRenamed("id", "b").withColumnRenamed("_c", "cb"), "b")
    )
    return e, asg


def community_stats(edges: DataFrame, assignments: DataFrame) -> DataFrame:
    """(community, n_vertices, internal_edges, cut_edges, volume,
    conductance) per community, over the undirected simple graph.

    volume = sum of member degrees = 2*internal_edges + cut_edges;
    conductance = cut / min(volume, 2m - volume) — the probability a
    one-step walk from the community leaves it (Kannan-Vempala-Vetta);
    0.0 for communities with no cut (including whole-graph and
    edge-less ones, where the min is 0).
    """
    e, asg = _labeled_undirected(edges, assignments)
    e = e.persist()
    m = e.count()
    n_v = asg.groupBy(F.col("_c").alias("community")).agg(
        F.count(F.lit(1)).alias("n_vertices")
    )
    internal = (
        e.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    cut = (
        e.filter(F.col("ca") != F.col("cb"))
        .select(F.explode(F.array("ca", "cb")).alias("community"))
        .groupBy("community")
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    out = (
        n_v.join(internal, "community", "left")
        .join(cut, "community", "left")
        .select(
            "community",
            "n_vertices",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
        )
        .withColumn(
            "volume", 2 * F.col("internal_edges") + F.col("cut_edges")
        )
        .withColumn(
            "conductance",
            F.when(F.col("cut_edges") == 0, F.lit(0.0)).otherwise(
                F.col("cut_edges")
                / F.least(F.col("volume"), F.lit(2 * m) - F.col("volume"))
            ),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    return out


@dataclass
class ContractResult:
    nodes: DataFrame  # (community, n_vertices)
    edges: DataFrame  # (src, dst, weight) — directed supergraph, self-loops = intra


def contract_communities(
    edges: DataFrame,
    assignments: DataFrame,
    weight_col: str | None = None,
) -> ContractResult:
    """Louvain phase-2 contraction: map each vertex to its community and
    re-aggregate the DIRECTED edge list onto community ids; intra-community
    mass is kept as weighted self-loops (required for modularity-preserving
    multilevel passes).

    ``weight_col=None`` (default, the driver-oracled behavior): supergraph
    edge weight = COUNT of underlying distinct simple directed edges
    (self-loops of the input dropped). With ``weight_col`` set: weight =
    SUM of the input weights over ALL directed edges including input
    self-loops — the modularity-preserving mode the multilevel
    :func:`louvain` pass needs (a level-2 input graph already carries its
    intra-community mass as self-loops, which must survive contraction).
    """
    label_col = [c for c in assignments.columns if c != "id"][0]
    asg = assignments.select(F.col("id").cast("long"), F.col(label_col).alias("_c"))
    nodes = asg.groupBy(F.col("_c").alias("community")).agg(
        F.count(F.lit(1)).alias("n_vertices")
    )
    if weight_col is None:
        base = (
            edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("w", F.lit(1.0))
        )
    else:
        w = (
            F.col(weight_col).cast("double")
            if weight_col in edges.columns
            else F.lit(1.0)
        )
        base = edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long"), w.alias("w")
        )
    sedges = (
        base
        .join(asg.withColumnRenamed("id", "src").withColumnRenamed("_c", "cs"), "src")
        .join(asg.withColumnRenamed("id", "dst").withColumnRenamed("_c", "cd"), "dst")
        .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .agg(
            (
                F.count(F.lit(1)) if weight_col is None else F.sum("w")
            ).alias("weight")
        )
    )
    return ContractResult(nodes=nodes, edges=sedges)


# ---------------------------------------------------------------------------
# Louvain (Blondel, Guillaume, Lambiotte, Lefebvre 2008) — phase-1 local
# moves + multilevel composition with contract_communities
# ---------------------------------------------------------------------------

@dataclass
class LouvainMoveResult:
    labels: DataFrame  # (id: long, label: long)
    rounds: int
    moved_last_round: int


def _sym_weighted(edges: DataFrame, weight_col: str | None):
    """(symw, loops): symw = (u, v, w) undirected weighted adjacency with
    BOTH orientations of every directed simple edge (weights summed per
    ordered pair), loops = (u, lw) self-loop weight per vertex. Louvain
    bookkeeping reads m2 = 2m = sum(symw.w) + 2*sum(lw) and
    k_u = sum_v symw(u,·) + 2*lw(u) — self-loops ride with their vertex
    through every move, so they enter the degree mass but cancel out of
    every gain comparison and never need to appear in the Σ_in table."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col and weight_col in edges.columns
        else F.lit(1.0)
    )
    base = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"), w.alias("w")
    )
    simple = base.filter(F.col("src") != F.col("dst"))
    symw = (
        simple.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .union(simple.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w"))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    loops = (
        base.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("u"))
        .agg(F.sum("w").alias("lw"))
    )
    return symw, loops


def louvain_move_pass(
    edges: DataFrame,
    assignments: DataFrame | None = None,
    max_rounds: int = 10,
    weight_col: str | None = "weight",
) -> LouvainMoveResult:
    """Louvain PHASE-1: synchronous modularity-gain local moves over the
    undirected weighted reading of the edge list, to fixpoint or
    ``max_rounds``.

    Each round every vertex i scores every candidate community c among its
    neighbor communities plus its own:

        score(i, c) = 2m·Σ_in(i, c) − k_i·(Σ_tot(c) − [c = l_i]·k_i)

    — the standard ΔQ numerator scaled by the positive constant 2m², so
    comparisons are exact when edge weights are integral (every term is an
    integer-valued double, bit-identical across engines regardless of sum
    order — the property the DuckDB oracle mirror depends on). The vertex
    moves to the arg-max community, staying put on ties (strict-gain rule:
    prefer own label, then the smallest community id).

    Moves apply synchronously — but only HALF the vertices are eligible
    per round, alternating by id parity (round r moves pmod(id, 2) ==
    r % 2). Fully synchronous gain moves oscillate on the most basic
    inputs (two vertices that each score best in the other's community
    swap labels forever); the alternating two-coloring is the standard
    distributed-Louvain guard (a deterministic special case of the
    graph-coloring schedule in parallel Louvain literature) and keeps the
    rule expressible in the unrolled SQL oracle. A round counts one
    half-sweep; the loop stops when a FULL cycle (two consecutive
    half-rounds) moved nothing.

    Scale shape: per round one E-sized join of the label table onto the
    symmetrized adjacency + a (vertex, community) aggregate, one V-sized
    Σ_tot aggregate, and one arg-max groupBy — same dataflow class as a
    PageRank iteration (no all-pairs term; hub skew absorbed by map-side
    partial aggregation on the (u, label) composite key).
    """
    spark = edges.sparkSession
    symw, loops = _sym_weighted(edges, weight_col)
    symw = symw.persist()
    deg = (
        symw.groupBy(F.col("u").alias("id"))
        .agg(F.sum("w").alias("k0"))
        .join(loops.withColumnRenamed("u", "id"), "id", "left")
        .select("id", (F.col("k0") + 2.0 * F.coalesce("lw", F.lit(0.0))).alias("k"))
        .persist()
    )
    row = symw.agg(
        F.coalesce(F.sum("w"), F.lit(0.0)).alias("sw")
    ).crossJoin(loops.agg(F.coalesce(F.sum("lw"), F.lit(0.0)).alias("sl"))).collect()
    m2 = float(row[0]["sw"]) + 2.0 * float(row[0]["sl"])
    if m2 <= 0.0:
        empty = spark.createDataFrame([], "id long, label long")
        symw.unpersist()
        deg.unpersist()
        return LouvainMoveResult(empty, 0, 0)

    if assignments is None:
        state = deg.select("id", F.col("id").alias("label"))
    else:
        lcol = [c for c in assignments.columns if c != "id"][0]
        state = deg.select("id").join(
            assignments.select(F.col("id").cast("long"), F.col(lcol).alias("label")),
            "id",
        )
    state = state.persist()
    state.count()

    rounds = 0
    moved = 0
    prev_moved = -1  # sentinel: no completed half-round yet
    while rounds < max_rounds:
        rounds += 1
        tot = state.join(deg, "id").groupBy("label").agg(F.sum("k").alias("tot"))
        cand = (
            symw.join(state.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"), "label")
            .agg(F.sum("w").alias("w_in"))
            .select("id", F.col("label").alias("c"), "w_in")
        )
        # ensure the vertex's own community is always a candidate (w_in 0
        # if no neighbor shares it) — merged in ONE aggregate, no EXISTS
        allc = (
            cand.union(
                state.select("id", F.col("label").alias("c"), F.lit(0.0).alias("w_in"))
            )
            .groupBy("id", "c")
            .agg(F.sum("w_in").alias("w_in"))
        )
        scored = (
            allc.join(state, "id")
            .join(deg, "id")
            .join(tot.withColumnRenamed("label", "c"), "c")
            .select(
                "id",
                "label",
                "c",
                (
                    F.lit(m2) * F.col("w_in")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(F.col("c") == F.col("label"), F.col("k")).otherwise(0.0)
                    )
                ).alias("sc"),
            )
        )
        # arg-max by (score, own-flag, -c): strictly better community wins,
        # ties keep the current label, remaining ties take the smallest id
        pick = scored.groupBy("id").agg(
            F.max(
                F.struct(
                    F.col("sc"),
                    (F.col("c") == F.col("label")).cast("int").alias("own"),
                    (-F.col("c")).alias("negc"),
                )
            ).alias("best")
        )
        mover = F.pmod(F.col("id"), F.lit(2)) == F.lit(rounds % 2)
        new_state = (
            pick.join(state, "id")
            .select(
                "id",
                F.when(mover, -F.col("best.negc")).otherwise(F.col("label")).alias(
                    "new_label"
                ),
                F.col("label").alias("old_label"),
            )
            .select(
                "id",
                F.col("new_label").alias("label"),
                (F.col("new_label") != F.col("old_label")).alias("chg"),
            )
            .localCheckpoint(eager=False)
            .persist()
        )
        moved = new_state.filter("chg").count()
        state.unpersist()
        state = new_state.drop("chg")
        if moved == 0 and prev_moved == 0:
            break  # a full parity cycle moved nothing — fixpoint
        prev_moved = moved

    out = state
    symw.unpersist()
    deg.unpersist()
    return LouvainMoveResult(out, rounds, moved)


@dataclass
class LouvainResult:
    labels: DataFrame  # (id: long, community: long) over original vertex ids
    levels: int


def louvain(
    edges: DataFrame,
    max_levels: int = 5,
    max_rounds_per_level: int = 20,
    weight_col: str | None = "weight",
) -> LouvainResult:
    """Multilevel Louvain: phase-1 local moves (:func:`louvain_move_pass`)
    then phase-2 contraction (:func:`contract_communities` with weight
    summing) onto a supergraph with intra-community self-loops, repeated
    while the move pass still merges communities. The returned labels map
    ORIGINAL vertex ids to their final community, normalized to the min
    original member id (deterministic, level-count-free). Each level's
    graph shrinks by the phase-1 merge factor, so the expensive early
    levels run over E and the later ones over community-count-sized
    tables — the property that makes Louvain viable at web scale.
    """
    spark = edges.sparkSession
    g = edges
    wc = weight_col
    mapping: DataFrame | None = None  # (orig_id, comm)
    levels = 0
    while levels < max_levels:
        res = louvain_move_pass(g, max_rounds=max_rounds_per_level, weight_col=wc)
        labels = res.labels.persist()
        n_vertices = labels.count()
        if n_vertices == 0:
            labels.unpersist()
            break
        n_comms = labels.select("label").distinct().count()
        levels += 1
        if mapping is None:
            mapping = labels.select(
                F.col("id").alias("orig_id"), F.col("label").alias("comm")
            ).localCheckpoint(eager=True)
        else:
            mapping = (
                mapping.join(labels.withColumnRenamed("id", "comm"), "comm")
                .select("orig_id", F.col("label").alias("comm"))
                .localCheckpoint(eager=True)
            )
        if n_comms == n_vertices:
            labels.unpersist()
            break  # nothing merged — fixpoint
        contracted = contract_communities(g, labels.select("id", "label"), weight_col=wc)
        g = contracted.edges
        wc = "weight"
        labels.unpersist()

    if mapping is None:
        return LouvainResult(
            spark.createDataFrame([], "id long, community long"), 0
        )
    mins = mapping.groupBy("comm").agg(F.min("orig_id").alias("community"))
    out = (
        mapping.join(mins, "comm")
        .select(F.col("orig_id").alias("id"), "community")
        .localCheckpoint(eager=True)
    )
    return LouvainResult(out, levels)


def refine_connected(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Leiden refinement step (Traag, Waltman & van Eck, Sci Rep 2019, the
    connectivity half): split every community into its CONNECTED parts
    within the community-induced subgraph. Input ``labels`` = (id, label);
    output (id, label) with each part relabeled to its minimum member id
    (globally unique — vertex ids are). Vertices with no intra-community
    edge become singletons. One edge semi-join to the intra-community
    subgraph + one CC pass; the CC machinery is the star-contraction +
    bounded-finisher path every component query uses."""
    from tldr_spark.operators.components import connected_components

    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    intra = (
        e.join(lab.withColumnsRenamed({"id": "src", "label": "ls"}), "src")
        .join(lab.withColumnsRenamed({"id": "dst", "label": "ld"}), "dst")
        .filter(F.col("ls") == F.col("ld"))
        .select("src", "dst")
    )
    cc = connected_components(intra).assignments  # (id, component=min member)
    return (
        lab.join(cc, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("label"))
        .localCheckpoint(eager=True)
    )


def leiden(
    edges: DataFrame,
    max_levels: int = 5,
    max_rounds_per_level: int = 20,
    weight_col: str | None = "weight",
) -> LouvainResult:
    """Multilevel community detection with the Leiden CONNECTIVITY
    refinement (Traag et al. 2019): each level runs the Louvain local-move
    pass, then :func:`refine_connected` splits every community into its
    connected parts BEFORE contraction — so every supernode is internally
    connected at every level and, by induction (super-edges are real
    edges), every final community induces a connected subgraph of the
    original graph. That is the headline defect Leiden fixes in Louvain
    (which can emit internally disconnected communities); the paper's
    additional randomized well-connectedness refinement is deliberately
    not implemented — this engine is deterministic end to end.

    Same level-shrink scale shape as :func:`louvain`; the refinement adds
    one intra-community CC pass per level (cheap: the intra subgraph is a
    vanishing fraction of E after the first level)."""
    spark = edges.sparkSession
    g = edges
    wc = weight_col
    mapping: DataFrame | None = None
    levels = 0
    while levels < max_levels:
        res = louvain_move_pass(g, max_rounds=max_rounds_per_level, weight_col=wc)
        moved = res.labels
        labels = refine_connected(g, moved).persist()
        n_vertices = labels.count()
        if n_vertices == 0:
            labels.unpersist()
            break
        n_comms = labels.select("label").distinct().count()
        levels += 1
        if mapping is None:
            mapping = labels.select(
                F.col("id").alias("orig_id"), F.col("label").alias("comm")
            ).localCheckpoint(eager=True)
        else:
            mapping = (
                mapping.join(labels.withColumnRenamed("id", "comm"), "comm")
                .select("orig_id", F.col("label").alias("comm"))
                .localCheckpoint(eager=True)
            )
        if n_comms == n_vertices:
            labels.unpersist()
            break
        contracted = contract_communities(g, labels.select("id", "label"), weight_col=wc)
        g = contracted.edges
        wc = "weight"
        labels.unpersist()

    if mapping is None:
        return LouvainResult(spark.createDataFrame([], "id long, community long"), 0)
    mins = mapping.groupBy("comm").agg(F.min("orig_id").alias("community"))
    out = (
        mapping.join(mins, "comm")
        .select(F.col("orig_id").alias("id"), "community")
        .localCheckpoint(eager=True)
    )
    return LouvainResult(out, levels)
