"""Forward-push personalized PageRank — integer-exact local diffusion.

The Andersen-Chung-Lang (FOCS'06) local push, the seed-expansion
primitive behind local community detection and fast approximate PPR:
mass starts as RESIDUAL on the seed set; any vertex holding more
residual than a per-degree threshold pushes — a quarter of its residual
converts to settled PageRank mass, the rest spreads uniformly to its
out-neighbors. Unlike the power-iteration PPR (operators/pagerank.py),
work is proportional to the TOUCHED neighborhood, not the graph: only
vertices above threshold ever join a round.

INTEGER-EXACT is the design: all mass lives in integer units of
2^-40 of the total (``SCALE``), conversion is ``r div 4`` (α = 1/4) and
spreading is floor division by out-degree with the remainder RETAINED
as residual — so mass is conserved exactly (gain + d·q + leftover = r),
every engine computes bit-identical states (no floating-point threshold
races near the push boundary, the classic cross-engine divergence), and
each active push converts ≥ 2^14 units, bounding total rounds. Dangling
vertices are never active (their residual has nowhere to spread); their
trapped residual is reported, not hidden.

Per-round shape at scale: ONE equi-join of the active frame (usually a
tiny fraction of V) against the out-edge table + one partial-aggregated
groupBy(dst) + a V-row merge — the frontier-proportional cost that makes
push the right tool when seeds are few and the graph is huge.

Reference parity note: the reference (didasy/tldr) has no local-push
operator; this adds the second canonical PPR algorithm next to the
§2.7 power-iteration family.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

SCALE = 1 << 40       # total seed mass, integer units
THRESHOLD = 1 << 16   # push while r(v) > THRESHOLD * outdeg(v)


@dataclass
class PushResult:
    mass: DataFrame  # (id, p_units, r_units) — rows where either is > 0
    rounds: int
    converged: bool  # True iff no pushable vertex remained


def ppr_push(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int | None = None,
    max_rounds: int = 200,
    threshold: int = THRESHOLD,
) -> PushResult:
    """Forward-push PPR over the simple digraph of ``edges`` from the
    uniform seed distribution. With ``rounds`` set, runs EXACTLY that
    many synchronous push rounds (the oracle-matched mode, which reports
    ``converged=False`` — it never tests the frontier); otherwise pushes
    until no vertex exceeds its threshold (gated by ``max_rounds``)."""
    sd = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    deg = sd.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
        "src", "id"
    )
    verts = (
        sd.select(F.col("src").alias("id"))
        .union(sd.select("dst"))
        .distinct()
        .join(deg, "id", "left")
        .select("id", F.coalesce("d", F.lit(0)).alias("d"))
    )
    # count only seeds that exist in the graph — outsiders must not
    # dilute the per-seed mass SCALE // n
    sl = (
        seeds.select(F.col("id").cast("long"))
        .distinct()
        .join(verts.select("id"), "id", "left_semi")
        .persist()
    )
    n_seeds = sl.count()
    if n_seeds == 0:
        raise ValueError("ppr_push needs at least one seed present in the graph")
    state = (
        verts.join(sl.withColumn("seeded", F.lit(True)), "id", "left")
        .select(
            "id",
            "d",
            F.lit(0).cast("long").alias("p"),
            F.when(F.col("seeded"), F.lit(SCALE // n_seeds).cast("long"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    done = 0
    converged = False
    n_rounds = rounds if rounds is not None else max_rounds
    while done < n_rounds:
        active = state.filter(
            (F.col("r") > threshold * F.col("d")) & (F.col("d") > 0)
        ).select(
            "id",
            "d",
            "r",
            F.expr("r div 4").alias("gain"),
        )
        if rounds is None and active.isEmpty():
            converged = True
            break
        done += 1
        moved = active.select(
            "id",
            "gain",
            F.expr("(r - gain) div d").alias("q"),
            (F.col("r") - F.col("gain") - F.expr("(r - gain) div d") * F.col("d")).alias(
                "leftover"
            ),
        )
        incoming = (
            moved.select(F.col("id").alias("src"), "q")
            .join(sd, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("q").alias("inc"))
        )
        upd = moved.select("id", "gain", "leftover")
        state = (
            state.join(upd, "id", "left")
            .join(incoming, "id", "left")
            .select(
                "id",
                "d",
                (F.col("p") + F.coalesce("gain", F.lit(0))).alias("p"),
                (
                    F.coalesce("leftover", F.col("r"))
                    + F.coalesce("inc", F.lit(0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        if rounds is None:
            raise RuntimeError(f"ppr_push did not converge in {max_rounds} rounds")
    sd.unpersist()
    sl.unpersist()
    return PushResult(
        state.filter((F.col("p") > 0) | (F.col("r") > 0)).select(
            "id", F.col("p").alias("p_units"), F.col("r").alias("r_units")
        ),
        done,
        converged,
    )


def ppr_sweep_cut(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 8,
    max_prefix: int = 1000,
) -> DataFrame:
    """Local community detection by PPR sweep cut — the second half of
    Andersen-Chung-Lang (FOCS'06): order the push's settled mass by the
    degree-normalized score p(v)/deg(v) and report, for every prefix S_j
    of that order, its volume, cut, and conductance
    phi(S_j) = cut / min(vol(S_j), vol(G) - vol(S_j)). The minimum of
    the curve is the seed's local community.

    One row per sweep position j (1-based):
      (sweep_pos, vertex, vol, cut, conductance)

    Cross-engine exactness end to end: the push state is integer units,
    the sweep ORDER key is the integer (p_units * 2^20) div deg_und
    (ties by id), and cut/vol are exact integers via the identity
    cut(S_j) = vol(S_j) - 2 * edges_inside(S_j) with edges_inside a
    cumulative count over each edge's max endpoint rank. Only the final
    conductance ratio is a double (one division of exact ints).

    The sweep is capped at ``max_prefix`` touched vertices (the ACL
    sweep only ever scans the support of the push, which the push's
    threshold bounds; the cap makes the two window cumulative sums
    single-partition-safe at any scale — same bounded-driver-work
    contract as the IVF training sample). Degrees and conductance are
    over the UNDIRECTED simple graph."""
    from pyspark.sql import Window

    res = ppr_push(edges, seeds, rounds=rounds)
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .persist()
    )
    und.count()
    du = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("du"))
    )
    scored = (
        res.mass.filter(F.col("p_units") > 0)
        .join(du, "id")
        .select(
            "id",
            "du",
            F.expr("(p_units * 1048576) div du").alias("score"),
        )
    )
    w_all = Window.orderBy(F.desc("score"), F.asc("id"))
    sw = (
        scored.withColumn("sweep_pos", F.row_number().over(w_all))
        .filter(F.col("sweep_pos") <= max_prefix)
        .localCheckpoint(eager=True)  # <= max_prefix rows from here on
    )
    w_cum = Window.orderBy("sweep_pos").rowsBetween(Window.unboundedPreceding, 0)
    volc = sw.withColumn("vol", F.sum("du").over(w_cum))
    ra = sw.select(F.col("id").alias("a"), F.col("sweep_pos").alias("ja"))
    rb = sw.select(F.col("id").alias("b"), F.col("sweep_pos").alias("jb"))
    inside = (
        und.join(ra, "a")
        .join(rb, "b")
        .select(F.greatest("ja", "jb").alias("mr"))
        .groupBy("mr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vol_total = und.count() * 2
    out = (
        volc.join(inside, volc["sweep_pos"] == inside["mr"], "left")
        .select(
            "sweep_pos",
            F.col("id").alias("vertex"),
            "vol",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .withColumn("inside2", F.sum(F.col("c") * 2).over(w_cum))
        .select(
            "sweep_pos",
            "vertex",
            F.col("vol").cast("long").alias("vol"),
            (F.col("vol") - F.col("inside2")).cast("long").alias("cut"),
            F.when(
                F.least(F.col("vol"), F.lit(vol_total) - F.col("vol")) > 0,
                (F.col("vol") - F.col("inside2")).cast("double")
                / F.least(F.col("vol"), F.lit(vol_total) - F.col("vol")),
            )
            .otherwise(F.lit(1.0))  # full-volume prefix: phi undefined, pin to
            .alias("conductance"),  # the max so a sweep argmin never picks it
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    return out
