"""Kleinberg 2-state burst detection (Kleinberg, KDD'02 "Bursty and
Hierarchical Structure in Streams", the batched/enumerating variant):
per item, model the per-bucket counts r_t out of bucket totals d_t as
a binomial whose rate is either the item's base rate p0 = R/D (state
0) or an elevated rate p1 = min(s*p0, 1-1e-9) (state 1, "burst");
charge gamma*ln(T) to ENTER the burst state (exit is free) and report
the buckets the minimum-cost state sequence spends in state 1. The
binomial coefficient ln C(d_t, r_t) is identical for both states at
each step, so it cancels from every path comparison and is dropped —
costs are -(r ln p + (d-r) ln(1-p)) exactly.

Decoding without an explicit backtrack: the optimal state at t is
argmin_q (fwd_q(t) + bwd_q(t)) where fwd is the Viterbi prefix cost
THROUGH t and bwd the optimal suffix cost AFTER t — both are
sequential folds, which makes them expressible as F.aggregate array
folds in Spark AND as recursive CTEs in DuckDB with bit-identical
IEEE arithmetic (same fold order, same ln/least sequence; ties break
to state 0 via strict <).

Spark shape: the dense time axis (length T) is arithmetic — bucket
epochs are exact multiples of the step, so index = (te - t0)/step with
no join against a calendar; bucket totals collapse to ONE T-row frame
carried as a 1-row broadcast array; per-item dense series are a
map_from_entries fill over sequence(0, T-1). The DP is O(T^2) per item
(array-append folds), so T is a BOUNDED analysis window (hours in a
month, days in a year), never the corpus axis — items scale out,
buckets don't. A localCheckpoint pins the prepared arrays so the
interpreted fold references materialized attributes instead of
re-deriving the fill per step (the CollapseProject re-evaluation trap
measured on winnow.py).

``min_count`` prunes items below a support floor BEFORE the dense
fill, so the items * T expansion covers only items worth modeling."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_STEPS = {"hour": 3600, "day": 86400}


def kleinberg_bursts(
    events: DataFrame,
    time_col: str = "ts",
    item_col: str = "item",
    bucket: str = "day",
    s: float = 2.0,
    gamma: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """(item, bucket_epoch, r, d): the buckets where the optimal
    Kleinberg state sequence is in the burst state, with the item's
    count r and the global total d for that bucket."""
    if bucket not in _STEPS:
        raise ValueError(f"bucket must be one of {sorted(_STEPS)}")
    if s <= 1.0:
        raise ValueError("s (burst rate multiplier) must be > 1")
    if gamma < 0.0:
        raise ValueError("gamma must be >= 0")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    step = _STEPS[bucket]
    ev = events.select(
        F.col(item_col).alias("item"),
        F.unix_timestamp(F.date_trunc(bucket, F.col(time_col))).cast("long").alias("te"),
    )
    ax = ev.agg(
        F.min("te").alias("t0"),
        F.count(F.lit(1)).alias("big_d"),
        (((F.max("te") - F.min("te")) / step).cast("int") + 1).alias("big_t"),
    )
    cells = ev.join(F.broadcast(ax)).withColumn(
        "i", ((F.col("te") - F.col("t0")) / step).cast("int")
    )
    dmap = (
        cells.groupBy("i")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.map_from_entries(F.collect_list(F.struct("i", "d"))).alias("dmap"))
    )
    items = (
        cells.groupBy("item")
        .agg(F.count(F.lit(1)).alias("big_r"))
        .where(F.col("big_r") >= min_count)
    )
    rmaps = (
        cells.join(items.select("item"), "item", "left_semi")
        .groupBy("item", "i")
        .agg(F.count(F.lit(1)).alias("r"))
        .groupBy("item")
        .agg(F.map_from_entries(F.collect_list(F.struct("i", "r"))).alias("rmap"))
    )
    fill = lambda m: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.col("big_t") - 1),
        lambda i: F.coalesce(F.element_at(m, i), F.lit(0)).cast("double"),
    )
    prepared = (
        rmaps.join(items, "item")
        .join(F.broadcast(dmap))
        .join(F.broadcast(ax))
        .select(
            "item",
            "t0",
            "big_t",
            # clamp keeps the degenerate "one item owns the stream"
            # input (p0 = 1 -> ln(1-p0) = -inf) well-defined: both
            # rates coincide and everything ties to state 0
            F.least(
                F.col("big_r").cast("double") / F.col("big_d"), F.lit(1.0 - 1e-9)
            ).alias("p0"),
            F.least(
                F.lit(float(s)) * F.col("big_r").cast("double") / F.col("big_d"),
                F.lit(1.0 - 1e-9),
            ).alias("p1"),
            (F.lit(float(gamma)) * F.log(F.col("big_t").cast("double"))).alias("trans"),
            fill(F.col("rmap")).alias("rarr"),
            fill(F.col("dmap")).alias("darr"),
        )
        .localCheckpoint(eager=False)
    )

    def _cost(which, i):  # -(r ln p + (d - r) ln(1 - p)) at 0-based step i
        p = F.col(which)
        r = F.element_at(F.col("rarr"), i + 1)
        d = F.element_at(F.col("darr"), i + 1)
        return -(r * F.log(p) + (d - r) * F.log(F.lit(1.0) - p))

    inf = F.lit(float("inf"))
    fwd = F.aggregate(
        F.sequence(F.lit(0), F.col("big_t") - 1),
        F.struct(
            F.lit(0.0).alias("c0"),
            inf.alias("c1"),
            F.array().cast("array<double>").alias("a0"),
            F.array().cast("array<double>").alias("a1"),
        ),
        lambda acc, i: F.struct(
            (F.least(acc["c0"], acc["c1"]) + _cost("p0", i)).alias("c0"),
            (F.least(acc["c1"], acc["c0"] + F.col("trans")) + _cost("p1", i)).alias("c1"),
            F.concat(
                acc["a0"], F.array(F.least(acc["c0"], acc["c1"]) + _cost("p0", i))
            ).alias("a0"),
            F.concat(
                acc["a1"],
                F.array(F.least(acc["c1"], acc["c0"] + F.col("trans")) + _cost("p1", i)),
            ).alias("a1"),
        ),
    )
    # suffix costs: b_q(T-1) = 0; b at j-1 folds in the step-j emission
    bwd = F.aggregate(
        F.when(F.col("big_t") >= 2, F.reverse(F.sequence(F.lit(1), F.col("big_t") - 1)))
        .otherwise(F.array().cast("array<int>")),
        F.struct(
            F.lit(0.0).alias("b0"),
            F.lit(0.0).alias("b1"),
            F.array(F.lit(0.0)).alias("a0"),
            F.array(F.lit(0.0)).alias("a1"),
        ),
        lambda acc, j: F.struct(
            F.least(
                _cost("p0", j) + acc["b0"], F.col("trans") + _cost("p1", j) + acc["b1"]
            ).alias("b0"),
            F.least(_cost("p1", j) + acc["b1"], _cost("p0", j) + acc["b0"]).alias("b1"),
            F.concat(
                F.array(
                    F.least(
                        _cost("p0", j) + acc["b0"],
                        F.col("trans") + _cost("p1", j) + acc["b1"],
                    )
                ),
                acc["a0"],
            ).alias("a0"),
            F.concat(
                F.array(F.least(_cost("p1", j) + acc["b1"], _cost("p0", j) + acc["b0"])),
                acc["a1"],
            ).alias("a1"),
        ),
    )
    scored = prepared.select(
        "item", "t0", "big_t", "rarr", "darr", fwd.alias("f"), bwd.alias("b")
    )
    burst_idx = F.filter(
        F.sequence(F.lit(0), F.col("big_t") - 1),
        lambda i: (
            F.element_at(F.col("f.a1"), i + 1) + F.element_at(F.col("b.a1"), i + 1)
        )
        < (F.element_at(F.col("f.a0"), i + 1) + F.element_at(F.col("b.a0"), i + 1)),
    )
    return scored.select("item", "t0", "rarr", "darr", F.explode(burst_idx).alias("i")).select(
        "item",
        (F.col("t0") + F.col("i").cast("long") * step).alias("bucket_epoch"),
        F.element_at(F.col("rarr"), F.col("i") + 1).cast("long").alias("r"),
        F.element_at(F.col("darr"), F.col("i") + 1).cast("long").alias("d"),
    )
