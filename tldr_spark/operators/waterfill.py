"""Max-min-fair (water-filling) budget allocation across groups — the
"cap every source at c chars such that the kept corpus hits the token
budget" primitive a curation pipeline runs before sampling: dominant
sources are clipped, small sources keep everything, and the cap is the
LARGEST integer c with sum_i min(n_i, c) <= budget.

Exact integer arithmetic end-to-end (sizes, prefix sums, the gated
truncating division), so the result is bit-identical cross-engine — no
float water level. Shape: one (group) sum shuffle to m = #groups rows,
one m-row sorted window for prefix sums, a 1-row broadcast back onto the
group frame. The window is global-sort over GROUPS, not rows — fine for
m up to ~10^7 hosts/sources; beyond that swap in the two-pass
range-partitioned prefix sum.

Derivation: with sizes sorted ascending n_1..n_m (n_0 = 0) and prefix
sums p_j, S(c) = p_{j-1} + (m-j+1)*c for c in segment [n_{j-1}, n_j).
Per segment the max feasible integer cap is (B - p_{j-1}) div (m-j+1),
gated on the INTEGER feasibility test B - p_{j-1} >= (m-j+1)*n_{j-1}
(so division operands stay non-negative, where truncating div == floor
in both Spark `div` and DuckDB `//`), clipped at n_j - 1. Because S is
nondecreasing, the max over all segment candidates is the global cap;
infeasible later segments never win and empty tie segments clip below
the true cap. B >= p_m (budget covers everything) short-circuits to
cap = n_m, alloc = n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def waterfill_allocation(
    df: DataFrame,
    group_col: str,
    size_col: str,
    budget: int | None = None,
    budget_frac: tuple[int, int] | None = None,
) -> DataFrame:
    """(group, n, alloc, cap): n = sum(size) per group, cap = the max-min
    fair water level, alloc = least(n, cap). Exactly one of ``budget``
    (absolute integer) or ``budget_frac`` ((num, den) of the grand total,
    evaluated as num*tot div den in int64) must be given. Negative-size
    rows raise upstream semantics questions, so they raise here."""
    if (budget is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget= or budget_frac=")
    if budget is not None and budget < 0:
        raise ValueError("budget must be >= 0")
    if budget_frac is not None and (budget_frac[0] < 0 or budget_frac[1] <= 0):
        raise ValueError("budget_frac must be (num>=0, den>0)")

    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(F.col(size_col).cast("long")).alias("n")
    )
    tot = g.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("m"),
        F.coalesce(F.min("n"), F.lit(0)).cast("long").alias("n_min"),
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("n_max"),
    )
    if budget is not None:
        tot = tot.withColumn("budget", F.lit(int(budget)).cast("long"))
    else:
        num, den = budget_frac
        tot = tot.withColumn(
            "budget", F.expr(f"(tot * CAST({int(num)} AS BIGINT)) div {int(den)}")
        )

    w = Window.orderBy("n", "grp")
    s = (
        g.withColumn("j", F.row_number().over(w))
        .withColumn("p", F.sum("n").over(w))
        .withColumn("n_prev", F.coalesce(F.lag("n").over(w), F.lit(0)))
        .join(F.broadcast(tot))
    )
    # segment [n_prev, n): feasible iff B - p_prev >= cnt * n_prev (ints)
    cnt = F.col("m") - F.col("j") + 1
    rem = F.col("budget") - (F.col("p") - F.col("n"))
    cand = F.when(
        rem >= cnt * F.col("n_prev"),
        F.least(F.expr("(budget - (p - n)) div (m - j + 1)"), F.col("n") - 1),
    )
    cap_f = (
        s.agg(F.max(cand).alias("seg_cap"))
        .join(F.broadcast(tot))
        .select(
            F.when(F.col("budget") >= F.col("tot"), F.col("n_max"))
            .otherwise(F.coalesce(F.col("seg_cap"), F.lit(0)))
            .cast("long")
            .alias("cap")
        )
    )
    neg_guard = F.when(F.col("n") < 0, F.raise_error("negative group size")).otherwise(
        F.col("n")
    )
    return (
        g.withColumn("n", neg_guard)
        .join(F.broadcast(cap_f))
        .select(
            F.col("grp").alias(group_col),
            F.col("n"),
            F.least(F.col("n"), F.col("cap")).alias("alloc"),
            F.col("cap"),
        )
    )
