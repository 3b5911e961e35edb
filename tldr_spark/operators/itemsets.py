"""Frequent item-pair mining (the A-priori first pass, Agrawal &
Srikant VLDB'94): support and lift for every item pair co-present in a
user's basket. The pair pass dominates all longer itemsets in practice
and is the piece that needs distribution; longer itemsets follow by
the same join shape on the surviving pairs.

Spark shape: baskets = distinct (user, item) — ONE shuffle; the
A-priori invariant prunes items with support < min_support BEFORE the
pair join (a pair can never out-support its rarest item), so the
per-user self-join fans out only over frequent items; an optional
``max_basket`` cap drops pathological power-baskets (the classic skew
guard in distributed A-priori — a single 10^5-item basket would emit
5·10^9 pairs). Support counts are one (item_a, item_b) shuffle; lift
joins the item-count frame twice on a single key (vocabulary-sized —
NOT broadcast-hinted, AQE decides) and the basket total rides as a
1-row broadcast.

Cross-engine determinism: supports are exact integers; lift is one
double division of integer products, quantized by callers."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pair_support(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_a, n_b, n_ab, lift) for item_a < item_b with
    pair support n_ab >= min_support. Lift = n_ab * U / (n_a * n_b)
    with U the number of baskets (after the max_basket cap)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if max_basket is not None and max_basket < 2:
        raise ValueError("max_basket must be >= 2 (a pair needs two items)")
    b = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket is not None:
        sizes = b.groupBy("u").agg(F.count(F.lit(1)).alias("sz"))
        b = b.join(sizes.where(F.col("sz") <= max_basket).select("u"), "u", "left_semi")
    n_users = b.select("u").distinct().agg(F.count(F.lit(1)).alias("n_users"))
    freq = (
        b.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_support)
    )
    fb = b.join(freq.select("item"), "item", "left_semi")
    pairs = (
        fb.select("u", F.col("item").alias("item_a"))
        .join(fb.select("u", F.col("item").alias("item_b")), "u")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    return (
        pairs.join(freq.select(F.col("item").alias("item_a"), F.col("n").alias("n_a")), "item_a")
        .join(freq.select(F.col("item").alias("item_b"), F.col("n").alias("n_b")), "item_b")
        .join(F.broadcast(n_users))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            (
                F.col("n_ab").cast("double")
                * F.col("n_users")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
