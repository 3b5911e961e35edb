"""Greedy maximum-coverage selection over (id, item) pairs — the standard
(1 - 1/e) submodular greedy (Nemhauser-Wolsey-Fisher '78), used in
training pipelines to pick the k documents that jointly cover the most
distinct n-grams/topics ("coverage subsetting", the set-cover dual of
the k-center diversity selector in kcenter.py).

Deterministic contract: per step pick the id with the most NOT-YET-
covered items, ties id-ascending; ids with zero remaining items are
never picked (selection stops early when nothing is left to cover).

Scale shape: per step one map-side-combined groupBy(id) count + one
TakeOrderedAndProject top-1 (only that single row reaches the driver),
then one left_anti shuffle join that subtracts the newly covered items
from the remaining pair set.  k is small by definition, so total cost is
k * (one agg + one anti-join) over a monotonically SHRINKING pair table;
localCheckpoint every few steps keeps the lineage flat.  No Python per
row anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CHECKPOINT_EVERY = 4


def maxcover_greedy(
    pairs: DataFrame, k: int, id_col: str = "doc_id", item_col: str = "gram"
) -> DataFrame:
    """Return (step, <id_col>, gain): the greedy max-coverage selection in
    order; gain = number of previously uncovered items the pick adds.
    ``pairs`` must be distinct (id, item) rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = pairs.sparkSession
    remaining = pairs.select(
        F.col(id_col).alias("__id"), F.col(item_col).alias("__item")
    )
    chosen: list[tuple[int, object, int]] = []
    for step in range(k):
        top = (
            remaining.groupBy("__id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("__id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        chosen.append((step, row["__id"], row["gain"]))
        covered = remaining.where(F.col("__id") == F.lit(row["__id"])).select("__item")
        remaining = remaining.join(covered, "__item", "left_anti")
        if (step + 1) % _CHECKPOINT_EVERY == 0:
            remaining = remaining.localCheckpoint(eager=False)
    schema_id = dict(pairs.dtypes)[id_col]
    return spark.createDataFrame(
        chosen, f"step int, {id_col} {schema_id}, gain long"
    )
