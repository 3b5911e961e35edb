"""2-D skyline (Pareto frontier) — multi-criteria selection: keep the rows
no other row dominates (x' >= x and y' >= y with one strict). The corpus
use: "which documents are undominated on (length, lexical diversity)" —
the candidate set a curation pass inspects instead of ranking by a single
blended score.

Spark-first shape: in 2-D the skyline is a pure WINDOW, not a self-join.
Sort by x; a row is dominated iff
  max(y  |  x' > x)  >= y      (strictly longer, at least as diverse)
  or max(y | x' = x) >  y      (same length, strictly more diverse)
so two running-max range windows over ONE range-partitioned sort decide
every row — O(n log n) total, no O(n²) dominance join, no driver
collection. (k-D skylines need the grid/angular-partition algorithms; the
docstring scope is 2-D on purpose.) Ties: exact duplicates of an
undominated (x, y) point are all kept — they dominate each other only
non-strictly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows of ``df`` not dominated on (x, y), both maximized. NULL x or y
    rows are dropped (no total order to defend). ``x_col`` must be an
    integer type: the strictly-greater window is ``rangeBetween(1, ∞)``,
    which on fractional x would silently skip x' in (x, x+1)."""
    if df.schema[x_col].dataType.typeName() not in ("byte", "short", "integer", "long"):
        raise ValueError(f"{x_col} must be an integer column (got "
                         f"{df.schema[x_col].dataType.simpleString()})")
    clean = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    above = (
        Window.orderBy(F.col(x_col))
        .rangeBetween(1, Window.unboundedFollowing)
    )
    same = Window.partitionBy(F.col(x_col))
    y = F.col(y_col)
    return (
        clean.withColumn("__a", F.max(y).over(above))
        .withColumn("__s", F.max(y).over(same))
        .where(
            (F.col("__a").isNull() | (F.col("__a") < y)) & (F.col("__s") <= y)
        )
        .drop("__a", "__s")
    )
