"""As-of join: attach to every left row the most recent right row
at-or-before (inclusive) / strictly-before (exclusive) its timestamp, per
key — the point-in-time join (trades→quotes, event→latest-snapshot,
click→last-page-view) that Spark SQL has no native operator for.

Spark-first shape (the reference engine has no temporal joins at all —
this is part of the beyond-the-reference pipeline surface): a naive
formulation is a `l.ts >= r.ts` theta join, O(|L|·|R|) per key and a
BroadcastNestedLoopJoin in the plan — unusable at scale. Instead we do
the classic union-tag sweep:

    union(left, right) tagged by side
      → ONE hash shuffle on the key
      → per-key sort by (ts, side-order, tiebreak)
      → last(right_payload, ignorenulls) over rows-unbounded-preceding
      → keep left rows

Cost is one shuffle + one linear sorted window pass, identical to
sessionization; the skew ceiling is max rows per key (a hot key serializes
its own sorted run, nothing else). At 100 TB the same plan holds — the
window is a streaming frame (running `last`), Tungsten never buffers the
partition, and AQE splits oversized shuffle partitions.

Determinism: when several right rows share (key, ts), the one latest in
``tiebreak`` order wins. Pass an explicit tiebreak (or pre-dedup the right
side) when such ties are possible — otherwise the pick is tie-order
arbitrary, like any engine's asof join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    inclusive: bool = True,
    tolerance: Column | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Left-outer as-of join. Returns every ``left`` row plus one column
    per ``payload`` name (from the matched right row; NULL when no right
    row precedes it, or when the match is older than ``tolerance``).

    ``on``/``ts`` must exist on both sides; ``payload`` columns must exist
    on the right and must not collide with left columns. ``tolerance`` is
    an interval/duration Column compared against ``l.ts - r.ts`` (e.g.
    ``F.expr("INTERVAL 1 HOUR")``); matches farther back are nulled, the
    left row is kept.
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")
    tiebreak = tiebreak or []

    # side order inside an equal-ts group: inclusive → right first (visible
    # to a same-ts left row), exclusive → left first (right not yet visible).
    right_side, left_side = (0, 1) if inclusive else (1, 0)

    pay = F.struct(
        F.col(ts).alias("__rts"), *[F.col(c).alias(c) for c in payload]
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(ts).alias(ts),
        F.lit(right_side).alias(_SIDE),
        pay.alias(_PAYLOAD),
        *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tiebreak)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        F.col(on).alias(on),
        F.col(ts).alias(ts),
        F.lit(left_side).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{i}")
          for i, c in enumerate(tiebreak)],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    w = (
        Window.partitionBy(on)
        .orderBy(ts, _SIDE, *[f"__tb_{i}" for i in range(len(tiebreak))])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last(_PAYLOAD, ignorenulls=True).over(w))
        .where(F.col(_SIDE) == left_side)
    )
    if tolerance is not None:
        in_range = F.col(ts) - F.col("__m.__rts") <= tolerance
        matched = matched.withColumn(
            "__m", F.when(in_range, F.col("__m"))  # else NULL: match too old
        )
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in payload],
    )
