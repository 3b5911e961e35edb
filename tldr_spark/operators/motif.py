"""GraphFrames-style motif pattern matching compiled to DataFrame joins.

A pattern is a ``;``-separated list of directed-edge terms over named
vertices::

    "a->b; b->c; a->c"        # feed-forward triangle
    "a->b; b->c; !c->a"       # open 2-path with NO closing back-edge

Each positive term becomes one equi-join against the edge table (Catalyst
picks sort-merge or broadcast-hash; at web scale every join key is a
vertex id, so AQE skew handling applies); each negated term becomes a
``left_anti`` join and may only reference vertices already bound by a
positive term.  Semantics are pure relational joins — no implicit
vertex-distinctness constraint — so any pattern has an exact SQL twin,
which is what the DuckDB oracles run.

Reference parity note: didasy/tldr has no motif engine; this generalizes
its graph layer (tldr.go:261-299 builds the edge set that queries here
consume) the same way GraphFrames generalizes GraphX.  Pattern syntax is
the public GraphFrames ``find()`` surface restricted to named vertices
and unnamed edges.

Scale shape: k positive terms => k-1 joins over the edge table, each a
shuffle on one vertex column (or exchange-free after bucketing on src —
see sources/tables.save_prepared_edges).  Negations append anti-joins on
(src,dst), again plain shuffles.  No Python runs per row anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_TERM = re.compile(
    r"^(!?)\s*\(?\s*([A-Za-z]\w*)\s*\)?\s*-+\s*>\s*\(?\s*([A-Za-z]\w*)\s*\)?$"
)

# internal join-side column names; vertex names must start with a letter so
# these can never collide
_U, _V = "__motif_u", "__motif_v"


def parse_pattern(pattern: str) -> list[tuple[bool, str, str]]:
    """Parse a motif pattern into (negated, src_var, dst_var) terms."""
    terms: list[tuple[bool, str, str]] = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"bad motif term {raw!r}; expected 'a->b' or '!a->b'")
        terms.append((m.group(1) == "!", m.group(2), m.group(3)))
    if not terms:
        raise ValueError("empty motif pattern")
    if all(t[0] for t in terms):
        raise ValueError("pattern needs at least one positive edge term")
    return terms


def motif_find(edges: DataFrame, pattern: str) -> DataFrame:
    """Return all bindings of the pattern's named vertices, one column per
    vertex (sorted by name), duplicate bindings removed by construction of
    the joins (assumes ``edges`` holds distinct (src, dst) pairs, which
    the edge builder guarantees)."""
    terms = parse_pattern(pattern)
    pos = [t for t in terms if not t[0]]
    neg = [t for t in terms if t[0]]

    # order positive terms so every join shares >=1 bound vertex (no
    # cartesian products, ever)
    ordered = [pos[0]]
    bound = {pos[0][1], pos[0][2]}
    remaining = pos[1:]
    while remaining:
        nxt = next((t for t in remaining if t[1] in bound or t[2] in bound), None)
        if nxt is None:
            raise ValueError("positive edge terms must form a connected pattern")
        ordered.append(nxt)
        bound |= {nxt[1], nxt[2]}
        remaining.remove(nxt)
    for _, u, v in neg:
        if u not in bound or v not in bound:
            raise ValueError(
                f"negated term !{u}->{v} references a vertex no positive term binds"
            )

    e = edges.select("src", "dst")
    _, a, b = ordered[0]
    if a == b:  # self-loop term
        df = e.where(F.col("src") == F.col("dst")).select(F.col("src").alias(a))
    else:
        df = e.select(F.col("src").alias(a), F.col("dst").alias(b))
    seen = {a, b}
    for _, u, v in ordered[1:]:
        t = e.select(F.col("src").alias(_U), F.col("dst").alias(_V))
        cond = None
        if u in seen:
            cond = F.col(u) == F.col(_U)
        if v in seen:
            c2 = F.col(v) == F.col(_V)
            cond = c2 if cond is None else cond & c2
        df = df.join(t, cond, "inner")
        if u not in seen:
            df = df.withColumnRenamed(_U, u)
            seen.add(u)
        else:
            df = df.drop(_U)
        if v not in seen:
            df = df.withColumnRenamed(_V, v)
            seen.add(v)
        else:
            df = df.drop(_V)
    for _, u, v in neg:
        t = e.select(F.col("src").alias(_U), F.col("dst").alias(_V))
        df = df.join(
            t, (F.col(u) == F.col(_U)) & (F.col(v) == F.col(_V)), "left_anti"
        )
    return df.select(*sorted(seen))


def motif_count_by(edges: DataFrame, pattern: str, by: str) -> DataFrame:
    """Group the pattern's bindings by one vertex variable and count —
    the common 'which vertices head the most motifs' shape.  The count
    aggregate partial-combines map-side, so the shuffle carries one row
    per distinct `by` vertex, not one per binding."""
    return motif_find(edges, pattern).groupBy(by).agg(
        F.count(F.lit(1)).alias("cnt")
    )
