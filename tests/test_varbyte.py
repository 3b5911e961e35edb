"""Varbyte posting-size model pinned against a pure-python encoder that
actually emits the bytes (so the threshold arithmetic is proven against
a real varbyte encoding, not another copy of the same CASE ladder)."""

from __future__ import annotations

from tldr_spark.operators.index import posting_varbyte_sizes

_DOCS = [
    (0, "a b c a"),
    (1, "b c"),
    (127, "a"),
    (128, "a"),          # first-gap boundary: doc 127 -> gap 128 needs 2 bytes
    (20000, "b zz"),
    (2097151, "c"),
    (2097152, "zz"),
]


def _vb_len(gap: int) -> int:
    # real varbyte: 7 payload bits per byte, continuation flag
    n = 1
    while gap >= 128:
        gap >>= 7
        n += 1
    return n


def _oracle(docs):
    posts: dict[str, list[int]] = {}
    for i, text in docs:
        for t in set(text.split()):
            posts.setdefault(t, []).append(i)
    out = {}
    for t, ids in posts.items():
        ids.sort()
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        out[t] = (len(ids), sum(_vb_len(g) for g in gaps), len(ids) * 8)
    return out


def test_matches_real_varbyte_encoder(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        r["token"]: (r["df"], r["vb_bytes"], r["raw_bytes"])
        for r in posting_varbyte_sizes(df, top_k=100).collect()
    }
    assert got == _oracle(_DOCS)


def test_boundary_gaps_cost_two_bytes(spark):
    # gap exactly 128 must cost 2 bytes, 127 costs 1
    df = spark.createDataFrame([(126, "x"), (127, "y")], "doc_id long, text string")
    got = {r["token"]: r["vb_bytes"] for r in posting_varbyte_sizes(df).collect()}
    assert got == {"x": 1, "y": 2}  # first gaps 127 and 128
