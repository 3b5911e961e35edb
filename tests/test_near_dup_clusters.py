"""Near-dup clustering + survivor selection — python union-find oracle."""

from __future__ import annotations

from itertools import combinations

from tldr_spark.operators.dedup import near_dup_clusters

# 3-gram shingle corpus at threshold 0.35: 0/1 exact dups, 2 a transitive
# bridge to 3 (j(0,2)=4/11, j(2,3)=5/11, but j(0,3)=1/14 is below), 4 an
# unrelated singleton, 5 too short for any 3-gram (empty set -> singleton).
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over a sleeping cat today"),
    (3, "fox jumps over a sleeping cat today and every day"),
    (4, "completely different text about web scale analytics engines"),
    (5, "too short"),
]


def _sh(text, n=3):
    t = [w for w in text.strip().split() if w]
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def _oracle(docs, threshold=0.35):
    sets = {i: _sh(t) for i, t in docs}
    parent = {i: i for i, _ in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if sa or sb:
            if inter / (len(sa) + len(sb) - inter or 1) >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in parent}
    canon = {}
    for i, c in comp.items():
        canon.setdefault(c, []).append(i)
    out = {}
    for c, members in canon.items():
        m = min(members)
        for i in members:
            out[i] = (m, len(members), 1 if i == m else 0)
    return out


def _run(spark, docs=DOCS, threshold=0.35):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: (r.canonical_id, r.cluster_size, r.is_survivor)
        for r in near_dup_clusters(df, threshold=threshold).collect()
    }


def test_matches_python_oracle(spark):
    assert _run(spark) == _oracle(DOCS)


def test_transitive_closure_and_survivors(spark):
    got = _run(spark)
    # exact dups 0/1 cluster with bridge 2 and transitive 3 at the test's
    # 0.35 threshold (verify the fixture: 0~3 directly is far below it)
    s0, s3 = _sh(DOCS[0][1]), _sh(DOCS[3][1])
    assert len(s0 & s3) / len(s0 | s3) < 0.35
    assert got[0] == (0, 4, 1)
    assert got[1] == (0, 4, 0)
    assert got[2] == (0, 4, 0)
    assert got[3] == (0, 4, 0)
    # singletons survive alone, including the shingle-less short doc
    assert got[4] == (4, 1, 1)
    assert got[5] == (5, 1, 1)
    # exactly one survivor per cluster, every doc assigned
    assert sum(v[2] for v in got.values()) == 3 and len(got) == 6
