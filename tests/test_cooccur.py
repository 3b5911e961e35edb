"""Token PMI co-occurrence — pure-Python oracle + hot-key prune semantics."""

from __future__ import annotations

import math
from itertools import combinations

from tldr_spark.operators.cooccur import token_pmi, token_presence

DOCS = [
    (0, "new york city"),
    (1, "new york times"),
    (2, "new york"),
    (3, "los angeles times"),
    (4, "los angeles"),
    (5, "city times"),
    (6, "new city new city"),
    (7, ""),
]


def _df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _pmi_py(docs, min_pair_docs):
    sets = {d: set(t.split()) for d, t in docs}
    n = len(docs)
    marg: dict[str, int] = {}
    for ts in sets.values():
        for t in ts:
            marg[t] = marg.get(t, 0) + 1
    pair: dict[tuple[str, str], int] = {}
    for ts in sets.values():
        for a, b in combinations(sorted(ts), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    out = {}
    for (a, b), nab in pair.items():
        if nab < min_pair_docs:
            continue
        p_ab = nab / n
        pmi = math.log(p_ab / ((marg[a] / n) * (marg[b] / n)))
        npmi = 1.0 if nab == n else pmi / -math.log(p_ab)
        out[(a, b)] = (marg[a], marg[b], nab, pmi, npmi)
    return out


def test_presence_distinct(spark):
    rows = token_presence(_df(spark)).collect()
    assert len(rows) == len(set((r["doc_id"], r["token"]) for r in rows))
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["token"])
    assert per_doc[6] == {"new", "city"}  # duplicates collapse
    assert 7 not in per_doc  # empty doc yields nothing


def test_pmi_matches_python(spark):
    got = {
        (r["token_a"], r["token_b"]): (r["n_a"], r["n_b"], r["n_ab"], r["pmi"], r["npmi"])
        for r in token_pmi(_df(spark), min_pair_docs=2).collect()
    }
    want = _pmi_py(DOCS, 2)
    assert set(got) == set(want)
    for k, (na, nb, nab, pmi, npmi) in want.items():
        gna, gnb, gnab, gpmi, gnpmi = got[k]
        assert (gna, gnb, gnab) == (na, nb, nab), k
        assert abs(gpmi - pmi) < 1e-12 and abs(gnpmi - npmi) < 1e-12, k
    # sanity: "new york" associates far above "city new" — both pairs meet
    # min_pair_docs=2 ("city times" co-occurs only in doc 5 and is
    # correctly absent at this threshold)
    assert got[("new", "york")][3] > got[("city", "new")][3]


def test_max_df_prune_only_restricts_pairs(spark):
    # with every token allowed the pair set is a superset of the pruned one,
    # and surviving pairs keep EXACT marginals
    full = {
        (r["token_a"], r["token_b"]): r["n_ab"]
        for r in token_pmi(_df(spark), min_pair_docs=1).collect()
    }
    pruned_rows = token_pmi(_df(spark), min_pair_docs=1, max_df_ratio=0.4).collect()
    pruned = {(r["token_a"], r["token_b"]): r["n_ab"] for r in pruned_rows}
    assert set(pruned) <= set(full)
    for k, v in pruned.items():
        assert v == full[k]
    # 'new' appears in 4/8 docs = 0.5 > 0.4 → no pair may contain it
    assert all("new" not in k for k in pruned)
