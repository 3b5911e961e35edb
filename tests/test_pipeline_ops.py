"""Training-pipeline operators: dedup, similarity, textstats, multimodal,
distributed summarize — against testdata tables and Python oracles."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


# --- dedup -----------------------------------------------------------------

def test_exact_dedup(spark, docs):
    from tldr_spark.operators.dedup import exact_dedup

    res = exact_dedup(docs)
    texts = [r["text"] for r in docs.collect()]
    assert res.count() == len(set(texts))
    assert res.agg(F.sum("dup_count")).collect()[0][0] == len(texts)


def test_ngram_jaccard_vs_python(spark, docs):
    from tldr_spark.operators.dedup import ngram_jaccard_pairs

    sample = docs.filter("doc_id < 40")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sample, n=3, threshold=0.2).collect()
    }

    rows = {r["doc_id"]: r["text"] for r in sample.collect()}

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    expected = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        A, B = sh(rows[a]), sh(rows[b])
        if A and B:
            j = len(A & B) / len(A | B)
            if j >= 0.2:
                expected[(a, b)] = j
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-9)


def test_minhash_lsh_recall(spark, docs):
    """Every pair with true Jaccard >= 0.6 must be an LSH candidate
    (4 independent minhashes at band size 1 -> miss prob (1-j)^4 <= 2.6%;
    on this deterministic corpus: zero misses, asserted exactly)."""
    from tldr_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    sample = docs.filter("doc_id < 60")
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(sample, n=3, threshold=0.6).collect()
    }
    cand = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(sample, n=3).collect()
    }
    assert truth <= cand


def test_simhash_similar_docs_close(spark):
    from tldr_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    s = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(s[0], s[1]) < ham(s[0], s[2])


def test_embedding_near_dups_and_selfsim(spark, embs):
    from tldr_spark.operators.dedup import embedding_near_dups

    sample = embs.filter("vec_id < 50")
    pairs = embedding_near_dups(sample, threshold=0.99).collect()
    import numpy as np

    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in sample.collect()}
    expected = set()
    for a, b in itertools.combinations(sorted(rows), 2):
        va, vb = rows[a], rows[b]
        cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        if cos >= 0.99:
            expected.add((a, b))
    assert {(r["id_a"], r["id_b"]) for r in pairs} == expected


def test_embedding_near_dups_lsh_candidates_match_all_pairs(spark):
    """The composed scale path — LSH bucket candidates feeding the bounded
    verification join — must return exactly the all-pairs result at a high
    threshold (τ=0.95 near-dups are nearly-parallel vectors, which multi-
    table hyperplane LSH recalls deterministically with enough tables)."""
    import numpy as np

    from tldr_spark.operators.dedup import embedding_near_dups
    from tldr_spark.operators.similarity import lsh_candidate_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((12, 64))
    vecs = []
    for i, v in enumerate(base):
        vecs.append((i, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    # true near-dups: tiny perturbations of vectors 0..3
    for j in range(4):
        v = base[j] + 0.02 * rng.standard_normal(64)
        vecs.append((100 + j, (v / np.linalg.norm(v)).astype(np.float32).tolist()))
    embs = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(embs, threshold=0.95).collect()
    }
    assert len(exact) >= 4  # the construction produced real near-dups
    cand = lsh_candidate_pairs(embs, n_planes=6, n_tables=12)
    composed = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups(embs, threshold=0.95, candidates=cand).collect()
    }
    assert composed == exact


# --- similarity ------------------------------------------------------------

def test_brute_force_topk_matches_numpy(spark, embs):
    import numpy as np

    from tldr_spark.operators.similarity import brute_force_topk

    probes = embs.filter("vec_id < 3")
    got = brute_force_topk(embs, probes, k=5).collect()
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in embs.collect()}
    for pid in [0, 1, 2]:
        p = rows[pid]
        scored = sorted(
            (
                (-(p @ v / (np.linalg.norm(p) * np.linalg.norm(v))), nid)
                for nid, v in rows.items()
                if nid != pid
            ),
        )[:5]
        expected = [nid for _, nid in scored]
        mine = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["probe_id"] == pid]
        assert mine == expected


def test_lsh_topk_reasonable_recall(spark, embs):
    from tldr_spark.operators.similarity import brute_force_topk, lsh_topk

    probes = embs.filter("vec_id < 10")
    exact = brute_force_topk(embs, probes, k=5).collect()
    # near-random embeddings are LSH-adversarial: amplify (4 planes, 8
    # tables -> expected recall ~0.65 at neighbor cosine ~0.6)
    approx = lsh_topk(embs, probes, k=5, n_planes=4, n_tables=8).collect()
    e = {(r["probe_id"], r["neighbor_id"]) for r in exact}
    a = {(r["probe_id"], r["neighbor_id"]) for r in approx}
    assert len(e & a) / len(e) >= 0.4


# --- textstats ---------------------------------------------------------

def test_token_count_matches_python(spark, docs):
    from tldr_spark.operators.textstats import token_count

    got = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    for r in docs.collect():
        assert got[r["doc_id"]] == len(r["text"].split())


def test_quality_and_langid_run(spark, docs):
    from tldr_spark.operators.textstats import lang_id, quality_score

    q = quality_score(docs)
    assert q.filter("quality < 0 OR quality > 3").count() == 0
    li = lang_id(docs)
    assert li.count() == docs.count()
    assert set(r["lang_pred"] for r in li.collect()) <= {"en", "de", "fr"}


def test_fingerprint_order_invariant(spark):
    from tldr_spark.operators.textstats import fingerprint

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "c b a a"), (2, "a b d")], "doc_id long, text string"
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]


# --- multimodal plumbing -----------------------------------------------

def test_media_features_and_frames(spark):
    from tldr_spark.operators.multimodal import extract_media_features, frame_sample, synth_media

    media = synth_media(spark, 12)
    feats = extract_media_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert r["width"] >= 16 and r["n_bytes"] > 17
    frames = frame_sample(media.filter("kind = 'video'"), every_n=2)
    assert frames.count() > 0


def _real_bmp(w: int, h: int) -> bytes:
    """Minimal 24bpp bottom-up BMP, rows padded to 4 bytes."""
    import struct

    row = bytes(range(60, 60 + 3 * w))
    pad = b"\x00" * ((4 - (3 * w) % 4) % 4)
    pixels = (row + pad) * h
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + info + pixels


def _real_wav(n_frames: int, channels: int = 2, bits: int = 16, rate: int = 8000) -> bytes:
    import struct

    frame_sz = channels * bits // 8
    data = bytes((i * 11) % 256 for i in range(n_frames * frame_sz))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * frame_sz, frame_sz, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_media_features_decode_real_formats(spark):
    """Non-SYNM payloads decode through the same Spark plumbing: a real
    uncompressed BMP and a real PCM WAV, parsed by the built-in
    pure-Python decoders."""
    from tldr_spark.operators.multimodal import extract_media_features, frame_sample

    rows = [
        (0, "image", _real_bmp(5, 3), 0, 0, 0),
        (1, "audio", _real_wav(100), 0, 0, 0),
        (2, "image", _real_bmp(2, 2), 0, 0, 0),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, height int, n_frames int"
    )
    feats = {r["media_id"]: r for r in extract_media_features(media, fake=False).collect()}
    assert (feats[0]["width"], feats[0]["height"], feats[0]["n_frames"]) == (5, 3, 1)
    assert (feats[2]["width"], feats[2]["height"]) == (2, 2)
    assert feats[1]["n_frames"] == 100  # WAV frames = data / (channels*bytes)
    assert feats[1]["mean_byte"] > 0
    # audio "frame" sampling over the real WAV
    frames = frame_sample(media.filter("media_id = 1"), every_n=25, fake=False)
    assert frames.count() == 4


def test_media_features_decoder_injection(spark):
    """A production decoder swap touches only the kernel."""
    from tldr_spark.operators.multimodal import extract_media_features

    media = spark.createDataFrame(
        [(7, "image", b"OPAQUE-CODEC-BYTES", 0, 0, 0)],
        "media_id long, kind string, payload binary, width int, height int, n_frames int",
    )

    def my_decoder(payload: bytes):
        return 123, 45, 1, 1.5, len(payload)

    r = extract_media_features(media, decoder=my_decoder).collect()[0]
    assert (r["width"], r["height"], r["mean_byte"]) == (123, 45, 1.5)


def test_media_unknown_format_fails_loudly(spark):
    import pytest

    from tldr_spark.operators.multimodal import extract_media_features

    media = spark.createDataFrame(
        [(0, "image", b"\xff\xd8\xff\xe0 jpeg-ish", 0, 0, 0)],
        "media_id long, kind string, payload binary, width int, height int, n_frames int",
    )
    with pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        extract_media_features(media, fake=False).collect()


# --- distributed summarize ----------------------------------------------

def test_summarize_documents_matches_oracle(spark):
    from tldr_spark.functions.reference import SummarizeConfig, summarize
    from tldr_spark.operators.summarize import summarize_documents

    sample_txt = open("/root/reference/sample.txt", encoding="utf-8").read()
    corpus = [(0, sample_txt), (1, "One one. Two two! Three? Four four four."), (2, "")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r["summary"] for r in summarize_documents(df, 3).collect()}
    for doc_id, text in corpus:
        assert got[doc_id] == "\n\n".join(summarize(text, 3, SummarizeConfig()))
    # doc 0 reproduces the committed golden through the DISTRIBUTED path
    golden = open("/root/reference/result.txt", encoding="utf-8").read().strip()
    assert got[0] == golden


def _upper_tokenizer(sentence):
    # top-level so it pickles to executors
    from tldr_spark.functions.reference import default_word_tokenizer

    return [t.upper() for t in default_word_tokenizer(sentence)]


def test_summarize_documents_presplit_and_full_config(spark):
    # pre-split entry point (tldr.go:20,354): sentences bypass the tokenizer
    from pyspark.sql import functions as F

    from tldr_spark.functions.reference import SummarizeConfig, summarize
    from tldr_spark.operators.summarize import summarize_documents

    sents = [
        "Mary had a little lamb,",
        "it's fleece was white as snow,",
        "and everywhere that Mary went,",
        "that lamb was sure to go.",
    ]
    df = spark.createDataFrame([(0, sents)], "doc_id long, sentences array<string>")
    got = summarize_documents(df, 1, sentences_col="sentences").collect()[0]
    expected = summarize("", 1, SummarizeConfig(sentences=list(sents)))
    assert got["summary"] == "\n\n".join(expected)
    # sentences_test.go:23 expects exactly this sentence for the pre-split API
    assert got["summary"] == "it's fleece was white as snow,"

    # full config surface distributedly: centrality + jaccard + char budget
    # + injected dictionary + custom tokenizer hook, vs the local kernel
    sample_txt = open("/root/reference/sample.txt", encoding="utf-8").read()
    cfg = SummarizeConfig(
        algorithm="centrality",
        weighing="jaccard",
        max_characters=120,
        word_tokenizer=_upper_tokenizer,
    )
    tdf = spark.createDataFrame([(0, sample_txt)], "doc_id long, text string")
    got2 = summarize_documents(tdf, 3, config=cfg).collect()[0]["summary"]
    assert got2 == "\n\n".join(summarize(sample_txt, 3, cfg))
    assert sum(len(s) for s in got2.split("\n\n")) <= 120


def test_simhash_near_dup_pairs_match_brute_force(spark):
    """Banding is complete for hamming < bands (pigeonhole), so the
    bucket-join candidates + popcount verify must equal the brute-force
    all-pairs answer exactly."""
    from tldr_spark.operators.dedup import simhash, simhash_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base + f" tail{i % 4}") for i in range(12)]  # 4 near-dup families
    rows += [(100 + i, f"totally unrelated content number {i} with words") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(df, bits=32, bands=4, max_hamming=3).collect()
    }
    sh = {r["id"]: r["simhash"] for r in simhash(df, bits=32).collect()}
    expected = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 3:
                expected[(a, b)] = h
    assert got == expected
    assert expected, "construction must produce real near-dups"


def test_simhash_near_dup_pairs_guards(spark):
    import pytest

    from tldr_spark.operators.dedup import simhash_near_dup_pairs

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(df, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(df, bits=32, bands=5, max_hamming=2)


def test_ivf_topk_recall_and_determinism(spark, embs):
    from tldr_spark.operators.similarity import brute_force_topk, ivf_topk

    probes = embs.filter("vec_id < 10")
    exact = {(r["probe_id"], r["neighbor_id"]) for r in brute_force_topk(embs, probes, k=5).collect()}
    run = lambda: {
        (r["probe_id"], r["neighbor_id"])
        for r in ivf_topk(embs, probes, k=5, n_cells=16, n_probe_cells=4).collect()
    }
    a = run()
    # near-random embeddings are ANN-adversarial; 4/16 cells probed lands
    # ~0.68 recall on this deterministic corpus (cf. LSH ~0.65)
    assert len(exact & a) / len(exact) >= 0.5
    assert a == run()  # seeded sample + seeded k-means: bit-deterministic


def test_ivf_topk_exact_when_probing_all_cells(spark, embs):
    """n_probe_cells = n_cells degenerates to exact search: every vector is
    a candidate, so the re-rank must equal brute force."""
    from tldr_spark.operators.similarity import brute_force_topk, ivf_topk

    sample = embs.filter("vec_id < 60")
    probes = sample.filter("vec_id < 5")
    exact = {(r["probe_id"], r["neighbor_id"], r["rank"]) for r in brute_force_topk(sample, probes, k=5).collect()}
    got = {
        (r["probe_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(sample, probes, k=5, n_cells=8, n_probe_cells=8).collect()
    }
    assert got == exact


def test_repetition_stats_matches_brute(spark):
    import re

    from tldr_spark.operators.textstats import repetition_stats

    corpus = [
        (0, "buy now\nbuy now\nbuy now\nlimited offer"),
        (1, "a quiet page with\n\nno repeated lines at all here"),
        (2, "spam spam spam spam spam"),
        (3, ""),
        (4, "one-line"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df, ngram=2).collect()}
    for doc_id, text in corpus:
        lines = [s for s in text.split("\n") if s.strip() != ""]
        n_lines = len(lines)
        dup_pm = ((n_lines - len(set(lines))) * 1000) // n_lines if n_lines else 0
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        n_grams = len(grams)
        top_pm = (
            max(grams.count(g) for g in set(grams)) * 1000 // n_grams
            if n_grams
            else 0
        )
        r = got[doc_id]
        assert (r["n_lines"], r["dup_line_pm"], r["n_grams"], r["top_gram_pm"]) == (
            n_lines,
            dup_pm,
            n_grams,
            top_pm,
        ), doc_id


def test_paragraph_dedup_canonical_first(spark):
    from tldr_spark.operators.textstats import paragraph_dedup

    boiler = "all rights reserved"
    corpus = [
        (0, f"intro zero\n\n{boiler}"),
        (1, f"{boiler}\n\nbody one"),
        (2, f"body two\n\n{boiler}\n\nbody two"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = paragraph_dedup(df).collect()
    dup = {(r["doc_id"], r["para_idx"]): r["is_duplicate"] for r in rows}
    # boilerplate: canonical copy is (0,1); later copies are duplicates
    assert dup[(0, 1)] is False and dup[(1, 0)] is True and dup[(2, 1)] is True
    # repeated paragraph WITHIN one doc: first wins
    assert dup[(2, 0)] is False and dup[(2, 2)] is True
    # unique paragraphs are not duplicates
    assert dup[(0, 0)] is False and dup[(1, 1)] is False


def test_contamination_check_counts(spark):
    from tldr_spark.operators.textstats import contamination_check

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps")], "bid long, text string"
    )
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over it"),  # contains bench 3-grams
            (1, "completely unrelated content words here"),
            (2, "xy"),  # too short for any 3-gram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in contamination_check(docs, bench, ngram=3).collect()}
    # doc 0 tokens: 7 -> 5 grams; bench grams = {tqb, qbf, bfj} all present
    assert got[0]["n_grams"] == 5 and got[0]["contaminated"] == 3
    assert got[0]["contaminated_pm"] == 3000 // 5
    assert got[1]["contaminated"] == 0 and got[1]["n_grams"] == 3
    assert got[2]["n_grams"] == 0 and got[2]["contaminated_pm"] == 0
