"""The tokenizer pandas UDFs produce exactly what the reference kernels
produce row-wise (same functions, Arrow-batched)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tldr_spark.functions import reference as R
from tldr_spark.functions.text_udfs import sanitize, split_sentences, tokenize_words


def test_split_sentences_udf_matches_reference(spark):
    sample = open("/root/reference/sample.txt", encoding="utf-8").read().strip()
    texts = [sample, "One. Two! Three", "", "No terminator here"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["s"] for r in df.select("i", split_sentences("t").alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == R.tokenize_sentences(t), i


def test_tokenize_and_sanitize_udfs_match_reference(spark):
    words = ["It's", "(COR-TEN?)", "Rä", "star-studded", "hello_world", "A--B"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got_san = [r["s"] for r in df.select(sanitize("w").alias("s")).collect()]
    assert got_san == [R.sanitize_word(w) for w in words]

    sents = ["Jeff Bennett's Wars on Kinkade are hilarious paintings.", "  spaced   out  "]
    df2 = spark.createDataFrame([(s,) for s in sents], "s string")
    got_tok = [r["t"] for r in df2.select(tokenize_words("s").alias("t")).collect()]
    assert got_tok == [R.default_word_tokenizer(s) for s in sents]


def test_posexplode_sentence_table_shape(spark):
    # the engine's sentences table: (doc_id, sent_id, sentence) via posexplode
    df = spark.createDataFrame([(7, "A one. B two! C?")], "doc_id long, text string")
    out = (
        df.select("doc_id", F.posexplode(split_sentences("text")).alias("sent_id", "sentence"))
        .collect()
    )
    assert [(r["doc_id"], r["sent_id"], r["sentence"]) for r in out] == [
        (7, 0, "A one."),
        (7, 1, "B two!"),
        (7, 2, "C?"),
    ]
