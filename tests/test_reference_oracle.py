"""Golden-parity tests: the pure-Python oracle reproduces didasy/tldr's
committed fixtures byte-identically (pagerank paths) and under the engine's
documented deterministic tie-break (centrality, SURVEY.md §5.4).

No Spark involved — this pins the SEMANTICS that the distributed operators
are then tested against.
"""

from __future__ import annotations

import pytest

from tldr_spark.functions import reference as R

from .conftest import reference_fixture


@pytest.fixture(scope="module")
def sample() -> str:
    return reference_fixture("sample.txt")


def _join(xs):
    return "\n\n".join(xs)


def test_sentence_count(sample):
    assert len(R.tokenize_sentences(sample.strip())) == 17


def test_trailing_unterminated_text_dropped():
    assert R.tokenize_sentences("One. Two! Three") == ["One.", "Two!"]


def test_sentence_spans_paragraph_break(sample):
    # sentence 7 spans a \n\n because ':' does not terminate (SURVEY §5.2)
    sents = R.tokenize_sentences(sample.strip())
    assert "\n\n" in sents[7] or ":" in sents[4]  # structural sanity


@pytest.mark.parametrize("weighing", ["hamming", "jaccard"])
def test_pagerank_top3_golden(sample, weighing):
    golden = reference_fixture("result.txt").strip()
    out = R.summarize(sample, 3, R.SummarizeConfig(weighing=weighing))
    assert _join(out) == golden


@pytest.mark.parametrize("weighing", ["hamming", "jaccard"])
def test_pagerank_top1_golden_via_invalid_num(sample, weighing):
    golden = reference_fixture("short.result.txt").strip()
    out = R.summarize(sample, 10000, R.SummarizeConfig(weighing=weighing))
    assert _join(out) == golden


def test_invalid_algorithm_falls_back_to_pagerank(sample):
    golden = reference_fixture("result.txt").strip()
    out = R.summarize(sample, 3, R.SummarizeConfig(algorithm="whatever"))
    assert _join(out) == golden


def test_centrality_top3_golden(sample):
    golden = reference_fixture("result_centrality.txt").strip()
    out = R.summarize(sample, 3, R.SummarizeConfig(algorithm="centrality"))
    assert _join(out) == golden


def test_centrality_top1_deterministic_order(sample):
    """Engine golden (regenerated): max weight 58 is TIED between edges
    (7,11) and (11,7); Go's unstable sort snapshot picked 11, the engine's
    documented total order (weight DESC, src ASC, dst ASC) picks 7."""
    sents = R.tokenize_sentences(sample.strip())
    out = R.summarize(sample, 10000, R.SummarizeConfig(algorithm="centrality"))
    assert out == [sents[7]]


def test_empty_and_whitespace_text():
    assert R.summarize("", 3) == []
    assert R.summarize("   \n\t  ", 3) == []


def test_single_sentence_yields_empty():
    # 1-node graph -> no edges -> no ranks (tldr.go:141-144)
    assert R.summarize("Hello world.", 1) == []


def test_max_characters_truncation(sample):
    out = R.summarize(sample, 3, R.SummarizeConfig(max_characters=30))
    joined = "".join(out)
    assert len(joined) <= 30
    assert out[0] != ""


def test_pre_split_sentences_entry_point():
    # sentences_test.go:9-25 semantics
    # exact sentences from sentences_test.go:11-16
    sents = [
        "Mary had a little lamb,",
        "it's fleece was white as snow,",
        "and everywhere that Mary went,",
        "that lamb was sure to go.",
    ]
    out = R.summarize("", 1, R.SummarizeConfig(sentences=sents))
    assert out == ["it's fleece was white as snow,"]


def test_injected_dictionary_skips_builder(sample):
    d = R.create_dictionary(sample.strip())
    out_with = R.summarize(sample, 3, R.SummarizeConfig(dictionary=d))
    out_without = R.summarize(sample, 3)
    assert out_with == out_without


def test_dictionary_vs_tokenizer_sanitization_mismatch():
    # "it's" -> tokenizer keeps apostrophe, dictionary drops it (§2 op-8)
    assert R.sanitize_word("it's") == "it's"
    assert "its" in R.create_dictionary("it's here")
    assert "it's" not in R.create_dictionary("it's here")


def test_dictionary_hyphen_rule():
    # '-' kept only after alnum; deleted chars do not update prev
    d = R.create_dictionary("star-studded")
    assert "star-studded" in d
    d2 = R.create_dictionary("-leading")
    assert "leading" in d2


def test_uniq_sentences_thresholds():
    bags = [["the", "cat", "sat"], ["the", "cat", "sat"], ["dogs", "bark"]]
    # identical sentences: later rejected at any threshold <= 1.0
    assert R.uniq_sentence_indices(bags, 0.95) == [0, 2]
    # threshold 0 rejects every later sentence in pass 1 except... all pairs
    # have distance >= 0 -> only first survives pass 1; CSIS then keeps it
    assert R.uniq_sentence_indices(bags, 0.0) == [0]


def test_csis_containment():
    bags = [["big", "cat"], ["the", "big", "cat", "sat"]]
    # earlier ⊂ later -> reject EARLIER
    assert R.uniq_sentence_indices(bags, 1.1) == [1]


def test_jaro_known_values():
    assert R.jaro_distance("", "") == 0.0
    assert R.jaro_distance("same", "same") == 1.0
    assert 0.0 <= R.jaro_distance("abc", "xyz") <= 1.0


def test_vector_set_ops_equivalents():
    import numpy as np

    a = np.array([[1, 0, 1, 1]], dtype=np.uint8)
    b = np.array([[1, 1, 0, 1]], dtype=np.uint8)
    w = R.pairwise_weights(np.vstack([a, b]), "hamming")
    assert w[0, 1] == 2  # positions 1,2 differ (SymmetricDifference len)
    wj = R.pairwise_weights(np.vstack([a, b]), "jaccard")
    # c = equal positions = 2 -> 1 - 2/(8-2) = 2/3
    assert abs(wj[0, 1] - (1 - 2 / (2 * 4 - 2))) < 1e-12


def test_custom_algorithm_hook():
    # edge_cases_test.go:175-185: custom algorithm always picks sentence 0
    cfg = R.SummarizeConfig(
        algorithm="custom",
        custom_algorithm=lambda src, dst, w: [0],
        sentences=["First sentence", "Second sentence"],
    )
    out = R.summarize("", 1, cfg)
    assert out == ["First sentence"]


def test_custom_weighing_hook():
    # edge_cases_test.go:188-199: constant max weight still yields a result
    cfg = R.SummarizeConfig(
        weighing="custom",
        custom_weighing=lambda a, b: 1.0,
        sentences=["First sentence", "Second sentence"],
    )
    out = R.summarize("", 1, cfg)
    assert len(out) == 1


def test_custom_word_tokenizer_hook():
    # edge_cases_test.go:202-214: constant tokens -> identical vectors ->
    # zero hamming weights -> no edges above threshold -> empty result
    cfg = R.SummarizeConfig(word_tokenizer=lambda s: ["custom", "tokens"])
    out = R.summarize("This is a test sentence. And another one.", 1, cfg)
    assert out == []
