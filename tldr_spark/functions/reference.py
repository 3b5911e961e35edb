"""Pure-Python/NumPy reference semantics of didasy/tldr (the correctness oracle).

Every function here re-expresses, from observed behavior, exactly WHAT the
reference computes — not how. These callables serve double duty:

* as the pytest oracle (golden parity against /root/reference fixtures), and
* as the vectorized kernels wrapped by the engine's pandas UDFs
  (``tldr_spark.functions.text_udfs``) and by the distributed summarizer
  (``tldr_spark.operators.summarize``) — the SAME code path runs row-wise in
  the oracle and batch-wise on executors, which is what makes the
  "byte-identical extracted text per url" invariant hold by construction.

Semantics sources (studied, not copied):
  sentence tokenizer   /root/reference/util.go:16-34  (regex util.go:13)
  word sanitizer       /root/reference/util.go:223-228 (regex util.go:12)
  word tokenizer       /root/reference/tldr.go:58-64
  Jaro distance        /root/reference/util.go:40-135 (byte-index quirks kept)
  sentence dedup       /root/reference/util.go:159-221
  dictionary builder   /root/reference/tldr.go:374-403
  binary vectorizer    /root/reference/tldr.go:332-351
  edge weighing        /root/reference/tldr.go:264-314
  centrality ranking   /root/reference/tldr.go:194-220 (tie order made
                       deterministic: weight DESC, src ASC, dst ASC — see
                       SURVEY.md §5.4)
  pagerank fixpoint    SURVEY.md §2.7 (alixaxel/pagerank pinned at
                       go.mod:4; damping/tolerance defaults tldr.go:51-52)
  top-k + concat       /root/reference/tldr.go:141-187
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------------------
# Config defaults (tldr.go:47-56)
# ---------------------------------------------------------------------------

DEFAULT_ALGORITHM = "pagerank"
DEFAULT_WEIGHING = "hamming"
DEFAULT_DAMPING = 0.85
DEFAULT_TOLERANCE = 0.0001
DEFAULT_THRESHOLD = 0.001
DEFAULT_MAX_CHARACTERS = 0
DEFAULT_SENTENCES_DISTANCE_THRESHOLD = 0.95

# Reference regexes (util.go:12-13). RE2's `\s` is `[\t\n\f\r ]` and `$` has
# no before-trailing-newline magic, hence the explicit class and `\Z`.
_SENTENCE_RE = re.compile(r"([.?!])(?:[\t\n\f\r ]|\Z)")
# `[^\p{L}\d]` -> Python `[\W_]` for the run-of-2+ alternative (underscore is
# not \p{L}\d) and `[^\p{L}\d_'-]` -> `[^\w'-]` (keeps _ ' -), re.UNICODE.
_SANITIZE_RE = re.compile(r"([\W_]{2,}|[^\w'\-])", re.UNICODE)


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

def tokenize_sentences(text: str) -> list[str]:
    """Split on [.?!] followed by whitespace/EOT, keeping the terminator.

    Trailing un-terminated text is DROPPED (no post-loop append) — a
    documented reference quirk (SURVEY.md §5.5) the engine reproduces.
    """
    text = text.strip()
    tokens: list[str] = []
    start = 0
    for m in _SENTENCE_RE.finditer(text):
        tokens.append(text[start : m.start() + 1].strip())
        start = m.end()
    return tokens


def sanitize_word(word: str) -> str:
    """Lowercase, delete runs>=2 of non-alnum and isolated non-alnum except _ ' -."""
    return _SANITIZE_RE.sub("", word.lower())


def default_word_tokenizer(sentence: str) -> list[str]:
    """Whitespace fields, each sanitized (may yield empty strings, kept)."""
    return [sanitize_word(w) for w in sentence.split()]


# ---------------------------------------------------------------------------
# Jaro distance — faithful byte-level port of the reference's adaptation.
# The reference indexes the longer string by BYTE while iterating the shorter
# by rune; for ASCII the two coincide. We keep byte semantics for parity.
# ---------------------------------------------------------------------------

def _runes_with_offsets(b: bytes) -> list[tuple[int, int]]:
    """(byte_offset, codepoint) pairs, like Go's `for i, v := range s`."""
    out = []
    i = 0
    s = b.decode("utf-8")
    for ch in s:
        out.append((i, ord(ch)))
        i += len(ch.encode("utf-8"))
    return out


def jaro_distance(str1: str, str2: str) -> float:
    """Similarity in [0,1]; 1.0 means identical. Reference util.go:40-135."""
    if len(str1) == 0 and len(str2) == 0:
        return 0.0
    if str1 == str2:
        return 1.0
    b1 = str1.lower().encode("utf-8")
    b2 = str2.lower().encode("utf-8")
    if len(b1) <= len(b2):
        s1, s2 = b1, b2
    else:
        s1, s2 = b2, b1

    match_window = int(max(len(s1), len(s2)) / 2.0) - 1
    matches1 = [False] * len(s1)
    matches2 = [False] * len(s2)
    m = 0.0
    t = 0.0

    for i, v in _runes_with_offsets(s1):
        matched = False
        if v == s2[i]:
            matches1[i] = True
            matches2[i] = True
            matched = True
            m += 1
        else:
            k = 0 if i <= match_window else i - match_window
            while True:
                dif = len(s2) - len(s1)
                x = 0 if dif < 2 else dif - 2
                if k == len(s2) - x:
                    break
                if v == s2[k]:
                    if not matches1[i] and not matches2[k]:
                        m += 1
                    matches1[i] = True
                    matches2[k] = True
                    matched = True
                k += 1
                if k <= i + match_window and k < len(s2) and matched:
                    break

    if m == 0:
        return 0.0

    k = 0
    for _, v in _runes_with_offsets(s1):
        if k >= len(matches1) - 1:
            break
        if matches1[k]:
            while k < len(matches2) and not matches2[k]:
                k += 1
            if k < len(matches2) and v != s2[k]:
                t += 1
            k += 1

    t = t / 2.0
    x1 = m / len(s1)
    x2 = m / len(s2)
    return (x1 + x2 + ((m - t) / m)) / 3.0


# ---------------------------------------------------------------------------
# Sentence dedup (Jaro pass + CSIS substring-containment pass)
# ---------------------------------------------------------------------------

def uniq_sentence_indices(
    bags: list[list[str]], threshold: float = DEFAULT_SENTENCES_DISTANCE_THRESHOLD
) -> list[int]:
    """Indices of sentences kept by the two-pass dedup (util.go:159-202).

    Pass 1 (Jaro): if similarity(earlier, later) >= threshold, reject LATER.
    Pass 2 (CSIS): if earlier is a substring of later reject EARLIER; if
    later is substring of earlier reject LATER.

    NOTE: the reference then rebuilds the slice into a local variable
    (util.go:214-220) so the caller never observes the shrink — a Go
    slice-header bug documented in SURVEY.md §5.5. The engine implements
    dedup CORRECTLY (returns kept indices so downstream ranks stay aligned
    with the original sentences); at the default threshold the goldens are
    unaffected.
    """
    msens = [" ".join(b) for b in bags]
    n = len(msens)
    reject = [False] * n
    for i in range(n - 1):
        if reject[i]:
            continue
        for j in range(i + 1, n):
            if not reject[j] and jaro_distance(msens[i], msens[j]) >= threshold:
                reject[j] = True
    for i in range(n - 1):
        if reject[i]:
            continue
        for j in range(i + 1, n):
            if not reject[j]:
                if msens[i] in msens[j]:
                    reject[i] = True
                    break
                if msens[j] in msens[i]:
                    reject[j] = True
    return [i for i in range(n) if not reject[i]]


# ---------------------------------------------------------------------------
# Dictionary (tldr.go:374-403): lowercase, char-filter, 1-based
# first-occurrence ordinals. The char filter differs from sanitize_word on
# purpose (e.g. "it's" -> tokenizer "it's" vs dictionary "its") — SURVEY.md
# §2 op-8; both rules are reproduced for parity.
# ---------------------------------------------------------------------------

def _dictionary_char_filter(text: str) -> str:
    out = []
    prev = "\x00"
    for ch in text:
        if ch == "-" and (prev.isalpha() or prev.isdigit()):
            out.append(ch)  # kept; prev intentionally NOT updated (Go quirk)
            continue
        if not (ch.isalpha() or ch.isdigit() or ch.isspace()):
            continue  # deleted; prev NOT updated
        out.append(ch)
        prev = ch
    return "".join(out)


def create_dictionary(text: str) -> dict[str, int]:
    words = _dictionary_char_filter(text.lower()).split()
    dict_: dict[str, int] = {}
    i = 1
    for w in words:
        if w not in dict_:
            dict_[w] = i
            i += 1
    return dict_


# ---------------------------------------------------------------------------
# Vectorize + weigh. Dense NumPy here (oracle scale is one document); the
# engine's relational form is tokens ⋈ dictionary -> sparse (sent, word_pos).
# ---------------------------------------------------------------------------

def binary_vectors(bags: list[list[str]], dict_: dict[str, int]) -> np.ndarray:
    """(n_sentences, vocab) uint8 term-presence matrix (tldr.go:332-351)."""
    vlen = len(dict_)
    mat = np.zeros((len(bags), vlen), dtype=np.uint8)
    for i, bag in enumerate(bags):
        for w in bag:
            pos = dict_.get(w, 0)
            if pos > 0:
                mat[i, pos - 1] = 1
    return mat


def pairwise_weights(mat: np.ndarray, weighing: str = DEFAULT_WEIGHING) -> np.ndarray:
    """(n, n) dense weight matrix for all ordered pairs; diagonal unused.

    hamming (tldr.go:290-297): count of differing positions (a dissimilarity).
    jaccard (tldr.go:280-288): 1 - c/(2V - c) with c = count of EQUAL
    positions (both-1 AND both-0) — a distance, not true Jaccard; kept as-is.
    """
    m = mat.astype(np.int32)
    inter = m @ m.T  # |A∩B|
    ones = m.sum(axis=1)  # |A|
    hamming = ones[:, None] + ones[None, :] - 2 * inter
    if weighing == "jaccard":
        v = float(mat.shape[1])
        common = v - hamming  # equal positions = V - differing
        return 1.0 - common / (2.0 * v - common)
    return hamming.astype(np.float64)


def edge_list(weights: np.ndarray, threshold: float = DEFAULT_THRESHOLD):
    """Directed (src, dst, w) for all i!=j with w > threshold (tldr.go:197-230)."""
    n = weights.shape[0]
    src, dst = np.nonzero(~np.eye(n, dtype=bool) & (weights > threshold))
    return src, dst, weights[src, dst]


# ---------------------------------------------------------------------------
# PageRank fixpoint — SURVEY.md §2.7 semantics of the pinned
# alixaxel/pagerank dependency, verified by byte-identical golden
# reproduction (see tests/test_reference_oracle.py).
# ---------------------------------------------------------------------------

def pagerank_fixpoint(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    damping: float = DEFAULT_DAMPING,
    tolerance: float = DEFAULT_TOLERANCE,
    max_iter: int = 10_000,
) -> dict[int, float]:
    """Weighted PageRank power iteration; returns {original_id: rank}.

    Contract (§2.7): duplicate (src,dst) weights SUM; out-weights normalize
    the transition matrix; N = linked nodes only; every node receives
    (1-α)/N + α·(dangling mass)/N each step; stop when L1 delta <= ε.
    """
    ids: list[int] = []
    idx: dict[int, int] = {}
    # first-Link dense relabel order: src then dst per edge
    for s, d in zip(np.asarray(src).tolist(), np.asarray(dst).tolist()):
        for v in (s, d):
            if v not in idx:
                idx[v] = len(ids)
                ids.append(v)
    n = len(ids)
    if n == 0:
        return {}
    mat = np.zeros((n, n), dtype=np.float64)
    out_w = np.zeros(n, dtype=np.float64)
    for s, d, ww in zip(np.asarray(src).tolist(), np.asarray(dst).tolist(), np.asarray(w).tolist()):
        mat[idx[s], idx[d]] += ww
        out_w[idx[s]] += ww
    nz = out_w > 0
    mat[nz] /= out_w[nz, None]

    inv = 1.0 / n
    rank = np.full(n, inv)
    dangling = ~nz
    for _ in range(max_iter):
        leak = damping * rank[dangling].sum()
        new = damping * (rank @ mat) + (1.0 - damping) * inv + leak * inv
        delta = np.abs(new - rank).sum()
        rank = new
        if delta <= tolerance:
            break
    return {ids[i]: float(rank[i]) for i in range(n)}


def centrality_ranks(src, dst, w) -> list[int]:
    """Vertices by their max out-edge weight, deterministic total order
    (weight DESC, src ASC, dst ASC) — SURVEY.md §5.4 decision; the
    reference's Go sort is unstable on ties so its golden order is not
    reproducible by any stable rule."""
    order = sorted(range(len(w)), key=lambda i: (-w[i], src[i], dst[i]))
    seen: set[int] = set()
    ranks: list[int] = []
    for i in order:
        s = int(src[i])
        if s not in seen:
            seen.add(s)
            ranks.append(s)
    return ranks


# ---------------------------------------------------------------------------
# Full pipeline (Summarize, tldr.go:110-187)
# ---------------------------------------------------------------------------

@dataclass
class SummarizeConfig:
    algorithm: str = DEFAULT_ALGORITHM
    weighing: str = DEFAULT_WEIGHING
    damping: float = DEFAULT_DAMPING
    tolerance: float = DEFAULT_TOLERANCE
    threshold: float = DEFAULT_THRESHOLD
    max_characters: int = DEFAULT_MAX_CHARACTERS
    sentences_distance_threshold: float = DEFAULT_SENTENCES_DISTANCE_THRESHOLD
    dictionary: dict[str, int] | None = None
    sentences: list[str] | None = field(default=None)  # pre-split entry point
    # injection hooks (tldr.go:97-107): swap the ranking algorithm
    # (algorithm="custom"), the pair weighing (weighing="custom"), or the
    # word tokenizer. Hook callables must be top-level functions when used
    # with the distributed summarizer (they ship to executors via pickle).
    custom_algorithm: object = None  # f(src, dst, w arrays) -> list[int]
    custom_weighing: object = None  # f(vec_a, vec_b) -> float, per pair
    word_tokenizer: object = None  # f(sentence) -> list[str]


def summarize(text: str, num: int, cfg: SummarizeConfig | None = None) -> list[str]:
    """Reference-equivalent extractive summary; returns [] where Go returns nil."""
    cfg = cfg or SummarizeConfig()
    text = text.strip()
    if not text and not cfg.sentences:
        return []

    sentences = cfg.sentences if cfg.sentences else tokenize_sentences(text)
    tokenizer = cfg.word_tokenizer or default_word_tokenizer
    bags = [tokenizer(s) for s in sentences]
    kept = uniq_sentence_indices(bags, cfg.sentences_distance_threshold)
    sentences = [sentences[i] for i in kept]
    bags = [bags[i] for i in kept]

    dict_ = cfg.dictionary
    if not dict_:
        dict_ = create_dictionary(text if text else " ".join(sentences).strip())

    mat = binary_vectors(bags, dict_)
    if cfg.weighing == "custom" and cfg.custom_weighing is not None:
        n = mat.shape[0]
        weights = np.zeros((n, n))
        for i in range(n):
            for j in range(n):
                if i != j:
                    weights[i, j] = cfg.custom_weighing(mat[i], mat[j])
    else:
        weights = pairwise_weights(mat, cfg.weighing)
    src, dst, w = edge_list(weights, cfg.threshold)

    if cfg.algorithm == "custom" and cfg.custom_algorithm is not None:
        ranks = list(cfg.custom_algorithm(src, dst, w))
    elif cfg.algorithm == "centrality":
        ranks = centrality_ranks(src, dst, w)
    else:  # "pagerank", unknown names fall back (tldr.go:136-137)
        scores = pagerank_fixpoint(src, dst, w, cfg.damping, cfg.tolerance)
        # sort by score desc; ties broken by insertion (first-Link) order
        # which Python's stable sort preserves, matching ByScore+Reverse
        ranks = [k for k, _ in sorted(scores.items(), key=lambda kv: -kv[1])]

    if not ranks:
        return []
    if num > len(ranks) or num < 1:
        num = 1
    idx = sorted(ranks[:num])

    res: list[str] = []
    if cfg.max_characters > 0:
        used = 0
        for i in idx:
            ln = len(sentences[i])
            if used + ln <= cfg.max_characters:
                res.append(sentences[i])
                used += ln
            else:
                n_fit = min(cfg.max_characters - used, ln)
                res.append(sentences[i][:n_fit])
                break
        return res
    return [sentences[i] for i in idx]
