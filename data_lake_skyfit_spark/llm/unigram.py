"""Unigram-LM tokenizer (SentencePiece style, Kudo 2018): distributed
training + Arrow-batched Viterbi application — the second trainable
subword tokenizer next to `llm/tokenizer.py`'s BPE (SURVEY.md §7.5
text tier; no reference analog).

Scale design mirrors train_bpe:
- The corpus reduces to ONE word-frequency shuffle; the EM loop runs
  driver-side over the collected top-`max_words` table (unigram-LM
  statistics over 100 TB equal the statistics of its distinct-word
  frequency table). Per EM round the cost is O(words · word_len ·
  max_piece_len) — forward-backward over the segmentation lattice of
  each distinct word, seconds at the default caps.
- Training: seed vocabulary = all substrings up to `max_piece_len`
  scored by freq·len (top `seed_size`) plus every single character
  (coverage guarantee); EM rounds re-estimate piece probabilities from
  expected counts (full forward-backward, not hard-EM); pruning keeps
  the top `vocab_size` pieces by estimated probability, never dropping
  single characters. Ties everywhere break lexicographically, so the
  model is a pure function of the corpus.
- Application: Viterbi segmentation (max total log-prob; ties → fewer
  pieces, then lexicographically smallest piece sequence — fully
  deterministic) in a mapInPandas kernel with per-batch word
  memoization; the model ships via SparkContext.broadcast exactly like
  BPE merge ranks. Characters unseen in training fall back to
  single-char pieces at the floor probability (no failure mode).

Iterative EM is not SQL-expressible, so the contract is pinned in
tests/test_unigram.py (hand-computed lattice, apply-vs-mirror sweep,
coverage and determinism properties) — the same pytest-only discipline
as train_bpe (VERDICT r3 accepts this class as structurally
un-oracle-able).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import tokens_expr

_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")

__all__ = ["train_unigram", "viterbi_segment", "apply_unigram", "UnigramModel"]

# Log-prob floor for unknown single characters at apply time.
_UNK_LOGP = -100.0


class UnigramModel:
    """Piece → log-probability table with deterministic Viterbi."""

    def __init__(self, logp: dict[str, float], max_piece_len: int):
        self.logp = dict(logp)
        self.max_piece_len = max_piece_len

    def to_items(self) -> list[tuple[str, float]]:
        return sorted(self.logp.items())

    @classmethod
    def from_items(cls, items: list[tuple[str, float]]) -> "UnigramModel":
        logp = dict(items)
        return cls(logp, max(map(len, logp), default=1))


def _word_freqs(df: DataFrame, text_col: str, max_words: int) -> dict[str, int]:
    rows = (
        df.select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return {r["w"]: int(r["n"]) for r in rows if r["w"]}


def _seed_vocab(
    freqs: dict[str, int], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Substring candidates scored by freq·len; all single chars kept."""
    scores: dict[str, int] = defaultdict(int)
    for w, f in freqs.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                scores[w[i:j]] += f * (j - i)
    chars = {p for p in scores if len(p) == 1}
    multi = sorted(
        ((s, p) for p, s in scores.items() if len(p) > 1),
        key=lambda sp: (-sp[0], sp[1]),
    )[: max(0, seed_size - len(chars))]
    seed = {p for _, p in multi} | chars
    total = sum(scores[p] for p in seed)
    return {p: math.log(scores[p] / total) for p in sorted(seed)}


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]]:
    """Expected piece counts over all segmentations of one word.
    Returns (log Z, {piece: expected count})."""
    n = len(word)
    alpha = [-math.inf] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = -math.inf
        for i in range(max(0, j - max_len), j):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or alpha[i] == -math.inf:
                continue
            acc = _logaddexp(acc, alpha[i] + lp)
        alpha[j] = acc
    if alpha[n] == -math.inf:
        return -math.inf, {}
    beta = [-math.inf] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = -math.inf
        for j in range(i + 1, min(i + max_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == -math.inf:
                continue
            acc = _logaddexp(acc, lp + beta[j])
        beta[i] = acc
    logz = alpha[n]
    counts: dict[str, float] = defaultdict(float)
    for i in range(n):
        if alpha[i] == -math.inf:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or beta[j] == -math.inf:
                continue
            counts[p] += math.exp(alpha[i] + lp + beta[j] - logz)
    return logz, counts


def _logaddexp(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def train_unigram(
    df: DataFrame,
    *,
    vocab_size: int = 2000,
    text_col: str = "text",
    max_words: int = 100_000,
    max_piece_len: int = 8,
    seed_size: int = 8000,
    em_rounds: int = 2,
    shrink: float = 0.75,
) -> UnigramModel:
    """Learn a unigram-LM piece vocabulary from the corpus.

    Per outer round: `em_rounds` of full EM at the current vocabulary,
    then prune to `shrink`× the multi-char pieces (by probability,
    ties lexicographic) until `vocab_size` is reached. Single
    characters are never pruned (coverage)."""
    freqs = _word_freqs(df, text_col, max_words)
    logp = _seed_vocab(freqs, seed_size, max_piece_len)
    if not logp:
        return UnigramModel({}, max_piece_len)

    def em(logp: dict[str, float]) -> dict[str, float]:
        expected: dict[str, float] = defaultdict(float)
        for w, f in freqs.items():
            _, counts = _forward_backward(w, logp, max_piece_len)
            for p, c in counts.items():
                expected[p] += f * c
        total = sum(expected.values())
        if total <= 0:
            return logp
        # Pieces with zero expected count would go to -inf; keep single
        # chars at a floor so coverage never breaks.
        out: dict[str, float] = {}
        for p in logp:
            c = expected.get(p, 0.0)
            if c > 0:
                out[p] = math.log(c / total)
            elif len(p) == 1:
                out[p] = _UNK_LOGP
        return out

    while True:
        for _ in range(em_rounds):
            logp = em(logp)
        multi = [(p, lp) for p, lp in logp.items() if len(p) > 1]
        n_chars = len(logp) - len(multi)
        if len(logp) <= vocab_size or not multi:
            break
        keep = max(vocab_size - n_chars, 0)
        target = min(int(len(multi) * shrink), len(multi) - 1)
        target = max(target, keep)
        if target >= len(multi):
            break
        multi.sort(key=lambda plp: (-plp[1], plp[0]))
        kept = dict(multi[:target])
        logp = {p: lp for p, lp in logp.items() if len(p) == 1 or p in kept}
    return UnigramModel(logp, max_piece_len)


def viterbi_segment(word: str, model: UnigramModel) -> list[str]:
    """Best segmentation: max total log-prob, ties → fewer pieces,
    then lexicographically smallest piece sequence. Unknown chars
    segment as single chars at the floor log-prob."""
    n = len(word)
    logp, max_len = model.logp, model.max_piece_len
    # best[j] = (score, n_pieces, pieces tuple) for word[:j]
    best: list[tuple[float, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for j in range(1, n + 1):
        cand: tuple[float, int, tuple[str, ...]] | None = None
        for i in range(max(0, j - max_len), j):
            prev = best[i]
            if prev is None:
                continue
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                if j - i == 1:
                    lp = _UNK_LOGP  # unknown single char fallback
                else:
                    continue
            c = (prev[0] + lp, prev[1] + 1, prev[2] + (p,))
            if (
                cand is None
                or c[0] > cand[0] + 1e-12
                or (abs(c[0] - cand[0]) <= 1e-12 and (c[1], c[2]) < (cand[1], cand[2]))
            ):
                cand = c
        best[j] = cand
    assert best[n] is not None  # single-char fallback guarantees a path
    return list(best[n][2])


def apply_unigram(
    df: DataFrame,
    model: UnigramModel,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each document: (id, n_words, n_pieces, pieces_logp).
    Same broadcast + per-batch memoization shape as apply_bpe."""
    import pandas as pd

    from .similarity import _register_kernel_broadcast

    bc = _register_kernel_broadcast(
        df.sparkSession.sparkContext.broadcast(
            (model.to_items(), model.max_piece_len)
        )
    )
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("n_pieces", T.IntegerType()),
            T.StructField("pieces_logp", T.DoubleType()),
        ]
    )

    def kernel(batches):
        items, max_len = bc.value
        model = UnigramModel(dict(items), max_len)
        memo: dict[str, tuple[int, float]] = {}

        def seg(word: str) -> tuple[int, float]:
            if word not in memo:
                pieces = viterbi_segment(word, model)
                memo[word] = (
                    len(pieces),
                    sum(model.logp.get(p, _UNK_LOGP) for p in pieces),
                )
            return memo[word]

        for pdf in batches:
            words_per_doc = [
                [w for w in _ASCII_WS.split(str(t)) if w]
                for t in pdf[text_col].fillna("")
            ]
            segs = [[seg(w) for w in ws] for ws in words_per_doc]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": pd.array([len(ws) for ws in words_per_doc], dtype="int32"),
                    "n_pieces": pd.array(
                        [sum(c for c, _ in s) for s in segs], dtype="int32"
                    ),
                    "pieces_logp": [sum(lp for _, lp in s) for s in segs],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
