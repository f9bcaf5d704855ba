"""Unigram-LM tokenizer: lattice math, Viterbi determinism, training
convergence, Spark-apply vs sequential mirror."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark.llm import unigram
from data_lake_skyfit_spark.llm.unigram import (
    UnigramModel,
    _forward_backward,
    apply_unigram,
    train_unigram,
    viterbi_segment,
)


def test_forward_backward_hand_computed():
    """word 'ab' with pieces a,b,ab: Z = p(a)p(b) + p(ab)."""
    logp = {"a": math.log(0.2), "b": math.log(0.3), "ab": math.log(0.5)}
    logz, counts = _forward_backward("ab", logp, 2)
    z = 0.2 * 0.3 + 0.5
    assert logz == pytest.approx(math.log(z))
    assert counts["ab"] == pytest.approx(0.5 / z)
    assert counts["a"] == pytest.approx(0.06 / z)
    assert counts["b"] == pytest.approx(0.06 / z)


def test_viterbi_prefers_higher_prob_then_fewer_pieces():
    logp = {"a": math.log(0.2), "b": math.log(0.3), "ab": math.log(0.5)}
    m = UnigramModel(logp, 2)
    assert viterbi_segment("ab", m) == ["ab"]
    # Make the split and the joint EXACTLY tie -> fewer pieces wins.
    tie = UnigramModel({"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.25)}, 2)
    assert viterbi_segment("ab", tie) == ["ab"]


def test_viterbi_unknown_chars_fall_back_to_singles():
    m = UnigramModel({"a": math.log(0.5)}, 2)
    assert viterbi_segment("axa", m) == ["a", "x", "a"]


def test_train_learns_frequent_subwords(spark):
    corpus = [(i, "lowest newest widest lowest newest lowest") for i in range(20)]
    df = spark.createDataFrame(corpus, "doc_id BIGINT, text STRING")
    model = train_unigram(df, vocab_size=40, seed_size=60, max_piece_len=6)
    # The shared suffix must survive pruning as a piece.
    assert "est" in model.logp or "west" in model.logp
    # All single characters of the corpus are retained.
    for ch in set("lowestnewidst"):
        assert ch in model.logp
    # Probabilities are a (sub-)distribution.
    assert sum(math.exp(lp) for lp in model.logp.values()) <= 1.0 + 1e-9


def test_training_is_deterministic(spark):
    corpus = [(i, "spark table join scan filter join table") for i in range(10)]
    df = spark.createDataFrame(corpus, "doc_id BIGINT, text STRING")
    a = train_unigram(df, vocab_size=30, seed_size=50).to_items()
    b = train_unigram(df, vocab_size=30, seed_size=50).to_items()
    assert a == b


def test_segmentation_reconstructs_word(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    model = train_unigram(docs, vocab_size=300, seed_size=600)
    rows = docs.select("doc_id", "text").collect()
    for r in rows[:30]:
        for w in r.text.split()[:20]:
            assert "".join(viterbi_segment(w, model)) == w


def test_apply_matches_sequential_mirror(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    model = train_unigram(docs, vocab_size=200, seed_size=400)
    got = {r.doc_id: (r.n_words, r.n_pieces, r.pieces_logp)
           for r in apply_unigram(docs, model).collect()}
    for r in docs.select("doc_id", "text").collect():
        words = [w for w in unigram._ASCII_WS.split(r.text or "") if w]
        n_pieces, logp_sum = 0, 0.0
        for w in words:
            pieces = viterbi_segment(w, model)
            n_pieces += len(pieces)
            logp_sum += sum(model.logp.get(p, unigram._UNK_LOGP) for p in pieces)
        nw, np_, lp = got[r.doc_id]
        assert (nw, np_) == (len(words), n_pieces)
        assert lp == pytest.approx(logp_sum, rel=1e-12)


def test_larger_vocab_never_lengthens_tokenization(spark):
    corpus = [(i, "internationalization tokenization normalization") for i in range(5)]
    df = spark.createDataFrame(corpus, "doc_id BIGINT, text STRING")
    small = train_unigram(df, vocab_size=30, seed_size=40, max_piece_len=6)
    large = train_unigram(df, vocab_size=200, seed_size=400, max_piece_len=6)
    for w in ["internationalization", "tokenization", "normalization"]:
        assert len(viterbi_segment(w, large)) <= len(viterbi_segment(w, small))


def test_model_roundtrips_through_items():
    m = UnigramModel({"ab": -1.0, "a": -2.0, "b": -2.5}, 2)
    m2 = UnigramModel.from_items(m.to_items())
    assert m2.logp == m.logp and m2.max_piece_len == 2
