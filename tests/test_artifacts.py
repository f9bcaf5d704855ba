"""ModelRegistry (llm/artifacts.py): bit-exact round-trips for every
trained-artifact kind, idempotent re-save, kind mismatch guards, and
the end-to-end property that matters — a RELOADED encoder serves
identical embeddings to the in-memory one.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_lake_skyfit_spark.llm import artifacts, encoder
from data_lake_skyfit_spark.llm.unigram import UnigramModel


@pytest.fixture()
def reg(tmp_path):
    return artifacts.ModelRegistry(str(tmp_path / "models"))


def _toy_model():
    rng = np.random.default_rng(11)
    return encoder.DualEncoder(
        w_img=rng.standard_normal((9, 4)),
        w_txt=rng.standard_normal((16, 4)),
        grid=3,
        buckets=16,
        dim=4,
        temperature=17.5,
    )


def test_dual_encoder_bit_exact_roundtrip(spark, reg):
    m = _toy_model()
    reg.save_dual_encoder(spark, "clip-v1", m)
    back = reg.load_dual_encoder(spark, "clip-v1")
    assert np.array_equal(m.w_img, back.w_img)  # exact, not allclose
    assert np.array_equal(m.w_txt, back.w_txt)
    assert (back.grid, back.buckets, back.dim, back.temperature) == (3, 16, 4, 17.5)


def test_reloaded_encoder_serves_identical_embeddings(spark, reg):
    m = _toy_model()
    reg.save_dual_encoder(spark, "clip-v1", m)
    back = reg.load_dual_encoder(spark, "clip-v1")
    feats = spark.createDataFrame(
        [(i, [float((i * k) % 5 - 2) for k in range(16)]) for i in range(20)],
        "doc_id long, features array<double>",
    )
    a = {
        r["doc_id"]: r["embedding"]
        for r in encoder.encode_features(feats, m, modality="text").collect()
    }
    b = {
        r["doc_id"]: r["embedding"]
        for r in encoder.encode_features(feats, back, modality="text").collect()
    }
    assert a == b  # exact equality of every served double


def test_resave_is_idempotent_and_updates(spark, reg):
    m = _toy_model()
    reg.save_dual_encoder(spark, "clip", m)
    reg.save_dual_encoder(spark, "clip", m)  # replay: still one row
    assert reg.list(spark).count() == 1
    m2 = _toy_model()
    m2.w_img = m2.w_img + 1.0
    reg.save_dual_encoder(spark, "clip", m2)  # retrain: row replaced
    assert reg.list(spark).count() == 1
    assert np.array_equal(reg.load_dual_encoder(spark, "clip").w_img, m2.w_img)


def test_bpe_and_unigram_and_weights_roundtrip(spark, reg):
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    reg.save_bpe_merges(spark, "bpe", merges)
    assert reg.load_bpe_merges(spark, "bpe") == merges

    um = UnigramModel({"ab": math.log(0.25), "a": -1.7, "b": -2.30000000000001}, 2)
    reg.save_unigram(spark, "um", um)
    back = reg.load_unigram(spark, "um")
    assert back.logp == um.logp  # float repr round-trip is exact
    assert back.max_piece_len == 2

    w = {7: -3, 123: 40000, 0: 1}
    reg.save_quantized_weights(spark, "qw", w)
    assert reg.load_quantized_weights(spark, "qw") == w
    # registry holds all three side by side
    kinds = {r["name"]: r["kind"] for r in reg.list(spark).collect()}
    assert kinds == {
        "bpe": "bpe_merges",
        "um": "unigram_lm",
        "qw": "quantized_weights",
    }


def test_kind_mismatch_and_missing_raise(spark, reg):
    reg.save_bpe_merges(spark, "bpe", [("a", "b")])
    with pytest.raises(TypeError, match="bpe_merges"):
        reg.load_dual_encoder(spark, "bpe")
    with pytest.raises(KeyError, match="ghost"):
        reg.load(spark, "ghost")


def test_nonfinite_weights_refused(spark, reg):
    m = _toy_model()
    m.w_img[0, 0] = float("nan")
    with pytest.raises(ValueError):
        reg.save_dual_encoder(spark, "bad", m)
    # nothing half-written
    with pytest.raises(KeyError):
        reg.load(spark, "bad")
