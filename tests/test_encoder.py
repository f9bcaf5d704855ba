"""Learned CLIP-style dual encoder (llm/encoder.py): training is
iterative gradient descent and not SQL-expressible, so — like the BPE
and unigram-LM tokenizers — its guarantees are pinned here:
determinism, decreasing loss, cross-modal retrieval accuracy far above
chance on HELD-OUT pairs, real-decode-only features, and that the
serving output plugs straight into the existing ANN tier.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_skyfit_spark.llm import encoder, multimodal, similarity

N_CONCEPTS = 6
# Disjoint per-concept caption vocabulary + shared filler words (the
# filler is deliberately identical across concepts so retrieval can't
# succeed on raw token overlap with the image side — only through the
# learned joint space).
_WORDS = [
    ["amber", "arch", "anvil"],
    ["birch", "bay", "bolt"],
    ["cedar", "cliff", "crane"],
    ["delta", "dune", "drift"],
    ["ember", "edge", "elm"],
    ["fjord", "flint", "fern"],
]


def _concept(doc_id: int) -> int:
    return doc_id % N_CONCEPTS


def _image_payload(doc_id: int) -> bytes:
    """24×20 BMP: concept c brightens the c-th of six vertical bands
    (a spatial one-hot); per-id brightness jitter keeps every instance
    distinct so the encoder must generalize, not memorize bytes."""
    c = _concept(doc_id)
    w, h = 24, 20
    bright = 200 + (doc_id * 13) % 40
    dark = 20 + (doc_id * 7) % 30

    def pixel(x, y, ch):
        return bright if (x * N_CONCEPTS) // w == c else dark

    return multimodal.encode_bmp24(w, h, pixel)


def _caption(doc_id: int) -> str:
    c = _concept(doc_id)
    words = _WORDS[c]
    rot = doc_id % len(words)
    core = words[rot:] + words[:rot]
    return " ".join(core) + " the scene of a frame"


@pytest.fixture(scope="module")
def corpus(spark):
    n = 96
    rows = [(i, _image_payload(i), _caption(i)) for i in range(n)]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema).repartition(4)


@pytest.fixture(scope="module")
def model(corpus):
    train = corpus.filter(F.col("doc_id") < 60)
    img = encoder.image_grid_features(train, grid=6)
    txt = encoder.text_hash_features(train, buckets=64)
    return encoder.train_dual_encoder(
        img, txt, dim=16, epochs=250, lr=0.05, max_pairs=60, seed=7
    )


def test_grid_pool_exact_block_means():
    g = np.array([[0.0, 1.0], [2.0, 3.0]])
    pooled = encoder._grid_pool(g, 2)
    assert np.array_equal(pooled, g)
    # whole-image pooling = global mean
    assert encoder._grid_pool(g, 1)[0, 0] == 1.5
    # upsampling duplicates nearest pixels, never crashes on empty cells
    up = encoder._grid_pool(g, 4)
    assert up.shape == (4, 4) and up[0, 0] == 0.0 and up[3, 3] == 3.0


def test_image_features_real_decode_only(spark):
    rows = [(1, _image_payload(1)), (2, b"not an image at all"), (3, None)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    out = encoder.image_grid_features(df, grid=6).collect()
    assert [r["doc_id"] for r in out] == [1]
    feat = np.array(out[0]["features"])
    assert feat.shape == (36,)
    # centered and unit-norm
    assert abs(feat.sum()) < 1e-9
    assert abs((feat * feat).sum() - 1.0) < 1e-9


def test_text_features_deterministic_and_normalized(spark, corpus):
    out = {
        r["doc_id"]: np.array(r["features"])
        for r in encoder.text_hash_features(corpus, buckets=64).collect()
    }
    assert len(out) == 96
    for v in out.values():
        assert abs((v * v).sum() - 1.0) < 1e-9
    # same concept+rotation → identical caption → identical features
    assert np.array_equal(out[0], out[36])  # 36 % 6 == 0, 36 % 3 == 0


def test_training_is_deterministic(corpus):
    train = corpus.filter(F.col("doc_id") < 30)
    img = encoder.image_grid_features(train, grid=6)
    txt = encoder.text_hash_features(train, buckets=64)
    kw = dict(dim=8, epochs=40, lr=0.05, max_pairs=30, seed=3)
    a = encoder.train_dual_encoder(img, txt, **kw)
    b = encoder.train_dual_encoder(img, txt, **kw)
    assert np.array_equal(a.w_img, b.w_img)
    assert np.array_equal(a.w_txt, b.w_txt)
    assert a.losses == b.losses


def test_loss_decreases(model):
    assert model.losses[-1] < model.losses[0] * 0.5, (
        f"InfoNCE barely moved: {model.losses[0]:.3f} -> {model.losses[-1]:.3f}"
    )


def test_heldout_crossmodal_retrieval(corpus, model):
    """Encode HELD-OUT images and captions (doc_id >= 60, never seen in
    training); nearest-caption retrieval must recover the image's
    concept far above the 1/6 chance rate."""
    held = corpus.filter(F.col("doc_id") >= 60)
    img_e = encoder.encode_features(
        encoder.image_grid_features(held, grid=6), model, modality="image"
    )
    txt_e = encoder.encode_features(
        encoder.text_hash_features(held, buckets=64), model, modality="text"
    )
    imgs = {r["doc_id"]: np.array(r["embedding"]) for r in img_e.collect()}
    txts = {r["doc_id"]: np.array(r["embedding"]) for r in txt_e.collect()}
    assert len(imgs) == 36 and len(txts) == 36
    hits = 0
    for qid, qv in imgs.items():
        best = max(txts, key=lambda tid: float(qv @ txts[tid]))
        hits += _concept(best) == _concept(qid)
    acc = hits / len(imgs)
    assert acc >= 0.8, f"held-out cross-modal concept accuracy {acc:.2f}"


def test_embeddings_feed_ann_tier(corpus, model):
    """Serving output is (id, array<double>) — exactly the embeddings-
    table shape; knn over a mixed image+caption corpus runs unchanged."""
    held = corpus.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 72))
    img_e = encoder.encode_features(
        encoder.image_grid_features(held, grid=6), model, modality="image"
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    txt_e = encoder.encode_features(
        encoder.text_hash_features(held, buckets=64), model, modality="text"
    ).select((F.col("doc_id") + 1000).alias("vec_id"), "embedding")
    top = similarity.brute_force_topk(img_e, txt_e, k=1).collect()
    assert len(top) == 12
    match = sum(
        _concept(r["neighbor_id"] - 1000) == _concept(r["query_id"]) for r in top
    )
    assert match >= 10


def test_encode_rejects_width_mismatch(corpus, model):
    bad = encoder.text_hash_features(corpus.limit(4), buckets=32)
    with pytest.raises(Exception, match="width"):
        encoder.encode_features(bad, model, modality="text").collect()
    with pytest.raises(ValueError, match="modality"):
        encoder.encode_features(bad, model, modality="video")


def test_train_requires_pairs(corpus):
    one = corpus.filter(F.col("doc_id") == 0)
    img = encoder.image_grid_features(one, grid=6)
    txt = encoder.text_hash_features(one, buckets=64)
    with pytest.raises(ValueError, match="pairs"):
        encoder.train_dual_encoder(img, txt, max_pairs=8)
