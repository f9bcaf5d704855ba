"""Perceptual image dedup (dHash + Hamming-banded join) and audio VAD.

Pins: (1) the dHash bit convention against a hand-computed golden (the
GIF LZW lesson — a self-consistent round-trip proves nothing, the wire
convention needs an independent pin), (2) hamming_neardup_pairs equals
the brute-force all-pairs scan (pigeonhole completeness is claimed as
a theorem — verify it on adversarial hash sets), (3) VAD segmentation
against hand-computed islands, (4) honest-null degenerate paths.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_lake_skyfit_spark.llm import dedup, multimodal
from data_lake_skyfit_spark.llm.multimodal import (
    _dhash_bits,
    encode_png,
    encode_wav_pcm16,
)


# ---------------------------------------------------------------------------
# dHash kernel
# ---------------------------------------------------------------------------


def test_dhash_golden_bit_convention():
    """Hand-computed golden on a 9x8 grayscale ramp: cell (r, c) holds
    luma 10*c for c < 5 and 0 beyond, so bit(r,c) = 1 iff c < 4
    (ascending run), 0 at the 50→0 drop and the flat zero tail.
    Rows 0-3 pack into hash_hi at position r*8+c, rows 4-7 into
    hash_lo at (r-4)*8+c."""
    w, h = 9, 8
    raw = bytes(10 * x if x < 5 else 0 for y in range(h) for x in range(w))
    hi, lo = _dhash_bits(w, h, 1, raw)
    row_bits = 0b00001111  # bits c=0..3 set
    expected = sum(row_bits << (r * 8) for r in range(4))
    assert hi == expected and lo == expected


def test_dhash_area_downscale_is_exact_on_blocks():
    """18x16 RGB with equal channels and 2x2 constant blocks: luma and
    the floor-boundary downscale must both be exact, so the hash equals
    the direct 9x8 computation."""
    vals = [[(bx * 7 + by * 13) % 251 for bx in range(9)] for by in range(8)]
    raw = bytes(
        v
        for y in range(16)
        for x in range(18)
        for v in [vals[y // 2][x // 2]] * 3
    )
    direct = bytes(vals[r][c] for r in range(8) for c in range(9))
    assert _dhash_bits(18, 16, 3, raw) == _dhash_bits(9, 8, 1, direct)


def test_dhash_small_image_and_undecodable_are_null(spark):
    small = encode_png(4, 4, lambda x, y, c: 7)
    ok = encode_png(9, 8, lambda x, y, c: (x * 31 + y * 17) % 256)
    df = spark.createDataFrame(
        [(1, bytearray(small)), (2, bytearray(b"not an image")), (3, bytearray(ok))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in multimodal.image_dhash(df).collect()}
    assert rows[1]["hash_hi"] is None and rows[1]["width"] == 4
    assert rows[2]["hash_hi"] is None and rows[2]["width"] is None
    assert rows[3]["hash_hi"] is not None and rows[3]["hash_lo"] is not None


def test_dhash_gray_png_matches_rgb_png(spark):
    """Color type 0 grayscale and RGB with equal channels must hash
    identically (the BT.601 luma of (v,v,v) is v)."""
    pix = lambda x, y: (x * x * 5 + y * 11) % 256  # noqa: E731
    gray = encode_png(12, 10, lambda x, y, c: pix(x, y), channels=1)
    rgb = encode_png(12, 10, lambda x, y, c: pix(x, y), channels=3)
    df = spark.createDataFrame(
        [(1, bytearray(gray)), (2, bytearray(rgb))], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in multimodal.image_dhash(df).collect()}
    assert (rows[1]["hash_hi"], rows[1]["hash_lo"]) == (
        rows[2]["hash_hi"],
        rows[2]["hash_lo"],
    )


# ---------------------------------------------------------------------------
# Hamming-banded near-dup join
# ---------------------------------------------------------------------------


def _brute_pairs(hashes: dict[int, tuple[int, int]], max_dist: int):
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(
                (hashes[a][0] ^ hashes[b][0]) | ((hashes[a][1] ^ hashes[b][1]) << 32)
            ).count("1")
            if d <= max_dist:
                out.add((a, b, d))
    return out


@pytest.mark.parametrize("max_dist", [0, 1, 3, 7])
def test_hamming_banded_equals_bruteforce(spark, max_dist):
    """Adversarial hash set: exact duplicates, single-bit neighbours,
    band-boundary-straddling flips, and far pairs. The banded join must
    return EXACTLY the brute-force pair set for every max_dist."""
    import random

    rng = random.Random(42)
    hashes: dict[int, tuple[int, int]] = {}
    base = rng.getrandbits(64)
    for i in range(40):
        h = rng.getrandbits(64) if i % 4 == 0 else base
        if i % 4 == 1:
            h ^= 1 << (i % 64)  # single-bit neighbour
        elif i % 4 == 2:
            h ^= (1 << 15) | (1 << 16) | (1 << 47)  # straddles band bounds
        hashes[i] = (h >> 32, h & 0xFFFFFFFF)
    df = spark.createDataFrame(
        [(i, hi, lo) for i, (hi, lo) in hashes.items()],
        "doc_id long, hash_hi long, hash_lo long",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.hamming_neardup_pairs(df, max_dist=max_dist).collect()
    }
    assert got == _brute_pairs(hashes, max_dist)


def test_hamming_null_hashes_drop_and_bad_dist_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0), (3, None, None)],
        "doc_id long, hash_hi long, hash_lo long",
    )
    got = dedup.hamming_neardup_pairs(df, max_dist=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 0)]
    with pytest.raises(ValueError):
        dedup.hamming_neardup_pairs(df, max_dist=64)


def test_planted_neardup_pairs_all_found(spark):
    """Every planted (2k, 2k+1) fixture pair is within Hamming 2 and
    must appear in the max_dist=3 join output."""
    d = spark.range(60).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_neardup_png_payloads(d)
    hashed = multimodal.image_dhash(media)
    pairs = dedup.hamming_neardup_pairs(hashed, max_dist=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    for k in range(30):
        assert (2 * k, 2 * k + 1) in got, f"planted pair {2*k} missing"
        assert got[(2 * k, 2 * k + 1)] <= 2


# ---------------------------------------------------------------------------
# Audio VAD
# ---------------------------------------------------------------------------


def test_vad_segments_hand_computed(spark):
    """5 frames of 4 samples: active pattern 1,1,0,1,0 with known
    energies → two islands [0,1] and [3,3]."""
    frames = [[100, -100, 50, 0], [1, 0, 0, 0], [0, 0, 0, 0], [7, 7, 0, 0], [0, 0, 0, 0]]
    samples = [s for f in frames for s in f]
    wav = encode_wav_pcm16(8000, samples)
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    fr = multimodal.audio_vad_frames(df, frame_size=4)
    got = {r["frame_idx"]: (r["energy"], r["active"]) for r in fr.collect()}
    assert got == {
        0: (100 * 100 + 100 * 100 + 50 * 50, 1),
        1: (1, 1),
        2: (0, 0),
        3: (98, 1),
        4: (0, 0),
    }
    segs = multimodal.vad_segments(fr).collect()
    by_idx = {r["seg_idx"]: r for r in segs}
    assert len(by_idx) == 2
    assert (by_idx[1]["start_frame"], by_idx[1]["end_frame"], by_idx[1]["n_frames"]) == (0, 1, 2)
    assert by_idx[1]["seg_energy"] == 22501
    assert (by_idx[2]["start_frame"], by_idx[2]["end_frame"]) == (3, 3)


def test_vad_trailing_partial_frame_dropped_and_stereo_counts_frames(spark):
    # 10 mono samples at frame_size=4 → 2 full frames, 2 samples dropped
    wav = encode_wav_pcm16(8000, [1] * 10)
    # stereo: 4 wave frames (8 samples) at frame_size=2 → 2 analysis
    # frames, energy spans BOTH channels (4 samples each)
    st = encode_wav_pcm16(8000, [2, 3] * 4, n_channels=2)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(st))], "doc_id long, payload binary"
    )
    fr = multimodal.audio_vad_frames(df, frame_size=4).filter("doc_id = 1")
    assert fr.count() == 2
    fr2 = multimodal.audio_vad_frames(df, frame_size=2).filter("doc_id = 2")
    rows = {r["frame_idx"]: r["energy"] for r in fr2.collect()}
    assert rows == {0: 2 * (4 + 9), 1: 2 * (4 + 9)}


def test_vad_fixture_schedule_matches_kernel(spark):
    """The synthesizer's silence schedule and the decoded energies
    agree: silent frames have zero energy, active frames positive."""
    d = spark.range(8).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_vad_wav_payloads(d)
    fr = multimodal.audio_vad_frames(media, frame_size=160)
    for r in fr.collect():
        silent = (r["frame_idx"] ** 2 + r["frame_idx"] + r["doc_id"]) % 5 < 2
        assert (r["energy"] == 0) == silent
        assert r["active"] == (0 if silent else 1)


# ---------------------------------------------------------------------------
# Audio envelope near-dup
# ---------------------------------------------------------------------------


def test_audio_envelope_exact_and_bitlen_tiers(spark):
    from data_lake_skyfit_spark.llm.multimodal import (
        audio_energy_envelope,
        encode_wav_pcm16,
    )

    frames = [[100, 0, 0, 0], [0, 0, 0, 0], [3, 4, 0, 0]]
    wav = encode_wav_pcm16(8000, [s for f in frames for s in f])
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    exact = audio_energy_envelope(df, frame_size=4, quantize="exact").collect()[0]
    assert exact["envelope"] == "10000 0 25"
    # bitlen(e+1): 10001 (< 2^14) -> 14 bits, 1 -> 1 bit, 26 -> 5 bits
    bl = audio_energy_envelope(df, frame_size=4, quantize="bitlen").collect()[0]
    assert bl["envelope"] == "14 1 5"
    with pytest.raises(ValueError):
        audio_energy_envelope(df, quantize="log")


def test_audio_neardup_planted_pairs_found_and_far_pairs_absent(spark):
    from pyspark.sql import functions as F

    from data_lake_skyfit_spark.llm.dedup import jaccard_pairs_bruteforce
    from data_lake_skyfit_spark.llm.multimodal import (
        audio_energy_envelope,
        synthesize_neardup_wav_payloads,
    )

    d = spark.range(40).select(F.col("id").alias("doc_id"))
    media = synthesize_neardup_wav_payloads(d)
    env = audio_energy_envelope(media, quantize="exact")
    pairs = {
        (r["a_id"], r["b_id"])
        for r in jaccard_pairs_bruteforce(
            env, text_col="envelope", n=3, threshold=0.8
        ).collect()
    }
    assert pairs == {(2 * k, 2 * k + 1) for k in range(20)}


# ---------------------------------------------------------------------------
# Video near-dup (shared-frame sets)
# ---------------------------------------------------------------------------


def test_video_neardup_planted_pairs_and_thresholds(spark):
    from data_lake_skyfit_spark.llm.multimodal import (
        synthesize_neardup_avi_payloads,
        video_neardup_pairs,
    )

    d = spark.range(40).select(F.col("id").alias("doc_id"))
    media = synthesize_neardup_avi_payloads(d)
    got = {
        (r["a_id"], r["b_id"]): (r["inter"], r["size_a"], r["size_b"])
        for r in video_neardup_pairs(media, every_ms=1).collect()
    }
    assert set(got) == {(2 * k, 2 * k + 1) for k in range(20)}
    for k in range(20):
        n = 8 + k % 5
        assert got[(2 * k, 2 * k + 1)] == (n - 1, n, n)
    # raising the threshold past (n-1)/(n+1) empties the output
    high = video_neardup_pairs(media, every_ms=1, threshold_num=99, threshold_den=100)
    assert high.count() == 0


def test_hamming_index_incremental_equals_oneshot_and_replay(spark, tmp_path):
    """Batch-by-batch HammingIndex ingestion must reproduce the
    one-shot banded join exactly, and replaying a batch (idempotent
    MERGE) must not mint duplicate pairs on the next add."""
    d = spark.range(60).select(F.col("id").alias("doc_id"))
    hashed = multimodal.image_dhash(
        multimodal.synthesize_neardup_png_payloads(d)
    ).localCheckpoint(eager=False)
    oneshot = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.hamming_neardup_pairs(hashed, max_dist=3).collect()
    }
    idx = dedup.HammingIndex(str(tmp_path / "idx"), max_dist=3)
    b1 = hashed.filter("doc_id < 30")
    p1 = idx.add(b1).collect()
    p1_replay = idx.add(b1).collect()  # replay: same pairs, no dupes
    assert {tuple(r) for r in p1} == {tuple(r) for r in p1_replay}
    p2 = idx.add(hashed.filter("doc_id >= 30")).collect()
    got = {tuple(r) for r in p1} | {tuple(r) for r in p2}
    assert got == oneshot
    with pytest.raises(ValueError):
        dedup.HammingIndex(str(tmp_path / "bad"), max_dist=99)


def test_video_pixel_tier_catches_reencodes_byte_tier_misses(spark):
    """The r5 contrast pin: on the re-encoded MJPEG fixture (baseline
    vs progressive encodes of pixel-identical frames), the byte-md5
    tier finds ZERO pairs while the pixel tier finds every planted
    pair with the exact planted Jaccard."""
    from data_lake_skyfit_spark.llm import multimodal

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    media = multimodal.synthesize_neardup_mjpeg_payloads(docs).localCheckpoint(
        eager=False
    )
    byte_pairs = multimodal.video_neardup_pairs(
        media, every_ms=250, threshold_num=1, threshold_den=100,
        fingerprint="bytes",
    ).collect()
    assert byte_pairs == []  # different encoders: no shared wire bytes
    px = {
        (r["a_id"], r["b_id"]): r
        for r in multimodal.video_neardup_pairs(
            media, every_ms=250, threshold_num=6, threshold_den=10,
            fingerprint="pixels",
        ).collect()
    }
    assert set(px) == {(2 * k, 2 * k + 1) for k in range(10)}
    for k in range(10):
        nf = 5 + k % 4
        r = px[(2 * k, 2 * k + 1)]
        assert (r["inter"], r["size_a"], r["size_b"]) == (nf - 1, nf, nf)
        assert r["jaccard"] == (nf - 1) / (nf + 1)
