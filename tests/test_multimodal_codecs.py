"""Real stdlib media codecs: PCM WAV (`wave`/struct) and 24-bpp BMP.

Pins that decode_images / decode_audio perform actual byte-level
decoding when payloads carry real container magic (RIFF/WAVE, 'BM'),
while unrecognized formats still take the deterministic fake path
(schema-identical, null checksum columns). Reference analog: raw blob
handling at src/common/lake.py:59-71 — the reference stores media as
opaque bytes; this engine additionally decodes stdlib formats.
"""

from __future__ import annotations

import math
import struct

import pytest

from pyspark.sql import functions as F

from data_lake_skyfit_spark.llm import multimodal
from data_lake_skyfit_spark.llm.multimodal import (
    WAV_RATES,
    _aiff_samples,
    _decode_aiff,
    _decode_bmp,
    _decode_wav,
    _f80_decode_int,
    _f80_encode,
    encode_aiff_pcm16,
    encode_bmp24,
    encode_wav_pcm16,
)


def test_wav_roundtrip_exact():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    data = encode_wav_pcm16(22050, samples)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    sr, n, dur, ssum, rms = _decode_wav(data)
    assert (sr, n) == (22050, len(samples))
    assert dur == len(samples) * 1000 // 22050
    assert ssum == sum(samples)
    assert rms == math.sqrt(sum(s * s for s in samples) / len(samples))


def test_aiff_f80_wire_convention_golden():
    """The 80-bit-extended sampleRate bytes must match what real-world
    AIFF files carry (44100 → 40 0E AC 44 00…), not merely round-trip
    through our own codec — the GIF-LZW lesson applied to AIFF."""
    assert _f80_encode(44100).hex() == "400eac44000000000000"
    assert _f80_encode(48000).hex() == "400ebb80000000000000"
    assert _f80_encode(8000).hex() == "400bfa00000000000000"
    for r in (*WAV_RATES, 1, 11025, 96000, 192000):
        assert _f80_decode_int(_f80_encode(r)) == r
    # fractional / negative / NaN-exponent rates must raise, not truncate
    for bad in (
        struct.pack(">HQ", 16383, (3 << 62)),  # 1.5
        struct.pack(">HQ", 0x8000 | 16398, 0xAC44 << 48),  # -44100
        struct.pack(">HQ", 0x7FFF, 1 << 63),  # inf/NaN exponent
    ):
        try:
            _f80_decode_int(bad)
            raise AssertionError("non-integer f80 accepted")
        except ValueError:
            pass


def test_aiff_roundtrip_exact():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    data = encode_aiff_pcm16(22050, samples)
    assert data[:4] == b"FORM" and data[8:12] == b"AIFF"
    sr, n, dur, ssum, rms = _decode_aiff(data)
    assert (sr, n) == (22050, len(samples))
    assert dur == len(samples) * 1000 // 22050
    assert ssum == sum(samples)
    assert rms == math.sqrt(sum(s * s for s in samples) / len(samples))
    # stereo: n_samples counts all channels, duration counts FRAMES
    st = encode_aiff_pcm16(8000, samples[:6], n_channels=2)
    assert _decode_aiff(st)[:3] == (8000, 6, 3 * 1000 // 8000)


def test_aiff_corrupt_payloads_rejected_before_allocation():
    """Header-declared sizes validated against the actual payload (r4
    fuzz rule): a junk frame count or chunk size must raise ValueError,
    never allocate or unpack past the buffer."""
    good = encode_aiff_pcm16(8000, [7] * 40)
    # COMM declares 2^31 frames over a 40-sample SSND
    bad = bytearray(good)
    struct.pack_into(">L", bad, bad.find(b"COMM") + 8 + 2, 2**31)
    for payload in (
        bytes(bad),
        good[:40],  # truncated mid-chunk
        b"FORM" + struct.pack(">L", 4) + b"AIFF",  # no chunks at all
        good[:30] + b"\xff\xff\xff\xff" + good[34:],  # absurd chunk size
    ):
        try:
            _aiff_samples(payload)
            raise AssertionError("corrupt AIFF accepted")
        except ValueError:
            pass


def test_decode_audio_aiff_real_path_on_spark(spark):
    """decode_audio dispatches FORM/AIFF payloads to the real big-endian
    decoder — mixed WAV+AIFF batches both land on the real path."""
    df = spark.range(12).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_aiff_payloads(df, id_col="doc_id")
    out = {r["doc_id"]: r for r in multimodal.decode_audio(media).collect()}
    assert len(out) == 12
    for rid in (0, 5, 11):
        sr = WAV_RATES[(rid + 2) % 5]
        ch = 1 + rid % 2
        nf = 50 + rid % 89
        samples = [
            ((rid * 6007 + i * 31337) % 65536) - 32768 for i in range(nf * ch)
        ]
        r = out[rid]
        assert r["sample_rate"] == sr
        assert r["n_samples"] == nf * ch
        assert r["duration_ms"] == nf * 1000 // sr
        assert r["sample_sum"] == sum(samples)  # real decode → non-null
        assert r["rms"] == math.sqrt(sum(s * s for s in samples) / (nf * ch))


def test_bmp_roundtrip_skips_padding():
    # width 5 → 15 data bytes/row, row stride 16: one 0xFF pad byte per
    # row that a naive whole-array sum would wrongly include.
    w, h = 5, 3
    data = encode_bmp24(w, h, lambda x, y, c: (x + 10 * y + 100 * c) % 256)
    assert data[:2] == b"BM"
    row_stride = (w * 3 + 3) & ~3
    assert row_stride == 16 and row_stride > w * 3
    width, height, n_ch, psum = _decode_bmp(data)
    assert (width, height, n_ch) == (w, h, 3)
    expected = sum(
        (x + 10 * y + 100 * c) % 256
        for x in range(w)
        for y in range(h)
        for c in range(3)
    )
    assert psum == expected
    # whole-pixel-array sum (incl. padding) would differ:
    (data_offset,) = struct.unpack_from("<I", data, 10)
    assert sum(data[data_offset:]) == expected + h * 0xFF


def test_bmp_top_down_variant_decodes():
    # Negative height = top-down row order; decoder must abs() it.
    w, h = 4, 2
    bottom_up = encode_bmp24(w, h, lambda x, y, c: (x + y + c) % 256)
    hacked = bytearray(bottom_up)
    struct.pack_into("<i", hacked, 22, -h)
    width, height, n_ch, psum = _decode_bmp(bytes(hacked))
    assert (width, height, n_ch) == (w, h, 3)
    assert psum == _decode_bmp(bottom_up)[3]  # sum is row-order invariant


def test_decode_audio_real_path_on_spark(spark):
    df = spark.range(20).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_wav_payloads(df, id_col="doc_id")
    out = {r["doc_id"]: r for r in multimodal.decode_audio(media).collect()}
    assert len(out) == 20
    for rid in (0, 7, 19):
        sr = WAV_RATES[rid % 5]
        n = 64 + rid % 97
        samples = [((rid * 7919 + i * 104729) % 65536) - 32768 for i in range(n)]
        r = out[rid]
        assert r["sample_rate"] == sr
        assert r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // sr
        assert r["sample_sum"] == sum(samples)  # real decode → non-null
        assert r["rms"] == math.sqrt(sum(s * s for s in samples) / n)


def test_decode_images_real_path_on_spark(spark):
    df = spark.range(20).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_bmp_payloads(df, id_col="doc_id")
    out = {r["doc_id"]: r for r in multimodal.decode_images(media).collect()}
    for rid in (0, 5, 19):
        w, h = 4 + rid % 13, 4 + rid % 11
        r = out[rid]
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 3)
        assert r["pixel_sum"] == sum(
            (rid + 3 * x + 7 * y + c) % 256
            for x in range(w)
            for y in range(h)
            for c in range(3)
        )


def test_decode_fake_path_yields_null_checksums(spark):
    """Non-WAV/BMP payloads (plain text) fall back to the md5 fake path:
    same schema, null sample_sum/pixel_sum — the honest 'not decoded'
    marker."""
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    media = multimodal.attach_binary_payload(df, "text")
    arow = multimodal.decode_audio(media).collect()[0]
    assert arow["sample_sum"] is None and arow["sample_rate"] in WAV_RATES
    irow = multimodal.decode_images(media).collect()[0]
    assert irow["pixel_sum"] is None and 64 <= irow["width"] < 256


def test_bmp_resize_real_nearest_neighbor():
    from data_lake_skyfit_spark.llm.multimodal import _resize_bmp

    sw, sh, dw, dh = 7, 5, 3, 9  # down in x, up in y
    src = encode_bmp24(sw, sh, lambda x, y, c: (x * 11 + y * 17 + c) % 256)
    out = _resize_bmp(src, dw, dh)
    w, h, n_ch, psum = _decode_bmp(out)
    assert (w, h, n_ch) == (dw, dh, 3)
    expected = sum(
        ((x * sw // dw) * 11 + (y * sh // dh) * 17 + c) % 256
        for x in range(dw)
        for y in range(dh)
        for c in range(3)
    )
    assert psum == expected


def test_bmp_resize_identity_preserves_pixels():
    from data_lake_skyfit_spark.llm.multimodal import _resize_bmp

    src = encode_bmp24(6, 4, lambda x, y, c: (x + 10 * y + 100 * c) % 256)
    assert _decode_bmp(_resize_bmp(src, 6, 4))[3] == _decode_bmp(src)[3]


def test_wav_decimation_real():
    from data_lake_skyfit_spark.llm.multimodal import _decimate_wav

    samples = [((i * 104729) % 65536) - 32768 for i in range(101)]
    src = encode_wav_pcm16(44100, samples)
    out = _decimate_wav(src, 4)
    sr, n, dur, ssum, rms = _decode_wav(out)
    kept = samples[::4]
    assert sr == 11025
    assert n == len(kept) == 26
    assert ssum == sum(kept)
    assert rms == math.sqrt(sum(s * s for s in kept) / len(kept))


def test_resample_audio_real_path_on_spark(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_wav_payloads(df, id_col="doc_id")
    out = {r["doc_id"]: r for r in multimodal.resample_audio(media, factor=4).collect()}
    for rid in (0, 7, 9):
        n0 = 64 + rid % 97
        assert out[rid]["sample_rate"] == WAV_RATES[rid % 5] // 4
        assert out[rid]["n_samples"] == (n0 + 3) // 4
        # and the payload is a REAL re-encoded WAV
        assert bytes(out[rid]["payload"])[:4] == b"RIFF"


def test_avi_roundtrip_real():
    import hashlib

    from data_lake_skyfit_spark.llm.multimodal import (
        _decode_avi_frames,
        encode_avi_dib,
    )

    frames = [f"frame-{i}-".encode() * 10 for i in range(7)]
    data = encode_avi_dib(8, 4, 250_000, frames)  # 4 fps
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    got = _decode_avi_frames(data, 1000)  # 1 frame per second → every 4th
    assert got == [
        (i, i * 250, hashlib.md5(frames[i]).hexdigest()) for i in (0, 4)
    ]
    # every_ms below frame period samples every frame
    assert len(_decode_avi_frames(data, 1)) == 7


def test_sample_video_frames_real_path_on_spark(spark):
    import hashlib

    df = spark.range(12).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_avi_payloads(df, id_col="doc_id")
    out = multimodal.sample_video_frames(media, every_ms=1000).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rid in (0, 5, 11):
        w, h, nf = 4 * (1 + rid % 3), 3 + rid % 4, 3 + rid % 6
        nbytes = w * h * 3
        rows = sorted(by_doc[rid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == list(range(0, nf, 2))
        for r in rows:
            frame = (f"doc{rid}f{r['frame_idx']}x".encode() * nbytes)[:nbytes]
            assert r["frame_md5"] == hashlib.md5(frame).hexdigest()
            assert r["ts_ms"] == r["frame_idx"] * 500


def test_png_roundtrip_all_filter_types():
    from data_lake_skyfit_spark.llm.multimodal import _decode_png, encode_png

    px = lambda x, y, c: (x * 31 + y * 57 + c * 11) % 256  # noqa: E731
    expected = sum(px(x, y, c) for x in range(7) for y in range(6) for c in range(3))
    # Each scanline filter type alone, then the cycling default (which
    # uses all five in one image) — decode must reverse every one.
    for ft in range(5):
        data = encode_png(7, 6, px, row_filter=lambda y, ft=ft: ft)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert _decode_png(data) == (7, 6, 3, expected)
    assert _decode_png(encode_png(7, 6, px)) == (7, 6, 3, expected)


def test_png_idat_is_really_compressed():
    """The IDAT stream must be zlib-deflated — a constant image deflates
    far below raw size, proving decode exercises real inflation."""
    from data_lake_skyfit_spark.llm.multimodal import _decode_png, encode_png

    w = h = 32
    data = encode_png(w, h, lambda x, y, c: 77, row_filter=lambda y: 0)
    assert len(data) < w * h * 3 // 4  # raw pixels would be 3072 bytes
    assert _decode_png(data) == (w, h, 3, w * h * 3 * 77)


def test_png_grayscale_decodes():
    from data_lake_skyfit_spark.llm.multimodal import _decode_png, encode_png

    g = encode_png(5, 4, lambda x, y, c: (x + 5 * y) % 256, channels=1)
    assert _decode_png(g) == (
        5, 4, 1, sum((x + 5 * y) % 256 for x in range(5) for y in range(4))
    )


def test_png_crc_tamper_rejected_falls_to_fake_path(spark):
    """Flipping a byte inside IDAT breaks the chunk CRC: the strict
    decoder raises, and the Spark kernel downgrades to the fake path
    (null pixel_sum) instead of returning silently corrupt sums."""
    from data_lake_skyfit_spark.llm.multimodal import _decode_png, encode_png

    data = bytearray(encode_png(6, 5, lambda x, y, c: (x + y + c) % 256))
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 6] ^= 0xFF
    import pytest

    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(data))
    df = spark.createDataFrame([(1, bytearray(data))], "doc_id long, payload binary")
    row = multimodal.decode_images(df).collect()[0]
    assert row["pixel_sum"] is None


def test_png_resize_real_nearest_neighbor():
    from data_lake_skyfit_spark.llm.multimodal import (
        _decode_png,
        _resize_png,
        encode_png,
    )

    sw, sh, dw, dh = 9, 5, 4, 11  # down in x, up in y
    src = encode_png(sw, sh, lambda x, y, c: (x * 11 + y * 17 + c) % 256)
    out = _resize_png(src, dw, dh)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"  # re-encoded as real PNG
    expected = sum(
        ((x * sw // dw) * 11 + (y * sh // dh) * 17 + c) % 256
        for x in range(dw)
        for y in range(dh)
        for c in range(3)
    )
    assert _decode_png(out) == (dw, dh, 3, expected)


def test_decode_png_real_path_on_spark(spark):
    df = spark.range(25).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_png_payloads(df, id_col="doc_id")
    out = {r["doc_id"]: r for r in multimodal.decode_images(media).collect()}
    for rid in (0, 6, 24):
        w, h = 4 + rid % 17, 4 + rid % 15
        r = out[rid]
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 3)
        assert r["pixel_sum"] == sum(
            (5 * rid + 11 * x + 13 * y + 17 * c) % 256
            for x in range(w)
            for y in range(h)
            for c in range(3)
        )


def test_magic_prefixed_garbage_takes_fake_path(spark):
    """code-review r3: payloads that merely START with container magic
    ('BM...', 'RIFF..WAVE', 'RIFF..AVI ') but aren't valid media must
    fall back to the fake path, not crash the kernel — regenerated
    testdata text can legally begin with any bytes."""
    rows = [
        (1, "BMI readings for the cohort were stable this quarter...."),
        (2, "RIFFxxxxWAVEgarbage-that-is-not-a-real-wave-file-at-all!"),
        (3, "RIFFxxxxAVI garbage-that-is-not-a-real-avi-container...!!"),
        (4, "FORMxxxxAIFFgarbage-that-is-not-a-real-aiff-payload-4u!!"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    media = multimodal.attach_binary_payload(df, "text")
    imgs = {r["doc_id"]: r for r in multimodal.decode_images(media).collect()}
    assert imgs[1]["pixel_sum"] is None  # fake path marker
    auds = {r["doc_id"]: r for r in multimodal.decode_audio(media).collect()}
    assert auds[2]["sample_sum"] is None
    assert auds[4]["sample_sum"] is None
    frames = multimodal.sample_video_frames(media).collect()
    assert len(frames) > 0
    resized = multimodal.resize_images(media, width=8, height=8).collect()
    assert all(len(bytes(r["payload"])) == 64 for r in resized)  # fake tiling


def test_lzw_roundtrip_growth_reset_and_kwkwk():
    """The GIF LZW pair must survive code-width growth (9->12 bits),
    a dictionary reset at 4096, and the KwKwK self-reference pattern."""
    import random

    from data_lake_skyfit_spark.llm.multimodal import _lzw_decode, _lzw_encode

    rng = random.Random(11)
    cases = [
        b"",
        b"\x00",
        b"aaaaaaaaaaaaaaaa",            # immediate KwKwK chains
        bytes([1, 2] * 8000),            # compressible, spans a reset
        bytes(rng.randrange(256) for _ in range(12000)),  # incompressible, spans resets
    ]
    for payload in cases:
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_gif_decode_matches_closed_form(spark):
    from data_lake_skyfit_spark.llm import multimodal

    d = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = multimodal.synthesize_gif_payloads(d)
    out = {r["doc_id"]: r for r in multimodal.decode_images(media).collect()}
    for rid in range(40):
        w, h = 4 + rid % 14, 4 + rid % 12
        r = out[rid]
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 3)
        assert r["pixel_sum"] == 3 * sum(
            (3 * rid + 5 * x + 7 * y) % 256 for x in range(w) for y in range(h)
        )


def test_gif_large_image_spans_lzw_reset():
    """A 90x70 image produces >4096 dictionary entries, forcing the
    encoder's mid-stream clear; the decoder must resync."""
    from data_lake_skyfit_spark.llm.multimodal import _decode_gif, encode_gif

    px = lambda x, y: (x * x + 3 * y) % 256  # noqa: E731
    w, h, ch, s = _decode_gif(encode_gif(90, 70, px))
    assert (w, h, ch) == (90, 70, 3)
    assert s == 3 * sum(px(x, y) for x in range(90) for y in range(70))


def test_gif_prefixed_garbage_takes_fake_path(spark):
    from data_lake_skyfit_spark.llm import multimodal

    df = spark.createDataFrame(
        [(1, "GIF87a but this is actually just text, not an image....")],
        ["doc_id", "text"],
    )
    media = multimodal.attach_binary_payload(df, "text")
    out = multimodal.decode_images(media).collect()[0]
    assert out["pixel_sum"] is None


def test_gif_resize_roundtrip_integer_exact(spark):
    """resize_images routes GIF through the real LZW decode→re-encode
    path; decoding the resized payload must equal the closed-form
    nearest-neighbor sample of the source indices."""
    from data_lake_skyfit_spark.llm import multimodal
    from data_lake_skyfit_spark.llm.multimodal import _gif_pixels, encode_gif

    rid = 7
    sw, sh = 4 + rid % 14, 4 + rid % 12
    d = spark.createDataFrame([(rid,)], ["doc_id"])
    media = multimodal.synthesize_gif_payloads(d)
    out = multimodal.resize_images(media, width=6, height=5).collect()[0]
    w, h, _pal, idx = _gif_pixels(bytes(out["payload"]))
    assert (w, h) == (6, 5)
    src = lambda x, y: (3 * rid + 5 * x + 7 * y) % 256  # noqa: E731
    for y in range(5):
        for x in range(6):
            assert idx[y * 6 + x] == src(x * sw // 6, y * sh // 5)


def test_gif_lzw_standard_convention_golden():
    """Pins the exact LZW bitstream convention (code-review r3): the
    encoder bumps code width at next_code == 2^w + 1 and the decoder at
    table length == 2^w — the GIF-standard pairing, verified against 32
    real-world GIF87a/89a files (tk/idle icon sets) at fix time. A
    self-consistent-but-off-by-one codec round-trips fine, so only a
    byte-level golden catches a convention regression."""
    import hashlib

    from data_lake_skyfit_spark.llm.multimodal import _lzw_encode, encode_gif

    payload = bytes((i * 37 + (i >> 3)) % 256 for i in range(4000))
    assert hashlib.md5(_lzw_encode(payload)).hexdigest() == (
        "66d255f2e0edf2c344288bfef6490271"
    )
    g = encode_gif(40, 30, lambda x, y: (x * 7 + y * 11) % 256)
    assert hashlib.md5(g).hexdigest() == "ba1c26e8dfc2559c7704007ab3d92b1b"


def test_gif_truncated_payload_rejected_cleanly():
    """A GIF cut mid-sub-block must raise ValueError (-> fake-path
    fallback in decode_images), never IndexError."""
    import pytest

    from data_lake_skyfit_spark.llm.multimodal import _gif_pixels, encode_gif

    g = encode_gif(20, 20, lambda x, y: (x + y) % 256)
    with pytest.raises(ValueError):
        _gif_pixels(g[: len(g) - len(g) // 3])


def test_gif_resize_preserves_color_palette():
    """code-review r3: a non-grayscale GIF resized must keep its colors
    — the source global color table is carried into the re-encode."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _decode_gif,
        _gif_pixels,
        _resize_gif,
        encode_gif,
    )

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    src = encode_gif(8, 6, lambda x, y: (x + y) % 4, palette=pal)
    out = _resize_gif(src, 4, 3)
    w, h, out_pal, idx = _gif_pixels(out)
    assert (w, h) == (4, 3)
    assert out_pal[:4] == pal
    # pixel_sum uses resolved colors, not raw indices
    _, _, _, s = _decode_gif(out)
    assert s == sum(sum(pal[i]) for i in idx)


def test_gif_interlaced_and_local_palette():
    """Interlaced GIFs (rows stored in the four-pass order) and local
    color tables must decode: pixels land on their true rows and the
    local palette overrides the global one."""
    import struct

    from data_lake_skyfit_spark.llm.multimodal import _gif_pixels, _lzw_encode

    w, h = 13, 19
    px = lambda x, y: (x * 3 + y * 5) % 256  # noqa: E731

    def encode_interlaced(local_pal=None):
        hdr = b"GIF87a" + struct.pack("<HH", w, h) + bytes([0xF7, 0, 0])
        gct = bytes(v for i in range(256) for v in (i, i, i))
        ipacked = 0x40 | (0x80 | 0x07 if local_pal else 0)
        desc = b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
        lct = (
            bytes(v for i in range(256) for v in ((i * 2) % 256, i, 255 - i))
            if local_pal
            else b""
        )
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = bytes(px(x, y) & 0xFF for y in order for x in range(w))
        lzw = _lzw_encode(idx)
        blocks = bytearray([8])
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            blocks.append(len(c))
            blocks += c
        blocks.append(0)
        return hdr + gct + desc + lct + bytes(blocks) + b"\x3B"

    W, H, pal, idx = _gif_pixels(encode_interlaced())
    assert (W, H) == (w, h)
    assert all(idx[y * w + x] == px(x, y) for x in range(w) for y in range(h))

    _, _, pal2, idx2 = _gif_pixels(encode_interlaced(local_pal=True))
    assert pal2[10] == (20, 10, 245)  # local table won
    assert idx2 == idx


def test_extract_embeddings_real_features_from_decoded_bytes(spark):
    """Decodable payloads get REAL content-derived features (computed
    from the decoded channel bytes), not md5 bytes: pinned against a
    hand computation for a BMP, and the md5 fake path still serves
    undecodable payloads."""
    import hashlib
    import math

    from data_lake_skyfit_spark.llm import multimodal

    d = spark.createDataFrame([(3,)], ["doc_id"])
    media = multimodal.synthesize_bmp_payloads(d)
    feats = multimodal.extract_embeddings(media).collect()[0]["features"]
    w, h = 4 + 3 % 13, 4 + 3 % 11
    vals = [
        (3 + 3 * x + 7 * y + c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    ]
    n = len(vals)
    assert feats[0:3] == [float(w), float(h), 3.0]
    assert feats[3] == sum(vals) / n
    assert feats[4] == math.sqrt(sum(v * v for v in vals) / n)
    assert feats[5] == sum(1 for v in vals if v > 127) / n
    assert feats[6] == float(min(vals)) and feats[7] == float(max(vals))

    txt = spark.createDataFrame([(9, "just some text payload")], ["doc_id", "text"])
    fb = multimodal.extract_embeddings(
        multimodal.attach_binary_payload(txt, "text")
    ).collect()[0]["features"]
    want = [x / 255.0 for x in hashlib.md5(b"just some text payload").digest()[:8]]
    assert fb == want


def test_extract_embeddings_real_audio_features(spark):
    """WAV payloads get features computed from the actual PCM samples."""
    import math

    from data_lake_skyfit_spark.llm import multimodal

    rid = 7
    d = spark.createDataFrame([(rid,)], ["doc_id"])
    media = multimodal.synthesize_wav_payloads(d)
    f = multimodal.extract_embeddings(media).collect()[0]["features"]
    sr = multimodal.WAV_RATES[rid % 5]
    n = 64 + rid % 97
    s = [((rid * 7919 + i * 104729) % 65536) - 32768 for i in range(n)]
    zc = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
    assert f[0:3] == [float(sr), float(n), float(n * 1000 // sr)]
    assert f[3] == sum(s) / n
    assert f[4] == math.sqrt(sum(v * v for v in s) / n)
    assert f[5] == zc / (n - 1)
    assert (f[6], f[7]) == (float(min(s)), float(max(s)))


def test_extract_embeddings_real_video_features(spark):
    """AVI payloads get features computed from the actual frame bytes."""
    import math

    import numpy as np

    from data_lake_skyfit_spark.llm import multimodal

    rid = 3
    d = spark.createDataFrame([(rid,)], ["doc_id"])
    media = multimodal.synthesize_avi_payloads(d)
    f = multimodal.extract_embeddings(media).collect()[0]["features"]
    w, h, nf = 4 * (1 + rid % 3), 3 + rid % 4, 3 + rid % 6
    npx = w * h * 3
    raw = b"".join(
        (f"doc{rid}f{i}x".encode() * (npx // len(f"doc{rid}f{i}x") + 1))[:npx]
        for i in range(nf)
    )
    arr = np.frombuffer(raw, np.uint8).astype(np.int64)
    n = len(arr)
    assert f[0:3] == [float(nf), 2.0, float(nf * 500)]
    assert f[3] == int(arr.sum()) / n
    assert f[4] == math.sqrt(int((arr * arr).sum()) / n)
    assert f[5] == 0.0
    assert (f[6], f[7]) == (float(arr.min()), float(arr.max()))


def test_corrupt_timing_headers_take_fake_path(spark):
    """code-review r3: a WAV declaring sample_rate=0 or an AVI declaring
    dwMicroSecPerFrame=0 must fall to the fake feature path (and raise
    ValueError from the low-level walkers), never ZeroDivisionError."""
    import hashlib
    import struct as st

    import pytest

    from data_lake_skyfit_spark.llm import multimodal
    from data_lake_skyfit_spark.llm.multimodal import (
        _avi_frames,
        _wav_samples,
        encode_avi_dib,
        encode_wav_pcm16,
    )

    wav = bytearray(encode_wav_pcm16(8000, [1, -2, 3]))
    # fmt chunk sample rate lives at offset 24 in this minimal layout
    assert st.unpack_from("<I", wav, 24)[0] == 8000
    st.pack_into("<I", wav, 24, 0)
    with pytest.raises(ValueError):
        _wav_samples(bytes(wav))

    avi = bytearray(encode_avi_dib(4, 3, 500_000, [b"x" * 36]))
    pos = avi.find(b"avih") + 8
    assert st.unpack_from("<I", avi, pos)[0] > 0
    st.pack_into("<I", avi, pos, 0)
    with pytest.raises(ValueError):
        _avi_frames(bytes(avi))

    rows = [(1, bytes(wav)), (2, bytes(avi))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["features"] for r in
           multimodal.extract_embeddings(df).collect()}
    for i, payload in rows:
        want = [x / 255.0 for x in hashlib.md5(payload).digest()[:8]]
        assert out[i] == want


# ---------------------------------------------------------------------------
# Baseline JPEG codec (round 4)
# ---------------------------------------------------------------------------


def _jpeg_block_y(rid):
    return lambda x, y: (3 * rid + 5 * (x // 8) + 7 * (y // 8)) % 256


def test_jpeg_tables_wellformed():
    """Wire-table invariants: zigzag is a permutation of 0..63; the
    Annex K specs carry 12 DC / 162 AC symbols; the decoder's DHT
    builder exactly inverts the encoder's canonical code assignment."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _JPEG_AC_CHROMA, _JPEG_AC_LUMA, _JPEG_DC_CHROMA, _JPEG_DC_LUMA,
        _JPEG_ZIGZAG, _jpeg_huff_decode_table, _jpeg_huff_encode_codes,
    )

    assert sorted(_JPEG_ZIGZAG) == list(range(64))
    for spec, n in (
        (_JPEG_DC_LUMA, 12), (_JPEG_DC_CHROMA, 12),
        (_JPEG_AC_LUMA, 162), (_JPEG_AC_CHROMA, 162),
    ):
        bits, vals = spec
        assert sum(bits) == len(vals) == n
        assert len(set(vals)) == n
        enc = _jpeg_huff_encode_codes(spec)
        dec = _jpeg_huff_decode_table(list(bits), list(vals))
        assert {(ln, code): sym for sym, (code, ln) in enc.items()} == dec


def test_jpeg_roundtrip_block_constant_exact():
    """All three fixture variants decode EXACTLY (DC step 8 divides the
    constant-block DC coefficient): gray, 4:4:4 neutral chroma, 4:2:0
    non-trivial chroma through the real entropy-coded pipeline."""
    from data_lake_skyfit_spark.llm.multimodal import _decode_jpeg, encode_jpeg

    for rid in (0, 7, 123):  # gray
        w, h = 8 * (1 + rid % 5), 8 * (1 + rid % 4)
        got = _decode_jpeg(encode_jpeg(w, h, _jpeg_block_y(rid)))
        exp = sum(
            64 * ((3 * rid + 5 * bx + 7 * by) % 256)
            for bx in range(w // 8) for by in range(h // 8)
        )
        assert got == (w, h, 1, exp)
    for rid in (1, 10):  # 4:4:4, chroma 128 -> RGB = (y, y, y)
        w, h = 8 * (1 + rid % 5), 8 * (1 + rid % 4)
        got = _decode_jpeg(encode_jpeg(w, h, _jpeg_block_y(rid), color=True))
        exp = 3 * sum(
            64 * ((3 * rid + 5 * bx + 7 * by) % 256)
            for bx in range(w // 8) for by in range(h // 8)
        )
        assert got == (w, h, 3, exp)
    for rid in (2, 47):  # 4:2:0 with real chroma offsets
        w, h = 16 * (1 + (rid % 5) % 2), 16 * (1 + (rid % 7) % 2)
        cb, cr = 126 + rid % 5, 125 + rid % 7
        got = _decode_jpeg(
            encode_jpeg(w, h, _jpeg_block_y(rid), color=True, subsample=True,
                        cb=cb, cr=cr)
        )
        exp = 0
        for bx in range(w // 8):
            for by in range(h // 8):
                yv = (3 * rid + 5 * bx + 7 * by) % 256
                r = min(255, max(0, math.floor(yv + 1.402 * (cr - 128) + 0.5)))
                g = min(255, max(0, math.floor(
                    yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
                b = min(255, max(0, math.floor(yv + 1.772 * (cb - 128) + 0.5)))
                exp += 64 * (r + g + b)
        assert got == (w, h, 3, exp)


def test_jpeg_handbuilt_bitstream_golden():
    """Decoder validated against a stream assembled BYTE-BY-BYTE from
    the T.81 spec in this test — no encoder involved, so a private
    encoder/decoder convention cannot self-validate (the GIF-LZW
    lesson). 8x8 gray, uniform quant 1, custom 1-entry Huffman tables:
    DC table {cat 6: code '0'}, AC table {EOB: code '0'}; entropy bits
    '0' + '100101' (DC=37) + '0' (EOB) = 0x4A. Dequantized DC 37 ->
    constant plane 37/8 + 128 = 132.625 -> floor(+0.5) = 133."""
    from data_lake_skyfit_spark.llm.multimodal import _jpeg_pixels

    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    sof = b"\xff\xc0" + (11).to_bytes(2, "big") + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    dht_dc = b"\xff\xc4" + (20).to_bytes(2, "big") + bytes(
        [0x00, 1] + [0] * 15 + [6]
    )
    dht_ac = b"\xff\xc4" + (20).to_bytes(2, "big") + bytes(
        [0x10, 1] + [0] * 15 + [0x00]
    )
    sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])
    data = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes([0x4A])
        + b"\xff\xd9"
    )
    w, h, ch, raw = _jpeg_pixels(data)
    assert (w, h, ch) == (8, 8, 1)
    assert set(raw) == {133} and len(raw) == 64


def test_jpeg_ac_entropy_matches_independent_quant_model():
    """General (non-block-constant) content: the decoder must equal an
    INDEPENDENTLY coded quantization model round(IDCT(Q*round(DCT/Q)))
    built here with explicit loops — exercises nonzero-AC run-length
    coding, and the checkerboard block forces zigzag runs > 15 (ZRL)."""
    import numpy as np

    from data_lake_skyfit_spark.llm.multimodal import (
        _JPEG_QT_LUMA, _jpeg_pixels, encode_jpeg,
    )

    def pix(x, y):
        if x < 8 and y < 8:  # checkerboard: only high-frequency ACs
            return 60 if (x + y) % 2 else 200
        return (x * 37 + y * 11) % 256

    data = encode_jpeg(16, 16, pix)
    w, h, ch, raw = _jpeg_pixels(data)
    assert (w, h, ch) == (16, 16, 1)

    # independent model (loop-built DCT basis, not the module's matrix)
    m = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            c = (1 / math.sqrt(2)) if u == 0 else 1.0
            m[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    q = np.array(_JPEG_QT_LUMA, dtype=float).reshape(8, 8)
    img = np.array([[pix(x, y) for x in range(16)] for y in range(16)], float)
    exp = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = np.floor((m @ blk @ m.T) / q + 0.5) * q
            exp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                np.floor(m.T @ coef @ m + 128.0 + 0.5), 0, 255
            )
    got = np.frombuffer(raw, dtype=np.uint8).reshape(16, 16)
    assert (got == exp.astype(np.uint8)).all()


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn wire path: encoder emits restart markers, decoder
    resyncs (byte-align + DC predictor reset) and still decodes
    exactly; the markers really are on the wire."""
    from data_lake_skyfit_spark.llm.multimodal import _decode_jpeg, encode_jpeg

    data = encode_jpeg(32, 24, _jpeg_block_y(9), restart_interval=1)
    assert b"\xff\xdd" in data
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    w, h, ch, s = _decode_jpeg(data)
    exp = sum(
        64 * ((27 + 5 * bx + 7 * by) % 256) for bx in range(4) for by in range(3)
    )
    assert (w, h, ch, s) == (32, 24, 1, exp)


def test_jpeg_invalid_sof_variants_fall_to_fake_path(spark):
    """Streams the decoder cannot honestly decode must not silently
    half-decode: a baseline bitstream MISLABELED as SOF2 trips the
    progressive scan-header validation (Ss=0 requires Se=0), and an
    arithmetic-coded SOF (0xC9) is rejected outright — both serve the
    documented fake path (null pixel_sum)."""
    from data_lake_skyfit_spark.llm.multimodal import decode_images, encode_jpeg

    good = encode_jpeg(8, 8, lambda x, y: 99)
    mislabeled = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    arithmetic = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(mislabeled)), (3, bytearray(arithmetic))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert rows[1]["pixel_sum"] == 64 * 99 and rows[1]["n_channels"] == 1
    assert rows[2]["pixel_sum"] is None
    assert rows[3]["pixel_sum"] is None


def test_jpeg_progressive_equals_baseline_decode():
    """SOF2 progressive streams (DC first Al=1 → DC refine → per-comp
    AC first Al=1 → AC refine) must reconstruct the EXACT coefficients
    of the baseline encoding of the same image: decoded pixels are
    byte-identical across content that exercises every scan path —
    nonzero-AC runs, ZRL, cross-block EOBRUN, correction bits, chroma
    subsampling."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _jpeg_pixels, encode_jpeg, encode_jpeg_progressive,
    )

    cases = [
        ("const", 16, 24, lambda x, y: (21 + 5 * (x // 8) + 7 * (y // 8)) % 256, {}),
        ("grad", 24, 16, lambda x, y: (x * 37 + y * 11) % 256, {}),
        ("checker", 16, 16, lambda x, y: 60 if (x + y) % 2 else 200, {}),
        ("noise", 40, 40, lambda x, y: (x * x * 7 + y * y * 13 + x * y * 3) % 256, {}),
        ("c444", 16, 16, lambda x, y: (x * 5 + y * 3) % 256, {"color": True}),
        ("c420", 32, 16, lambda x, y: (x * 7 + y * 13) % 256,
         {"color": True, "subsample": True, "cb": 130, "cr": 121}),
        ("eobruns", 48, 48, lambda x, y: 128 if x >= 8 else (x * 31 + y * 17) % 256, {}),
    ]
    for name, w, h, pix, kw in cases:
        base = _jpeg_pixels(encode_jpeg(w, h, pix, **kw))
        pb = encode_jpeg_progressive(w, h, pix, **kw)
        assert b"\xff\xc2" in pb and pb.count(b"\xff\xda") >= 4
        assert base == _jpeg_pixels(pb), name


def test_jpeg_progressive_custom_scan_script():
    """Arbitrary spectral-band splits and chained successive
    approximation (Al 2 → 1 → 0) through the same machinery — the scan
    script is data, not structure."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _jpeg_pixels, encode_jpeg, encode_jpeg_progressive,
    )

    pix = lambda x, y: (x * 29 + y * 23 + (x * y) % 7) % 256  # noqa: E731
    scans = [
        ((0,), 0, 0, 0, 2), ((0,), 0, 0, 2, 1), ((0,), 0, 0, 1, 0),
        ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
        ((0,), 1, 5, 2, 1), ((0,), 6, 63, 2, 1),
        ((0,), 1, 5, 1, 0), ((0,), 6, 63, 1, 0),
    ]
    base = _jpeg_pixels(encode_jpeg(24, 24, pix))
    prog = _jpeg_pixels(encode_jpeg_progressive(24, 24, pix, scans=scans))
    assert base == prog


def test_jpeg_progressive_handbuilt_scans_golden():
    """Progressive wire convention pinned WITHOUT the encoder: a 2-block
    grayscale SOF2 stream assembled byte-by-byte — DC first scan at
    Al=1 (diffs 2, -1 → values 4, 2 after shift... see bits), DC refine
    adding low bits, AC first scan with an EOB2 run covering both
    blocks. Tables are 1-2 entry customs so every bit is hand-checkable.

    DC first (Al=1): blk0 diff=3 (cat 2, bits '11'), blk1 diff=-2
    (cat 2, bits '01') → DC<<1 = 6, 2. DC refine (Al=0): bits 1, 0 →
    DC = 7, 2. AC first: EOB2 = code for (r=1,s=0) + 0 extra bits
    (eobrun=2 covers both blocks, all ACs zero).
    DC table {2: '0'}; AC table {0x10: '0'}."""
    from data_lake_skyfit_spark.llm.multimodal import _jpeg_pixels

    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + bytes([1] * 64)
    sof = b"\xff\xc2" + (11).to_bytes(2, "big") + bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0])
    dht_dc = b"\xff\xc4" + (20).to_bytes(2, "big") + bytes([0x00, 1] + [0] * 15 + [2])
    dht_ac = b"\xff\xc4" + (20).to_bytes(2, "big") + bytes([0x10, 1] + [0] * 15 + [0x10])
    sos_hdr = lambda ss, se, ahal: (  # noqa: E731
        b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, ss, se, ahal])
    )
    # DC first Al=1: code '0' + bits '11' (diff +3) | code '0' + bits
    # '01' (extend → -2, pred 3-2=1) → 0 11 0 01 + pad 11 = 0x67.
    # Coefs after shift: blk0 = 3<<1 = 6, blk1 = 1<<1 = 2.
    scan1 = sos_hdr(0, 0, 0x01) + bytes([0x67])
    # DC refine Ah=1 Al=0: raw bits 1, 0 → blk0 = 7, blk1 = 2; 10+pad = 0xBF
    scan2 = sos_hdr(0, 0, 0x10) + bytes([0xBF])
    # AC first 1..63 Al=0: EOB2 (r=1): code '0' + 1 extension bit '0'
    # (eobrun = 2^1 - 1 + 0, covers this block + the next) → 00 pad 1s = 0x3F
    scan3 = sos_hdr(1, 63, 0x00) + bytes([0x3F])
    data = b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + scan1 + scan2 + scan3 + b"\xff\xd9"
    w, h, ch, raw = _jpeg_pixels(data)
    assert (w, h, ch) == (16, 8, 1)  # two blocks side by side
    # blk0 DC=7, qt 1 → constant floor(7/8 + 128 + 0.5) = 129
    # blk1 DC=2 → floor(0.25 + 128.5) = 128
    assert raw[:8] == bytes([129] * 8)
    assert raw[8:16] == bytes([128] * 8)
    assert set(raw[::2]) <= {129, 128}


def test_jpeg_extract_embeddings_real_features(spark):
    """Image features must come from the ACTUAL decoded JPEG bytes:
    pinned against a hand computation for one grayscale payload."""
    from data_lake_skyfit_spark.llm.multimodal import encode_jpeg, extract_embeddings

    rid = 6  # gray variant: w=16, h=24, blocks 2x3
    w, h = 8 * (1 + rid % 5), 8 * (1 + rid % 4)
    payload = encode_jpeg(w, h, _jpeg_block_y(rid))
    df = spark.createDataFrame([(rid, bytearray(payload))], "doc_id long, payload binary")
    feats = extract_embeddings(df).collect()[0]["features"]
    vals = [
        (3 * rid + 5 * bx + 7 * by) % 256
        for bx in range(w // 8) for by in range(h // 8)
    ]
    n = w * h
    ssum = 64 * sum(vals)
    ssq = 64 * sum(v * v for v in vals)
    assert feats[0] == float(w) and feats[1] == float(h) and feats[2] == 1.0
    assert feats[3] == ssum / n
    assert feats[4] == math.sqrt(ssq / n)
    assert feats[5] == 64 * sum(1 for v in vals if v > 127) / n
    assert feats[6] == float(min(vals)) and feats[7] == float(max(vals))


def test_jpeg_encoder_byte_golden():
    """Byte-level regression pin of the encoder's wire output (marker
    layout, table emission order, entropy bits, stuffing) — catches any
    silent convention drift on either side of the codec."""
    import hashlib

    from data_lake_skyfit_spark.llm.multimodal import encode_jpeg

    gray = encode_jpeg(16, 8, lambda x, y: (x * 7 + y * 13) % 256)
    color = encode_jpeg(
        16, 16, _jpeg_block_y(5), color=True, subsample=True, cb=130, cr=120
    )
    assert hashlib.md5(gray).hexdigest() == "d40d1e31d98ddb0586b2ebee3f8cbaaf"
    assert hashlib.md5(color).hexdigest() == "c23869ea7e24bc6eabfc379d32993f8e"


# ---------------------------------------------------------------------------
# ISO BMFF (MP4) container walk + MPEG-1 Layer III header walk (round 4)
# ---------------------------------------------------------------------------


def test_mp4_sample_tables_roundtrip_varying_sizes():
    """The walker must resolve stts/stsc/stsz/stco for real: varying
    per-sample sizes, two-sample chunks with a one-sample tail, sample
    bytes sliced from mdat by absolute offset."""
    from data_lake_skyfit_spark.llm.multimodal import _mp4_samples, encode_mp4_frames

    frames = [bytes([i]) * (10 + 7 * i) for i in range(5)]  # odd count
    data = encode_mp4_frames(frames, frame_duration_ms=250, timescale=90000)
    ts, deltas, samples = _mp4_samples(data)
    assert ts == 90000 and deltas == [250 * 90000 // 1000] * 5
    assert [s for _, s in samples] == [len(f) for f in frames]
    assert [data[o : o + s] for o, s in samples] == frames


def test_mp4_frame_sampling_matches_avi_contract(spark):
    """sample_video_frames over MP4 must emit the same (frame_idx,
    ts_ms, md5-of-actual-bytes) contract as the AVI leg, and
    ftyp-prefixed garbage must fall to the fake path."""
    import hashlib

    from data_lake_skyfit_spark.llm.multimodal import (
        encode_mp4_frames, sample_video_frames,
    )

    frames = [f"frame{i}".encode() * 3 for i in range(4)]
    good = encode_mp4_frames(frames)  # 500 ms deltas
    garbage = b"\x00\x00\x00\x14ftyp" + b"junk" * 10
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(garbage))],
        "doc_id long, payload binary",
    )
    rows = sample_video_frames(df, every_ms=1000).collect()
    got = {(r["doc_id"], r["frame_idx"]): (r["ts_ms"], r["frame_md5"]) for r in rows}
    assert got[(1, 0)] == (0, hashlib.md5(frames[0]).hexdigest())
    assert got[(1, 2)] == (1000, hashlib.md5(frames[2]).hexdigest())
    assert (1, 1) not in got and (1, 3) not in got
    assert any(k[0] == 2 for k in got)  # fake path produced rows


def test_mp3_vbr_walk_and_id3_skip():
    """Frame stepping must land on every sync word across varying
    bitrate/padding (VBR), skip ID3v2 via the syncsafe size, and reject
    truncation and mid-stream samplerate changes."""
    import pytest as _pytest

    from data_lake_skyfit_spark.llm.multimodal import (
        _mp3_frames, encode_mp3_frames,
    )

    specs = [(1 + (i * 5) % 14, 2, i % 2) for i in range(7)]
    data = encode_mp3_frames(specs)
    sr, brs = _mp3_frames(data)
    assert sr == 32000 and len(brs) == 7
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 1, 3]) + bytes(131)
    sr2, brs2 = _mp3_frames(id3 + data)
    assert (sr2, brs2) == (sr, brs)
    with _pytest.raises(ValueError):
        _mp3_frames(data[:-1])
    mixed = encode_mp3_frames([(5, 0, 0)]) + encode_mp3_frames([(5, 1, 0)])
    with _pytest.raises(ValueError):
        _mp3_frames(mixed)


def test_mp3_decode_audio_null_samples_real_timing(spark):
    """decode_audio MP3 rows: exact header-derived timing, NULL (not
    NaN) sample_sum/rms; WAV rows in the same batch keep real stats."""
    from data_lake_skyfit_spark.llm.multimodal import (
        decode_audio, encode_mp3_frames, encode_wav_pcm16,
    )

    mp3 = encode_mp3_frames([(9, 1, 0)] * 3)  # 48 kHz, 3 frames
    wav = encode_wav_pcm16(8000, [100, -100, 100, -100])
    df = spark.createDataFrame(
        [(1, bytearray(mp3)), (2, bytearray(wav))], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert rows[1]["sample_rate"] == 48000
    assert rows[1]["n_samples"] == 3 * 1152
    assert rows[1]["duration_ms"] == 3 * 1152 * 1000 // 48000
    assert rows[1]["sample_sum"] is None and rows[1]["rms"] is None
    assert rows[2]["sample_sum"] == 0 and rows[2]["rms"] == 100.0


def test_extract_embeddings_stereo_deinterleaves(spark):
    """Stereo PCM features (r4, closes the code-review-r3 gap): zero
    crossings count PER CHANNEL after de-interleave — L = +1/-1
    alternating (3 crossings over 4 frames), R = constant +5 (0
    crossings) → rate 3/6; interleaved adjacent compare would see sign
    flips at every L→R boundary instead."""
    from data_lake_skyfit_spark.llm.multimodal import (
        encode_wav_pcm16, extract_embeddings,
    )

    frames = [1, 5, -1, 5, 1, 5, -1, 5]  # L0 R0 L1 R1 L2 R2 L3 R3
    payload = encode_wav_pcm16(8000, frames, n_channels=2)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    f = extract_embeddings(df).collect()[0]["features"]
    assert f[0] == 8000.0 and f[1] == 8.0  # rate, total samples
    assert f[3] == sum(frames) / 8
    assert f[4] == math.sqrt(sum(x * x for x in frames) / 8)
    assert f[5] == 3 / 6  # per-channel crossings / per-channel adjacents
    assert (f[6], f[7]) == (-1.0, 5.0)


def test_gif_animation_walk_and_timing():
    """Animated GIF89a: the walker must parse every GCE delay and
    LZW-decode every frame; variable delays shift which frames the
    sampler picks; single-image decode still reads frame 0."""
    import hashlib

    from data_lake_skyfit_spark.llm.multimodal import (
        _decode_gif, _decode_gif_frames, _gif_frames, encode_gif_animation,
    )

    frames = [bytes([10 + i]) * 12 for i in range(5)]
    data = encode_gif_animation(4, 3, frames, delay_cs=30)  # 300 ms each
    w, h, got = _gif_frames(data)
    assert (w, h) == (4, 3)
    assert [f for _, f in got] == frames and [d for d, _ in got] == [30] * 5
    # 1000 ms sampling over 300 ms frames: t=0,300,600,900,1200 → 0, 1200
    rows = _decode_gif_frames(data, 1000)
    assert [(i, t) for i, t, _ in rows] == [(0, 0), (4, 1200)]
    assert rows[1][2] == hashlib.md5(frames[4]).hexdigest()
    assert _decode_gif(data)[:3] == (4, 3, 3)  # first-frame image decode


def test_gif_animation_partial_frame_falls_to_fake_path(spark):
    """A partial-frame (offset image descriptor) animation is beyond
    the full-frame contract: the walker raises and sample_video_frames
    serves the fake path instead of mis-timing frames."""
    import struct as _struct

    from data_lake_skyfit_spark.llm.multimodal import (
        encode_gif_animation, sample_video_frames,
    )

    good = encode_gif_animation(4, 3, [bytes(12), bytes(range(12))])
    # corrupt: image descriptor left offset 1 (partial frame)
    bad = bytearray(good)
    at = good.index(b"\x2c")
    bad[at + 1 : at + 3] = _struct.pack("<H", 1)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bad)], "doc_id long, payload binary"
    )
    rows = sample_video_frames(df, every_ms=1000).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["frame_idx"] == 0
    assert by_doc[2]  # fake path still yields schema-shaped rows


def test_png_palette_rgba_grayalpha_decode():
    """Non-RGB PNG color types (r4): palette indices resolve through
    PLTE to RGB AFTER unfiltering; RGBA/gray+alpha filter at their true
    bytes-per-pixel; a palette index past the PLTE is rejected."""
    import pytest as _pytest

    from data_lake_skyfit_spark.llm.multimodal import _png_pixels, encode_png

    pal = [((3 * i) % 256, (5 * i) % 256, (7 * i) % 256) for i in range(256)]
    data = encode_png(6, 9, lambda x, y, c: (11 * x + 13 * y) % 256, palette=pal)
    w, h, ch, rows = _png_pixels(data)
    assert (w, h, ch) == (6, 9, 3)
    assert b"".join(rows) == b"".join(
        bytes(v for x in range(6) for v in pal[(11 * x + 13 * y) % 256])
        for y in range(9)
    )

    rgba = encode_png(
        7, 5, lambda x, y, c: (5 + 11 * x + 13 * y + 17 * c) % 256, channels=4
    )
    w, h, ch, rows = _png_pixels(rgba)
    assert (w, h, ch) == (7, 5, 4)
    assert b"".join(rows) == bytes(
        (5 + 11 * x + 13 * y + 17 * c) % 256
        for y in range(5) for x in range(7) for c in range(4)
    )

    ga = encode_png(4, 6, lambda x, y, c: (x * 9 + y * 5 + c) % 256, channels=2)
    assert _png_pixels(ga)[:3] == (4, 6, 2)

    short_pal = encode_png(4, 4, lambda x, y, c: 200, palette=pal[:16])
    with _pytest.raises(ValueError):
        _png_pixels(short_pal)  # index 200 past the 16-entry PLTE


def test_variable_delay_sampling_has_no_catchup_burst():
    """A frame displayed longer than the sampling period must not cause
    a burst of catch-up emissions (code-review r4): GIF delays
    [3000, 100, 100, 100] ms at 1-per-second sampling emit t=0 and
    t=3000 only — never 3100/3200. Same contract for MP4 multi-run
    stts deltas."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _decode_gif_frames, _decode_mp4_frames, encode_gif_animation,
        encode_mp4_frames,
    )

    frames = [bytes([i]) * 12 for i in range(4)]
    gif = bytearray(encode_gif_animation(4, 3, frames, delay_cs=10))
    # patch the FIRST GCE delay to 300 cs (3000 ms); others stay 100 ms
    at = gif.index(b"\x21\xf9\x04\x00")
    gif[at + 4 : at + 6] = (300).to_bytes(2, "little")
    rows = _decode_gif_frames(bytes(gif), 1000)
    assert [(i, t) for i, t, _ in rows] == [(0, 0), (1, 3000)]

    # MP4: splice a second stts run so deltas are [3000, 100, 100] ms —
    # grow the box by 8 bytes and fix every enclosing box size.
    import struct as _s

    data = bytes(
        encode_mp4_frames(
            [b"aa" * 8, b"bb" * 8, b"cc" * 8], frame_duration_ms=100
        )
    )
    stts_at = data.index(b"stts") - 4
    (old_size,) = _s.unpack_from(">I", data, stts_at)
    new_payload = (
        b"\x00\x00\x00\x00"
        + _s.pack(">I", 2)
        + _s.pack(">II", 1, 3000)
        + _s.pack(">II", 2, 100)
    )
    new_box = _s.pack(">I", 8 + len(new_payload)) + b"stts" + new_payload
    grown = len(new_box) - old_size
    out = bytearray(data[:stts_at] + new_box + data[stts_at + old_size :])
    # fix ancestor box sizes (moov > trak > mdia > minf > stbl contain stts)
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = bytes(out).index(fourcc) - 4
        (sz,) = _s.unpack_from(">I", out, at)
        _s.pack_into(">I", out, at, sz + grown)
    rows = _decode_mp4_frames(bytes(out), 1000)
    assert [(i, t) for i, t, _ in rows] == [(0, 0), (1, 3000)]


def test_jpeg_progressive_noninterleaved_dc_scans():
    """Single-component DC scans of a SUBSAMPLED image must use raster
    (non-interleaved) block order per T.81 — the code-review-r4 repro:
    per-component DC scans over 4:2:0 color previously emitted luma
    blocks in MCU order and decoded permuted."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _jpeg_pixels, encode_jpeg, encode_jpeg_progressive,
    )

    pix = lambda x, y: (x * 13 + y * 7) % 256  # noqa: E731
    scans = [
        ((0,), 0, 0, 0, 1), ((1,), 0, 0, 0, 1), ((2,), 0, 0, 0, 1),
        ((0,), 0, 0, 1, 0), ((1,), 0, 0, 1, 0), ((2,), 0, 0, 1, 0),
        ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
    ]
    base = _jpeg_pixels(
        encode_jpeg(32, 32, pix, color=True, subsample=True, cb=131, cr=119)
    )
    prog = _jpeg_pixels(
        encode_jpeg_progressive(
            32, 32, pix, color=True, subsample=True, cb=131, cr=119, scans=scans
        )
    )
    assert base == prog


def test_flac_streaminfo_bit_packing():
    """FLAC STREAMINFO packed fields round-trip at the edges (20-bit
    rate, 36-bit sample count, channels/bps subfields); truncation
    INSIDE STREAMINFO is rejected, while a truncated trailing PADDING
    block is tolerated (STREAMINFO already parsed — ffprobe leniency)."""
    import pytest as _pytest

    from data_lake_skyfit_spark.llm.multimodal import (
        _decode_flac, encode_flac_streaminfo,
    )

    for sr, n, ch in [(44100, 123456, 2), (8000, (1 << 36) - 1, 8), (96000, 7, 1)]:
        data = encode_flac_streaminfo(sr, n, n_channels=ch)
        assert data[:4] == b"fLaC"
        assert _decode_flac(data) == (sr, n, n * 1000 // sr, None, None)
    full = encode_flac_streaminfo(44100, 10)
    with _pytest.raises(ValueError):
        _decode_flac(full[:20])  # cut inside STREAMINFO
    assert _decode_flac(full[:-6])[0] == 44100  # cut inside trailing PADDING
    with _pytest.raises(ValueError):
        encode_flac_streaminfo(1 << 20, 10)  # rate field overflow


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    bw=st.integers(min_value=1, max_value=3),
    bh=st.integers(min_value=1, max_value=3),
    color=st.booleans(),
)
@settings(max_examples=10, deadline=None)
def test_jpeg_progressive_equals_baseline_property(seed, bw, bh, color):
    """Progressive (SOF2 successive approximation) must reconstruct the
    EXACT baseline coefficients for ARBITRARY image content, not just
    the curated cases: random per-pixel content drives random AC
    magnitudes, runs, EOB positions and correction bits through the
    encoder/decoder pair."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _jpeg_pixels, encode_jpeg, encode_jpeg_progressive,
    )

    w, h = 8 * bw, 8 * bh

    def pix(x, y):
        # xorshift-ish deterministic pseudo-noise from (seed, x, y)
        v = (seed ^ (x * 2654435761) ^ (y * 40503)) & 0xFFFFFFFF
        v ^= v >> 13
        return (v * 69069 >> 16) % 256

    kw = {"color": color, "cb": 120 + seed % 16, "cr": 118 + seed % 20} if color else {}
    base = _jpeg_pixels(encode_jpeg(w, h, pix, **kw))
    prog = _jpeg_pixels(encode_jpeg_progressive(w, h, pix, **kw))
    assert base == prog


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_codec_fuzz_only_caught_exception_types(seed):
    """100 TB robustness: corrupt files WILL occur, and a decoder that
    escapes its dispatch ladder's caught exception types (ValueError /
    struct.error / IndexError / zlib.error / EOFError / wave.Error)
    kills the whole Spark task instead of taking the fake path. Fuzz
    every decoder with magic-prefixed pseudo-random bytes and
    valid-payload corruptions; decode-or-caught-type is the contract
    (MemoryError-class allocation bombs are guarded by the sanity cap)."""
    import random
    import wave
    import zlib as _zlib

    from data_lake_skyfit_spark.llm import multimodal as M

    rng = random.Random(seed)
    junk = bytes(rng.randrange(256) for _ in range(rng.randrange(20, 400)))
    caught = (ValueError, struct.error, IndexError, _zlib.error, EOFError, wave.Error)

    valid = [
        M.encode_jpeg(8, 8, lambda x, y: 7),
        M.encode_jpeg_progressive(8, 8, lambda x, y: 7),
        M.encode_png(5, 4, lambda x, y, c: 9),
        M.encode_gif(4, 4, lambda x, y: 1),
        M.encode_gif_animation(4, 3, [bytes(12)] * 2),
        M.encode_bmp24(4, 3, lambda x, y, c: 2),
        M.encode_wav_pcm16(8000, [1, -1, 2]),
        M.encode_mp3_frames([(5, 1, 0)]),
        M.encode_flac_streaminfo(44100, 99),
        M.encode_avi_dib(4, 3, 250_000, [bytes(36)]),
        M.encode_mp4_frames([bytes(10), bytes(12)]),
        M.encode_tiff(4, 3, lambda x, y, c: 5),
    ]
    payloads = [m + junk for m in (
        b"\xff\xd8\xff", M._PNG_SIG, b"GIF89a", b"BM", b"RIFF" + junk[:4] + b"WAVE",
        b"RIFF" + junk[:4] + b"AVI ", b"\x00\x00\x00\x14ftyp", b"fLaC", b"\xff\xfb", b"ID3",
        b"II*\x00", b"MM\x00*",
    )]
    # corrupted valid payloads: flip a byte / truncate at a random point
    for v in valid:
        b = bytearray(v)
        b[rng.randrange(len(b))] ^= 1 + rng.randrange(255)
        payloads.append(bytes(b))
        payloads.append(v[: rng.randrange(1, len(v))])

    decoders = [
        M._jpeg_pixels, M._png_pixels, M._gif_pixels, M._decode_bmp,
        M._decode_wav, M._decode_mp3, M._decode_flac, M._avi_frames,
        M._mp4_samples, lambda d: M._gif_frames(d), M._tiff_pixels,
    ]
    for p in payloads:
        for dec in decoders:
            try:
                dec(p)
            except caught:
                pass  # the dispatch ladders absorb these → fake path


def test_tiff_roundtrip_and_rejections():
    """Baseline TIFF walker: both byte orders, gray+RGB, multi-strip
    reassembly, inline-SHORT left-justification (big-endian trap);
    compressed variants and truncated strips are rejected → fake path."""
    import pytest as _pytest
    import struct as _s

    from data_lake_skyfit_spark.llm.multimodal import (
        _decode_tiff, _tiff_pixels, encode_tiff,
    )

    pix = lambda x, y, c: (7 * x + 11 * y + 13 * c) % 256  # noqa: E731
    for be in (False, True):
        for ch in (1, 3):
            data = encode_tiff(6, 9, pix, channels=ch, big_endian=be)
            w, h, C, raw = _tiff_pixels(data)
            assert (w, h, C) == (6, 9, ch)
            assert raw == bytes(
                pix(x, y, c) for y in range(9) for x in range(6) for c in range(ch)
            )
    # JPEG-in-TIFF (compression 7) stays rejected; and a stream whose
    # Compression tag claims LZW (5) over raw strip bytes dies in the
    # r9 LZW wire parse — ValueError → fake path either way
    for comp, pat in ((7, "unsupported compression"), (5, "lzw")):
        data = bytearray(encode_tiff(4, 4, pix))
        (ifd,) = _s.unpack_from("<I", data, 4)
        (n,) = _s.unpack_from("<H", data, ifd)
        for i in range(n):
            base = ifd + 2 + 12 * i
            if _s.unpack_from("<H", data, base)[0] == 259:
                _s.pack_into("<H", data, base + 8, comp)
        with _pytest.raises(ValueError, match=pat):
            _tiff_pixels(bytes(data))
    # truncation: the IFD trails the strips, so a cut payload dies in
    # the IFD parse (struct.error) or the strip check (ValueError) —
    # both are dispatch-ladder types → fake path either way
    good = encode_tiff(4, 4, pix)
    with _pytest.raises((ValueError, _s.error)):
        _decode_tiff(good[:30])


def test_aiff_decimation_real():
    from data_lake_skyfit_spark.llm.multimodal import _decimate_aiff

    samples = [((11 * i * i + 5 * i) % 65536) - 32768 for i in range(80)]
    out = _decimate_aiff(encode_aiff_pcm16(44100, samples), 4)
    sr, n, _dur, ssum, _rms = _decode_aiff(out)
    assert (sr, n) == (44100 // 4, 20)
    assert ssum == sum(samples[::4])
    with pytest.raises(ValueError, match="mono"):
        _decimate_aiff(encode_aiff_pcm16(8000, samples, n_channels=2), 4)


def test_resample_audio_aiff_real_path_on_spark(spark):
    df = spark.range(6).select(F.col("id").alias("doc_id"))
    # synthesize_aiff_payloads makes every other payload stereo; the
    # mono rows decimate for real, stereo falls to the documented fake
    media = multimodal.synthesize_aiff_payloads(df, id_col="doc_id")
    out = {r["doc_id"]: r for r in multimodal.resample_audio(media, factor=4).collect()}
    for rid in (0, 2, 4):  # mono payloads
        sr = WAV_RATES[(rid + 2) % 5]
        nf = 50 + rid % 89
        r = out[rid]
        assert r["sample_rate"] == sr // 4
        assert r["n_samples"] == -(-nf // 4)  # ceil: keep-every-4th


def test_extract_embeddings_real_audio_features_from_aiff(spark):
    """The audio feature leg shares one real path for WAV and AIFF via
    _pcm_samples — stats must match the closed-form generator, stereo
    included (de-interleaved zero crossings)."""
    import math as m

    df = spark.range(4).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_aiff_payloads(df, id_col="doc_id")
    out = {
        r["doc_id"]: list(r["features"])
        for r in multimodal.extract_embeddings(media, dims=8).collect()
    }
    for rid in range(4):
        sr = WAV_RATES[(rid + 2) % 5]
        ch = 1 + rid % 2
        nf = 50 + rid % 89
        samples = [((rid * 6007 + i * 31337) % 65536) - 32768 for i in range(nf * ch)]
        f = out[rid]
        assert f[0] == float(sr)
        assert f[1] == float(len(samples))
        assert f[2] == float(nf * 1000 // sr)
        assert f[3] == sum(samples) / len(samples)
        assert f[4] == m.sqrt(sum(s * s for s in samples) / len(samples))
        assert f[6] == float(min(samples)) and f[7] == float(max(samples))


def test_ppm_roundtrip_and_fuzz():
    from data_lake_skyfit_spark.llm.multimodal import _decode_ppm, encode_ppm

    p = encode_ppm(5, 3, lambda x, y, c: (7 * x + 3 * y + c) % 256)
    w, h, ch, s = _decode_ppm(p)
    assert (w, h, ch) == (5, 3, 3)
    assert s == sum((7 * x + 3 * y + c) % 256 for y in range(3) for x in range(5) for c in range(3))
    g = encode_ppm(4, 4, lambda x, y, c: (x * y) % 256, gray=True)
    assert _decode_ppm(g)[:3] == (4, 4, 1)
    # comment/whitespace-tolerant header
    tail = p[p.index(b"255") + 4 :]
    assert _decode_ppm(b"P6 # c\n# c2\n 5\t3\n255\n" + tail)[:3] == (5, 3, 3)
    # fuzz: truncated body, absurd dims, junk header, 16-bit maxval
    for bad in (
        p[:-2],
        b"P6\n999999 999999\n255\n\x00",
        b"P6\nabc",
        b"P6\n5 3\n65535\n" + b"\x00" * 45,
    ):
        with pytest.raises(ValueError):
            _decode_ppm(bad)


def test_decode_images_ppm_real_path_on_spark(spark):
    df = spark.range(8).select(F.col("id").alias("doc_id"))
    media = multimodal.synthesize_ppm_payloads(df, id_col="doc_id")
    out = {r["doc_id"]: r for r in multimodal.decode_images(media).collect()}
    for rid in (0, 1, 7):  # mixes P6 (even) and P5 (odd)
        w, h = 4 + rid % 13, 4 + rid % 11
        ch = 3 if rid % 2 == 0 else 1
        r = out[rid]
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, ch)
        assert r["pixel_sum"] == sum(
            (5 * rid + 2 * x + 11 * y + 3 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )


# ---------------------------------------------------------------------------
# IMA ADPCM (WAVE format tag 0x0011)
# ---------------------------------------------------------------------------


def test_ima_adpcm_state_machine_matches_audioop():
    """The per-nibble decode step must match stdlib audioop.adpcm2lin —
    an INDEPENDENT implementation of the same IMA algorithm — over a
    long pseudo-random nibble stream from state (0, 0). (audioop packs
    HIGH nibble first; the WAV container packs low-first — the packing
    is pinned separately by the block golden below.)"""
    import random

    audioop = pytest.importorskip("audioop")
    from data_lake_skyfit_spark.llm.multimodal import _ima_decode_nibble

    rng = random.Random(3)
    nibbles = [rng.randrange(16) for _ in range(2000)]
    pred = idx = 0
    mine = []
    for nb in nibbles:
        pred, idx = _ima_decode_nibble(nb, pred, idx)
        mine.append(pred)
    packed = bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
    )
    ref = audioop.adpcm2lin(packed, 2, None)[0]
    theirs = list(struct.unpack(f"<{len(nibbles)}h", ref))
    assert mine == theirs


def test_ima_adpcm_block_golden_wire_convention():
    """Hand-built single block pins the WAV wire convention: 4-byte
    header (predictor int16 LE = first sample verbatim, step index,
    reserved), then LOW nibble first. With predictor=100, index=0 the
    nibble byte 0x81 decodes low nibble 1 (step 7: diff = 0+1 = +1 →
    101) then high nibble 8 (index moved -1 → clamped 0, step 7,
    magnitude 0: diff = 7>>3 = 0, sign → 101-0 = 101)."""
    from data_lake_skyfit_spark.llm.multimodal import _ima_wav_samples

    block_align = 8  # header + 4 nibble bytes = 9 samples/block
    data = struct.pack("<hBB", 100, 0, 0) + bytes([0x81, 0x00, 0x00, 0x00])
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 8000 * 8 // 9, block_align, 4, 2, 9)
    fact = struct.pack("<I", 3)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<I", 4) + fact
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, n, ch, samples = _ima_wav_samples(wav)
    assert (sr, n, ch) == (8000, 3, 1)
    assert list(samples) == [100, 101, 101]


def test_ima_adpcm_roundtrip_tracks_smooth_signals():
    """Encode→decode over a smooth signal: first sample exact per
    block, every reconstructed sample within a loose codec bound, and
    multi-block streams carry the step index ACROSS blocks."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _wav_samples,
        encode_wav_ima_adpcm,
    )

    samples = [int(3000 * math.sin(i / 25)) for i in range(1500)]
    wav = encode_wav_ima_adpcm(22050, samples, block_align=64)
    sr, n, ch, dec = _wav_samples(wav)
    assert (sr, n, ch) == (22050, 1500, 1)
    spb = (64 - 4) * 2 + 1
    for b0 in range(0, 1500, spb):
        assert dec[b0] == samples[b0]  # header carries it verbatim
    assert max(abs(a - b) for a, b in zip(samples, dec)) < 256


def test_ima_adpcm_flows_through_wav_consumers(spark):
    """decode_audio and audio_vad_frames must decode ADPCM payloads FOR
    REAL — sample_sum equals the decoded-sample sum, VAD energies the
    decoded Σs² (not the pre-encode originals: the codec is lossy)."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _wav_samples,
        encode_wav_ima_adpcm,
    )

    samples = [int(2000 * math.sin(i / 10)) for i in range(480)]
    wav = encode_wav_ima_adpcm(16000, samples, block_align=64)
    _sr, _n, _ch, dec = _wav_samples(wav)
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    row = multimodal.decode_audio(df).collect()[0]
    assert row["sample_rate"] == 16000 and row["n_samples"] == 480
    assert row["sample_sum"] == sum(dec)
    fr = {r["frame_idx"]: r["energy"] for r in
          multimodal.audio_vad_frames(df, frame_size=160).collect()}
    assert fr == {
        t: sum(s * s for s in dec[t * 160 : (t + 1) * 160]) for t in range(3)
    }


def test_ima_adpcm_rejects_corrupt_payloads():
    """Fuzz rule: declared sizes validated before any allocation; junk
    raises ValueError/struct.error, never hangs or over-allocates."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _ima_wav_samples,
        encode_wav_ima_adpcm,
    )

    wav = bytearray(encode_wav_ima_adpcm(8000, [0] * 100))
    # chunk declaring more bytes than the payload holds
    bad = bytes(wav[:16]) + struct.pack("<I", 1 << 30) + bytes(wav[20:])
    with pytest.raises((ValueError, struct.error)):
        _ima_wav_samples(bad)
    # stereo tag rejected (documented mono-only)
    fmt_off = bytes(wav).find(b"fmt ") + 8
    stereo = bytes(wav[:fmt_off + 2]) + struct.pack("<H", 2) + bytes(wav[fmt_off + 4:])
    with pytest.raises(ValueError):
        _ima_wav_samples(stereo)
    # fact declaring more samples than the data blocks hold
    fact_off = bytes(wav).find(b"fact") + 8
    lying = bytes(wav[:fact_off]) + struct.pack("<I", 10**6) + bytes(wav[fact_off + 4:])
    with pytest.raises(ValueError):
        _ima_wav_samples(lying)
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(8000, [])
    with pytest.raises(ValueError):
        encode_wav_ima_adpcm(8000, [1], block_align=6)


# ---------------------------------------------------------------------------
# G.711 μ-law / A-law (WAVE format tags 0x0007 / 0x0006)
# ---------------------------------------------------------------------------


def test_g711_expansion_matches_audioop_all_256_codes():
    audioop = pytest.importorskip("audioop")
    from data_lake_skyfit_spark.llm.multimodal import _ALAW_LUT, _MULAW_LUT

    for i in range(256):
        assert _MULAW_LUT[i] == struct.unpack("<h", audioop.ulaw2lin(bytes([i]), 2))[0]
        assert _ALAW_LUT[i] == struct.unpack("<h", audioop.alaw2lin(bytes([i]), 2))[0]


def test_g711_wav_roundtrip_and_consumers(spark):
    from data_lake_skyfit_spark.llm.multimodal import (
        _MULAW_LUT,
        _wav_samples,
        encode_wav_g711,
    )

    raw = bytes(range(256))
    wav = encode_wav_g711(8000, raw, law="mulaw")
    sr, n, ch, dec = _wav_samples(wav)
    assert (sr, n, ch) == (8000, 256, 1)
    assert list(dec) == [_MULAW_LUT[b] for b in raw]
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    row = multimodal.decode_audio(df).collect()[0]
    assert row["sample_sum"] == sum(dec) and row["n_samples"] == 256


def test_g711_rejects_corrupt_and_bad_args():
    from data_lake_skyfit_spark.llm.multimodal import (
        _g711_wav_samples,
        encode_wav_g711,
    )

    wav = bytearray(encode_wav_g711(8000, bytes(100), law="alaw"))
    bad = bytes(wav[:16]) + struct.pack("<I", 1 << 29) + bytes(wav[20:])
    with pytest.raises((ValueError, struct.error)):
        _g711_wav_samples(bad)
    with pytest.raises(ValueError):
        encode_wav_g711(8000, bytes(4), law="pcm")
    with pytest.raises(ValueError):
        encode_wav_g711(0, bytes(4))


# ---------------------------------------------------------------------------
# EXIF (JPEG APP1 / TIFF IFD metadata)
# ---------------------------------------------------------------------------


def test_exif_roundtrip_both_byte_orders():
    from data_lake_skyfit_spark.llm.multimodal import (
        _jpeg_exif,
        encode_exif_app1,
        encode_jpeg,
        insert_jpeg_app1,
    )

    for be in (False, True):
        jpeg = encode_jpeg(16, 8, lambda x, y: (x + y) % 256)
        app1 = encode_exif_app1(
            make="cam-3", model="mx2", datetime_str="2021:03:14 09:26:53",
            orientation=6, iso=400, exposure=(1, 125), px_dim=16, py_dim=8,
            big_endian=be,
        )
        out = _jpeg_exif(insert_jpeg_app1(jpeg, app1))
        assert out == {
            "make": "cam-3", "model": "mx2", "orientation": 6,
            "datetime_str": "2021:03:14 09:26:53", "iso": 400,
            "exposure_num": 1, "exposure_den": 125, "px_dim": 16,
            "py_dim": 8, "width": 16, "height": 8,
        }


def test_exif_app1_golden_bytes_little_endian():
    """Byte-level golden pins the wire convention (the GIF LZW lesson):
    header, ascending-tag IFD0, inline SHORT left-justified, offset
    ASCII values landing in the data area after both IFDs."""
    from data_lake_skyfit_spark.llm.multimodal import encode_exif_app1

    app1 = encode_exif_app1(
        make="abcd", model="m", datetime_str="2021:01:01 00:00:00",
        orientation=3, iso=200, exposure=(1, 50), px_dim=8, py_dim=8,
    )
    assert app1[:6] == b"Exif\x00\x00"
    tiff = app1[6:]
    assert tiff[:8] == b"II*\x00\x08\x00\x00\x00"
    assert struct.unpack_from("<H", tiff, 8)[0] == 5  # IFD0 entry count
    # first entry: Make, ASCII(2), count 5 ("abcd\0"), offset -> data area
    tag, typ, cnt = struct.unpack_from("<HHI", tiff, 10)
    assert (tag, typ, cnt) == (0x010F, 2, 5)
    (make_off,) = struct.unpack_from("<I", tiff, 18)
    assert tiff[make_off : make_off + 5] == b"abcd\x00"
    # Orientation entry: inline SHORT, left-justified in the value field
    tag, typ, cnt = struct.unpack_from("<HHI", tiff, 10 + 24)
    assert (tag, typ, cnt) == (0x0112, 3, 1)
    assert tiff[10 + 24 + 8 : 10 + 24 + 12] == b"\x03\x00\x00\x00"


def test_exif_extractor_handles_no_exif_and_junk(spark):
    from data_lake_skyfit_spark.llm.multimodal import (
        encode_jpeg,
        extract_image_metadata,
    )

    plain = encode_jpeg(8, 8, lambda x, y: 7)  # JPEG without EXIF
    df = spark.createDataFrame(
        [(1, bytearray(plain)), (2, bytearray(b"\xff\xd8\xff junk")), (3, bytearray(b"pdf?"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_image_metadata(df).collect()}
    assert rows[1]["width"] == 8 and rows[1]["make"] is None
    assert rows[2]["make"] is None and rows[3]["width"] is None


def test_exif_rejects_lying_offsets():
    """A tag whose value offset points past the payload must raise, not
    read garbage (decoder-fuzz rule)."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _parse_exif_tiff,
        encode_exif_app1,
    )

    app1 = bytearray(
        encode_exif_app1(
            make="abcd", model="m", datetime_str="2021:01:01 00:00:00",
            orientation=1, iso=100, exposure=(1, 50), px_dim=8, py_dim=8,
        )
    )
    tiff = bytearray(app1[6:])
    struct.pack_into("<I", tiff, 18, 1 << 28)  # Make value offset → absurd
    with pytest.raises((ValueError, struct.error)):
        _parse_exif_tiff(bytes(tiff))


# ---------------------------------------------------------------------------
# ID3v2 (MP3 metadata)
# ---------------------------------------------------------------------------


def test_id3v2_roundtrip_and_v24_utf8():
    from data_lake_skyfit_spark.llm.multimodal import (
        _parse_id3v2,
        _syncsafe,
        encode_id3v2,
    )

    tag = encode_id3v2({"TIT2": "hello", "TPE1": "someone", "TRCK": "3/20"})
    tags, tlen = _parse_id3v2(tag + b"\xff\xfbrest")
    assert tags == {"TIT2": "hello", "TPE1": "someone", "TRCK": "3/20"}
    assert tlen == len(tag)
    # hand-built v2.4 frame: syncsafe frame size, utf-8 encoding byte 3
    body = b"TIT2" + _syncsafe(1 + 5) + b"\x00\x00" + b"\x03" + "héllo".encode()[:5]
    v24 = b"ID3\x04\x00\x00" + _syncsafe(len(body)) + body
    tags, _ = _parse_id3v2(v24)
    assert tags["TIT2"] == "héllo"[:4] or tags["TIT2"].startswith("h")


def test_id3v2_rejects_lying_sizes():
    from data_lake_skyfit_spark.llm.multimodal import _parse_id3v2, encode_id3v2

    tag = bytearray(encode_id3v2({"TIT2": "x"}))
    tag[6:10] = b"\x7f\x7f\x7f\x7f"  # tag size ≫ payload
    with pytest.raises(ValueError):
        _parse_id3v2(bytes(tag))
    tag2 = bytearray(encode_id3v2({"TIT2": "x"}))
    struct.pack_into(">I", tag2, 14, 1 << 20)  # frame size past tag end
    with pytest.raises(ValueError):
        _parse_id3v2(bytes(tag2))


def test_audio_metadata_extractor_paths(spark):
    from data_lake_skyfit_spark.llm.multimodal import (
        encode_id3v2,
        encode_mp3_frames,
        extract_audio_metadata,
    )

    frames = encode_mp3_frames([(5, 0, 0), (6, 0, 1)])
    tagged = encode_id3v2({"TIT2": "t", "TPE1": "a"}) + frames
    df = spark.createDataFrame(
        [(1, bytearray(tagged)), (2, bytearray(frames)), (3, bytearray(b"zz"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_audio_metadata(df).collect()}
    assert rows[1]["title"] == "t" and rows[1]["n_frames"] == 2
    assert rows[1]["duration_ms"] == 2 * 1152 * 1000 // 44100
    assert rows[2]["title"] is None and rows[2]["n_frames"] == 2  # bare stream
    assert rows[3]["title"] is None and rows[3]["n_frames"] is None


# ---------------------------------------------------------------------------
# WebP container metadata
# ---------------------------------------------------------------------------


def test_webp_dims_all_three_header_kinds_and_exif():
    from data_lake_skyfit_spark.llm.multimodal import (
        _webp_metadata,
        encode_exif_app1,
        encode_webp_container,
    )

    # VP8L lossless header (no VP8X)
    m = _webp_metadata(encode_webp_container(321, 123, lossless=True))
    assert (m["width"], m["height"]) == (321, 123)
    # VP8 keyframe header
    m = _webp_metadata(encode_webp_container(640, 480, lossless=False))
    assert (m["width"], m["height"]) == (640, 480)
    # VP8X + EXIF chunk (raw TIFF body, both byte orders)
    for be in (False, True):
        exif = encode_exif_app1(
            make="cam-1", model="mx0", datetime_str="2021:01:11 01:30:01",
            orientation=5, iso=800, exposure=(1, 60), px_dim=99, py_dim=77,
            big_endian=be,
        )[6:]
        m = _webp_metadata(encode_webp_container(99, 77, exif=exif))
        assert (m["width"], m["height"], m["orientation"], m["iso"]) == (99, 77, 5, 800)


def test_webp_rejects_corrupt_and_bad_dims():
    from data_lake_skyfit_spark.llm.multimodal import (
        _webp_metadata,
        encode_webp_container,
    )

    wp = bytearray(encode_webp_container(64, 64))
    pos = bytes(wp).find(b"VP8L")
    struct.pack_into("<I", wp, pos + 4, 1 << 30)  # lying chunk size
    with pytest.raises(ValueError):
        _webp_metadata(bytes(wp))
    with pytest.raises(ValueError):
        encode_webp_container(0, 5)
    with pytest.raises(ValueError):
        encode_webp_container(1 << 15, 5)  # past 14-bit field
    with pytest.raises(ValueError):
        _webp_metadata(b"RIFF\x04\x00\x00\x00WEBP")  # no dims chunk


def test_webp_chunk_walk_bounded_by_declared_riff_size():
    """Trailing junk after the declared RIFF payload must not be parsed
    as chunks: an attacker-appended EXIF chunk outside the container
    cannot inject metadata."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _webp_metadata,
        encode_exif_app1,
        encode_webp_container,
    )

    clean = encode_webp_container(64, 48)
    base = _webp_metadata(clean)
    exif = encode_exif_app1(
        make="evil", model="inj", datetime_str="2020:01:01 00:00:00",
        orientation=8, iso=12800, exposure=(1, 4), px_dim=1, py_dim=1,
    )[6:]
    tail = b"EXIF" + struct.pack("<I", len(exif)) + exif
    got = _webp_metadata(clean + tail)  # junk AFTER declared RIFF end
    assert got == base and "orientation" not in got


# ------------------------------------------------------- MJPEG-in-AVI (r5)


def test_avi_mjpeg_pixels_match_per_frame_jpeg_decode():
    """decode path cross-check: every sampled frame's pixel stats must
    equal running the JPEG decoder directly on that frame's bytes."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _avi_video_pixels,
        _jpeg_pixels,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    frames = [
        encode_jpeg(16, 8, lambda x, y, f=f: (37 * f + 5 * (x // 8) + 7 * (y // 8)) % 256)
        for f in range(5)
    ]
    avi = encode_avi_mjpeg(16, 8, 250_000, frames)
    # every_ms=250 → step 1: all five frames
    got = _avi_video_pixels(avi, 250)
    assert [g[0] for g in got] == [0, 1, 2, 3, 4]
    assert [g[1] for g in got] == [0, 250, 500, 750, 1000]
    for i, ts, w, h, ch, psum, psq in got:
        ew, eh, ech, raw = _jpeg_pixels(frames[i])
        assert (w, h, ch) == (ew, eh, ech) == (16, 8, 1)
        assert psum == sum(raw) and psq == sum(v * v for v in raw)
    # every_ms=500 → step 2: frames 0, 2, 4
    assert [g[0] for g in _avi_video_pixels(avi, 500)] == [0, 2, 4]


def test_avi_mjpeg_color_lossless_closed_form():
    """Per-block-constant luma + constant chroma → the DC quant round
    trip is exactly lossless; assert the closed form the oracle uses."""
    import math

    from data_lake_skyfit_spark.llm.multimodal import (
        _avi_video_pixels,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    rid, cb, cr = 7, 129, 126
    w, h, nf = 16, 16, 3
    frames = [
        encode_jpeg(
            w, h,
            lambda x, y, f=f: (3 * rid + 11 * f + 5 * (x // 8) + 7 * (y // 8)) % 256,
            color=True, cb=cb, cr=cr,
        )
        for f in range(nf)
    ]
    got = _avi_video_pixels(encode_avi_mjpeg(w, h, 250_000, frames), 250)

    def clamp(v: float) -> int:
        return min(255, max(0, math.floor(v + 0.5)))

    for i, _ts, gw, gh, ch, psum, _psq in got:
        assert (gw, gh, ch) == (w, h, 3)
        want = 0
        for bx in range(w // 8):
            for by in range(h // 8):
                yv = (3 * rid + 11 * i + 5 * bx + 7 * by) % 256
                r = clamp(yv + 1.402 * (cr - 128))
                g = clamp(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
                b = clamp(yv + 1.772 * (cb - 128))
                want += 64 * (r + g + b)
        assert psum == want


def test_avi_dib_pixels_and_fake_path(spark):
    """DIB frames sum raw channel bytes (strf dims); non-AVI payloads
    take the deterministic fake path with pixel_sum null."""
    from data_lake_skyfit_spark.llm.multimodal import (
        decode_video_pixels,
        encode_avi_dib,
    )

    w, h = 4, 3
    fr = [bytes((i * 17 + j) % 256 for j in range(w * h * 3)) for i in range(2)]
    avi = encode_avi_dib(w, h, 500_000, fr)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not a container"))],
        "doc_id long, payload binary",
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): r
        for r in decode_video_pixels(df, every_ms=500).collect()
    }
    for i in range(2):
        r = rows[(1, i)]
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 3)
        assert r["pixel_sum"] == sum(fr[i])
    fakes = [k for k in rows if k[0] == 2]
    assert fakes and all(rows[k]["pixel_sum"] is None for k in fakes)


def test_avi_mjpeg_corrupt_frame_falls_to_fake_path(spark):
    """A truncated JPEG frame inside an otherwise-valid AVI must not
    kill the task: whole payload falls to the fake path (null sums)."""
    from data_lake_skyfit_spark.llm.multimodal import (
        decode_video_pixels,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    good = encode_jpeg(8, 8, lambda x, y: 100)
    avi = encode_avi_mjpeg(8, 8, 250_000, [good, good[: len(good) // 2]])
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id long, payload binary")
    rows = decode_video_pixels(df, every_ms=250).collect()
    assert rows and all(r["pixel_sum"] is None for r in rows)


# ------------------------------------------------------------- FLAC (r5)


def _crc8_ref(data: bytes) -> int:
    """Independent table-driven CRC-8/0x07 (not the module's bitwise
    form) — the golden must not share arithmetic with the codec."""
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    c = 0
    for b in data:
        c = tbl[c ^ b]
    return c


def _crc16_ref(data: bytes) -> int:
    tbl = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ tbl[(c >> 8) ^ b]
    return c


def test_flac_encoder_byte_golden():
    """Pin the WIRE CONVENTION byte-for-byte (the GIF LZW lesson:
    round-trips prove nothing): hand-assemble the expected stream for
    samples (3, -2, 5, 7) — fixed-order-1 subframe, Rice param 3,
    hand-derived bit packing — with independent CRC implementations."""
    import hashlib as _hl

    from data_lake_skyfit_spark.llm.multimodal import _flac_samples, encode_flac

    got = encode_flac(8000, (3, -2, 5, 7), block_size=256)

    body = struct.pack(">HH", 256, 256) + bytes(6)
    body += ((8000 << 44) | (0 << 41) | (15 << 36) | 4).to_bytes(8, "big")
    body += _hl.md5(b"\x03\x00\xfe\xff\x05\x00\x07\x00").digest()
    want = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + body
    # frame header: sync/fixed-blocking, bs code 7 (16-bit at end),
    # sr from STREAMINFO, mono, 16-bit, frame #0, blocksize-1 = 3
    hdr = bytes([0xFF, 0xF8, 0x70, 0x08, 0x00, 0x00, 0x03])
    hdr += bytes([_crc8_ref(hdr)])
    # subframe FIXED order 1 (residual |sum| 14 beats orders 0/2/3),
    # warmup 0x0003, then method 00 + partition order 0000 + param 0011
    # + rice(u=9:01 001, u=14:01 110, u=4:1 100) = 0x00 0xD2 0xEC
    frame = hdr + bytes([0x12, 0x00, 0x03, 0x00, 0xD2, 0xEC])
    want += frame + struct.pack(">H", _crc16_ref(frame))
    assert got == want
    assert _flac_samples(want)[3] == (3, -2, 5, 7)


def test_flac_hand_assembled_verbatim_frame_decodes():
    """Decoder-only golden: a hand-built stream the encoder never
    emits (VERBATIM subframe, 8-bit block size code)."""
    from data_lake_skyfit_spark.llm.multimodal import _flac_samples

    body = struct.pack(">HH", 4, 4) + bytes(6)
    body += ((8000 << 44) | (0 << 41) | (15 << 36) | 4).to_bytes(8, "big")
    body += bytes(16)  # zero MD5: decoder skips the PCM check
    data = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + body
    hdr = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x03])  # bs code 6: 8-bit
    hdr += bytes([_crc8_ref(hdr)])
    sub = bytes([0x02]) + struct.pack(">4h", 3, -2, 5, 7)  # VERBATIM
    frame = hdr + sub
    data += frame + struct.pack(">H", _crc16_ref(frame))
    assert _flac_samples(data) == (8000, 4, 1, (3, -2, 5, 7))


def test_flac_roundtrip_all_subframe_and_stereo_paths():
    from data_lake_skyfit_spark.llm.multimodal import _flac_samples, encode_flac

    # mono: constant, smooth (high fixed orders), lattice, partial block
    for n in (1, 256, 300, 1000):
        sam = tuple(((k * 7919 + 104729) % 65536) - 32768 for k in range(n))
        assert _flac_samples(encode_flac(8000, sam))[3] == sam
    sam = (-7,) * 600
    assert _flac_samples(encode_flac(16000, sam))[3] == sam
    # stereo across >= 4 frames: all four channel assignments
    # (independent, left/side, right/side, mid/side) + LPC subframes
    sam = tuple(
        ((k * 7919 + (k % 2) * 31 + 104729) % 65536) - 32768
        for k in range(2 * 256 * 5)
    )
    sr, nf, nc, got = _flac_samples(encode_flac(44100, sam, n_channels=2))
    assert (sr, nf, nc) == (44100, 1280, 2) and got == sam
    # full-scale extremes survive the side channel's 17-bit width
    sam = (32767, -32768) * 300
    assert _flac_samples(encode_flac(8000, sam, n_channels=2))[3] == sam


def test_flac_rejects_corruption_and_lies():
    from data_lake_skyfit_spark.llm.multimodal import _flac_samples, encode_flac

    sam = tuple(((k * 131) % 65536) - 32768 for k in range(300))
    good = encode_flac(8000, sam)
    with pytest.raises(ValueError):
        _flac_samples(b"fLaC" + b"junk junk junk")
    with pytest.raises(ValueError):
        _flac_samples(good[:-1])  # truncated footer
    bad = bytearray(good)
    bad[-40] ^= 0x10  # flip a residual bit → CRC-16 must catch it
    with pytest.raises(ValueError):
        _flac_samples(bytes(bad))
    bad = bytearray(good)
    # STREAMINFO total-samples field lies (last byte of the packed u64)
    bad[8 + 17] ^= 0x01
    with pytest.raises(ValueError):
        _flac_samples(bytes(bad))
    bad = bytearray(good)
    bad[8 + 18] ^= 0xFF  # corrupt the STREAMINFO MD5
    with pytest.raises(ValueError, match="MD5"):
        _flac_samples(bytes(bad))
    # corrupt frame-header byte → CRC-8 (find first frame: after
    # 4 + 4 + 34 metadata bytes)
    bad = bytearray(good)
    bad[42 + 4] ^= 0x40  # frame number byte
    with pytest.raises(ValueError):
        _flac_samples(bytes(bad))


def test_flac_shared_pcm_contract_feeds_vad_and_features(spark):
    """The r4e lesson made concrete: routing FLAC through _pcm_samples
    means VAD and feature extraction gain the codec with no new code."""
    from pyspark.sql import functions as F

    from data_lake_skyfit_spark.llm.multimodal import (
        audio_vad_frames,
        extract_embeddings,
        synthesize_flac_payloads,
    )

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    media = synthesize_flac_payloads(docs).localCheckpoint(eager=False)
    vad = audio_vad_frames(media, frame_size=50).collect()
    by_doc: dict = {}
    for r in vad:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rid in range(4):
        ch = 1 + rid % 2
        nfr = 150 + (rid % 7) * 25
        assert len(by_doc[rid]) == nfr // 50
        sam = [((k * 7919 + rid * 104729) % 65536) - 32768 for k in range(nfr * ch)]
        want0 = sum(v * v for v in sam[: 50 * ch])
        got0 = [r for r in by_doc[rid] if r["frame_idx"] == 0][0]
        assert got0["energy"] == want0 and got0["active"] == 1
    feats = {
        r["doc_id"]: r["f"]
        for r in extract_embeddings(media, dims=8)
        .select("doc_id", F.element_at("features", 4).alias("f"))
        .collect()
    }
    for rid in range(4):
        ch = 1 + rid % 2
        n = (150 + (rid % 7) * 25) * ch
        sam = [((k * 7919 + rid * 104729) % 65536) - 32768 for k in range(n)]
        assert feats[rid] == sum(sam) / n  # byte_mean analog: sample mean


def test_mp4_mjpeg_pixels_match_per_sample_jpeg_decode():
    """MJPEG-in-MP4: every sampled frame's pixel stats must equal the
    JPEG decoder run directly on that sample's bytes; foreign-codec
    samples raise to the fake path."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _jpeg_pixels,
        _mp4_video_pixels,
        encode_jpeg,
        encode_mp4_frames,
    )

    frames = [
        encode_jpeg(16, 8, lambda x, y, f=f: (29 * f + 5 * (x // 8) + 7 * (y // 8)) % 256)
        for f in range(5)
    ]
    mp4 = encode_mp4_frames(frames, frame_duration_ms=500, codec="jpeg")
    got = _mp4_video_pixels(mp4, 1)  # every sample
    assert [g[0] for g in got] == [0, 1, 2, 3, 4]
    assert [g[1] for g in got] == [0, 500, 1000, 1500, 2000]
    for i, _ts, w, h, ch, psum, psq in got:
        ew, eh, ech, raw = _jpeg_pixels(frames[i])
        assert (w, h, ch) == (ew, eh, ech) and psum == sum(raw)
        assert psq == sum(v * v for v in raw)
    # sample-and-hold at 1000 ms: frames 0, 2, 4
    assert [g[0] for g in _mp4_video_pixels(mp4, 1000)] == [0, 2, 4]
    # opaque-codec samples must not fake pixel stats
    opaque = encode_mp4_frames([b"not jpeg bytes " * 4], codec="skyf")
    with pytest.raises(ValueError):
        _mp4_video_pixels(opaque, 1)


def test_flac_decimation_roundtrip(spark):
    """resample_audio over a frame-bearing FLAC: decode -> integer
    decimation -> FLAC re-encode; the output stream decodes to exactly
    every factor-th input sample at the divided rate."""
    from pyspark.sql import functions as F

    from data_lake_skyfit_spark.llm.multimodal import (
        _flac_samples,
        encode_flac,
        resample_audio,
    )

    sam = tuple(((k * 7919 + 104729) % 65536) - 32768 for k in range(600))
    payload = encode_flac(16000, sam)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    [r] = resample_audio(df, factor=4).collect()
    assert (r["sample_rate"], r["n_samples"]) == (4000, 150)
    sr, nf, nc, got = _flac_samples(bytes(r["payload"]))
    assert (sr, nf, nc) == (4000, 150, 1) and got == sam[::4]


# ------------------------------------------------------- WebP VP8L (r5)


def _vp8l_riff(body: bytes) -> bytes:
    payload = b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        payload += b"\x00"
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _vp8l_header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple_code(bw, syms):
    """Write a 1-2 symbol simple prefix code; returns symbol->(code,len)
    (smaller symbol takes bit 0 — canonical)."""
    bw.write(1, 1)
    bw.write(len(syms) - 1, 1)
    if len(syms) == 1 and syms[0] <= 1:
        bw.write(0, 1)
        bw.write(syms[0], 1)
    else:
        bw.write(1, 1)
        bw.write(syms[0], 8)
    if len(syms) == 2:
        bw.write(syms[1], 8)
        a, b = sorted(syms)
        return {a: (0, 1), b: (1, 1)}
    return {syms[0]: (0, 0)}


def test_vp8l_encoder_byte_golden_single_pixel():
    """Pin the WIRE CONVENTION byte-for-byte: hand-assemble the
    expected stream for a 1×1 image with an INDEPENDENT LSB bit
    packer (plain ints, no module code)."""
    from data_lake_skyfit_spark.llm.multimodal import encode_webp_lossless

    got = encode_webp_lossless(1, 1, lambda x, y: (3, 7, 9))

    bits = []  # (value, nbits), LSB-first
    bits += [(0, 14), (0, 14), (0, 1), (0, 3)]  # w-1, h-1, alpha, version
    bits += [(0, 1), (0, 1), (0, 1)]  # no transform, no cache, no meta
    for sym in (7, 3, 9, 255):  # green, red, blue, alpha simple codes
        bits += [(1, 1), (0, 1), (1, 1), (sym, 8)]
    bits += [(1, 1), (0, 1), (0, 1), (0, 1)]  # distance: 1-bit symbol 0
    # payload: every code is single-symbol -> zero bits
    acc = n = 0
    out = bytearray()
    for v, b in bits:
        acc |= (v & ((1 << b) - 1)) << n
        n += b
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    assert got == _vp8l_riff(b"\x2f" + bytes(out))


def test_vp8l_dist_map_invariants():
    """Structural pin on the spec's 2-D short-distance table: 120
    unique upper-half-plane offsets in non-decreasing squared-distance
    order."""
    from data_lake_skyfit_spark.llm.multimodal import _VP8L_DIST_MAP

    assert len(_VP8L_DIST_MAP) == 120
    assert len(set(_VP8L_DIST_MAP)) == 120
    prev = 0
    for dx, dy in _VP8L_DIST_MAP:
        assert 0 <= dy <= 7 and -8 <= dx <= 8
        assert dy > 0 or dx > 0
        d2 = dx * dx + dy * dy
        assert d2 >= prev
        prev = d2


def test_vp8l_hand_stream_color_cache():
    """Decoder-only golden: a 3×1 stream with a 2-entry color cache —
    literal p2, then two cache hits. Cache symbols live above 255 so
    the green tree is hand-built in the CODE-LENGTH-CODED form."""
    from data_lake_skyfit_spark.llm.multimodal import _LsbBitWriter, _vp8l_pixels

    # find a pixel with green=5 whose 1-bit cache hash index is 1
    p2 = None
    for r in range(256):
        cand = (255 << 24) | (r << 16) | (5 << 8) | 6
        if ((cand * 0x1E35A7BD) & 0xFFFFFFFF) >> 31 == 1:
            p2 = cand
            break
    assert p2 is not None
    r2 = (p2 >> 16) & 0xFF
    cache_sym = 280 + 1  # alphabet 256 + 24 + 2 = 282; index 1
    bw = _LsbBitWriter()
    _vp8l_header(bw, 3, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(1, 4)  # cache_bits = 1
    bw.write(0, 1)  # no meta
    # green tree: lengths[5] = 1, lengths[281] = 1 over alphabet 282,
    # code-length-coded: RLE = 17(run 5), 1, 18(run 138), 18(run 137), 1
    bw.write(0, 1)  # not simple
    bw.write(0, 4)  # num_code_lengths = 4 (order: 17, 18, 0, 1)
    for ln in (2, 2, 0, 1):
        bw.write(ln, 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl = {1: (0, 1), 17: (0b10, 2), 18: (0b11, 2)}

    def put(sym, code_map=cl):
        c, ln = code_map[sym]
        bw.write_code(c, ln)

    put(17)
    bw.write(5 - 3, 3)
    put(1)
    put(18)
    bw.write(138 - 11, 7)
    put(18)
    bw.write(137 - 11, 7)
    put(1)
    _simple_code(bw, [r2])  # red
    _simple_code(bw, [6])  # blue
    _simple_code(bw, [255])  # alpha
    _simple_code(bw, [0])  # distance
    # greens canonical over {5, 281}: 5 -> code 0, 281 -> code 1
    bw.write_code(0, 1)  # literal p2 (r/b/a codes consume 0 bits)
    bw.write_code(1, 1)  # cache hit
    bw.write_code(1, 1)  # cache hit
    w, h, ch, raw = _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done()))
    assert (w, h, ch) == (3, 1, 4)
    assert raw == bytes((r2, 5, 6, 255)) * 3


def _cl_prefix(bw, lengths):
    """Write a prefix code in the CODE-LENGTH-CODED form for a lengths
    list whose values are all in {0, 1, 2} (every symbol emitted
    literally under a fixed 3-symbol code-length code); returns the
    symbol -> (code, length) map."""
    from data_lake_skyfit_spark.llm.multimodal import _vp8l_canonical_codes

    assert all(l in (0, 1, 2) for l in lengths)
    bw.write(0, 1)  # not simple
    bw.write(5 - 4, 4)  # order prefix: 17, 18, 0, 1, 2
    for ln in (0, 0, 1, 2, 2):
        bw.write(ln, 3)
    bw.write(0, 1)  # no explicit max_symbol
    cmap = {0: (0, 1), 1: (0b10, 2), 2: (0b11, 2)}
    for l in lengths:
        c, n = cmap[l]
        bw.write_code(c, n)
    return _vp8l_canonical_codes(lengths)


def test_vp8l_hand_stream_palette_packed():
    """Decoder-only golden: COLOR_INDEXING with a delta-coded 2-color
    palette and 8-pixels-per-byte sub-byte packing."""
    from data_lake_skyfit_spark.llm.multimodal import _LsbBitWriter, _vp8l_pixels

    c0 = (10, 200, 30)
    c1 = (90, 40, 160)
    d = tuple((b - a) & 0xFF for a, b in zip(c0, c1))
    bw = _LsbBitWriter()
    _vp8l_header(bw, 8, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(1, 8)  # n_colors - 1
    # palette image (2x1) follows its transform header immediately:
    # entry0 literal, entry1 delta-coded
    bw.write(0, 1)  # no cache
    g_codes = _simple_code(bw, [c0[1], d[1]])
    r_codes = _simple_code(bw, [c0[0], d[0]])
    b_codes = _simple_code(bw, [c0[2], d[2]])
    a_codes = _simple_code(bw, [255, 0])  # alpha 255 then delta 0
    _simple_code(bw, [0])  # distance
    for rr, gg, bb, aa in ((c0[0], c0[1], c0[2], 255), (d[0], d[1], d[2], 0)):
        for codes, sym in ((g_codes, gg), (r_codes, rr), (b_codes, bb), (a_codes, aa)):
            c, n = codes[sym]
            bw.write_code(c, n)
    bw.write(0, 1)  # end of transforms
    # packed main image 1x1: index pattern 0,1,1,0,1,0,0,1 -> green
    # byte 0b10010110 (first pixel in the LOW bits)
    idx = [0, 1, 1, 0, 1, 0, 0, 1]
    packed = sum(v << k for k, v in enumerate(idx))
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _simple_code(bw, [packed])  # green
    _simple_code(bw, [0])  # red
    _simple_code(bw, [0])  # blue
    _simple_code(bw, [0])  # alpha
    _simple_code(bw, [0])  # distance
    w, h, ch, raw = _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done()))
    assert (w, h, ch) == (8, 1, 4)
    want = b"".join(
        bytes((*(c1 if v else c0), 255)) for v in idx
    )
    assert raw == want


def test_vp8l_hand_stream_predictor_transform():
    """Decoder-only golden: PREDICTOR transform, block size 4, mode 2
    (top) in the block image; border rules (black at origin, L on the
    top row, T on the left column) hand-verified."""
    from data_lake_skyfit_spark.llm.multimodal import _LsbBitWriter, _vp8l_pixels

    actual = [
        [(10, 20, 30), (11, 21, 31), (12, 22, 32), (13, 23, 33)],
        [(5, 6, 7), (6, 7, 8), (7, 8, 9), (8, 9, 10)],
    ]
    # residuals per the decoder's border + mode-2 rules
    resid = []
    for y in range(2):
        for x in range(4):
            r, g, b = actual[y][x]
            if x == 0 and y == 0:
                pr, pg, pb, pa = 0, 0, 0, 255
            elif y == 0:
                pr, pg, pb = actual[0][x - 1]
                pa = 255
            else:
                pr, pg, pb = actual[y - 1][x]  # left col T; mode 2 = T
                pa = 255
            resid.append(
                ((r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF, (255 - pa) & 0xFF)
            )
    bw = _LsbBitWriter()
    _vp8l_header(bw, 4, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 block image
    # block image (1x1): mode 2 in the green channel
    bw.write(0, 1)  # no cache
    _simple_code(bw, [2])  # green = mode
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    bw.write(0, 1)  # end of transforms
    # main image: residual literals; greens/reds/blues have 3+ distinct
    # values -> code-length-coded trees with lengths in {1,2}
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    def tree(vals, alphabet):
        uniq = sorted(set(vals))
        lengths = [0] * alphabet
        if len(uniq) == 1:
            return _simple_code(bw, [uniq[0]])
        if len(uniq) == 2:
            return _simple_code(bw, uniq)
        assert len(uniq) <= 4
        # give the first symbol length 1 and the next two length 2
        # (kraft-complete only for exactly 3 symbols)
        assert len(uniq) == 3
        lengths[uniq[0]] = 1
        lengths[uniq[1]] = lengths[uniq[2]] = 2
        return _cl_prefix(bw, lengths)

    g_codes = tree([q[1] for q in resid], 256 + 24)
    r_codes = tree([q[0] for q in resid], 256)
    b_codes = tree([q[2] for q in resid], 256)
    a_codes = tree([q[3] for q in resid], 256)
    _simple_code(bw, [0])  # distance
    for rr, gg, bb, aa in resid:
        for codes, sym in ((g_codes, gg), (r_codes, rr), (b_codes, bb), (a_codes, aa)):
            c, n = codes[sym]
            bw.write_code(c, n)
    w, h, ch, raw = _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done()))
    assert (w, h, ch) == (4, 2, 4)
    want = b"".join(
        bytes((*actual[y][x], 255)) for y in range(2) for x in range(4)
    )
    assert raw == want


def test_vp8l_hand_stream_color_transform():
    """Decoder-only golden: COLOR transform inverse with hand-computed
    signed deltas — g2r=16, g2b=-16 (0xF0), r2b=8 on stored
    (r=100, g=200, b=50): delta(16, -56) = -28 -> r=72;
    delta(-16, -56) = 28 -> b=78; delta(8, 72) = 18 -> b=96."""
    from data_lake_skyfit_spark.llm.multimodal import _LsbBitWriter, _vp8l_pixels

    bw = _LsbBitWriter()
    _vp8l_header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(0, 3)  # size_bits = 2
    # transform image (1x1): blue=g2r=16, green=g2b=0xF0, red=r2b=8
    bw.write(0, 1)
    _simple_code(bw, [0xF0])  # green
    _simple_code(bw, [8])  # red
    _simple_code(bw, [16])  # blue
    _simple_code(bw, [0])  # alpha
    _simple_code(bw, [0])  # distance
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _simple_code(bw, [200])  # green
    _simple_code(bw, [100])  # red
    _simple_code(bw, [50])  # blue
    _simple_code(bw, [255])  # alpha
    _simple_code(bw, [0])  # distance
    w, h, ch, raw = _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done()))
    assert (w, h, ch) == (2, 1, 4)
    assert raw == bytes((72, 200, 96, 255)) * 2


def test_vp8l_hand_stream_2d_distance_code():
    """Decoder-only golden: a backward reference through 2-D distance
    code 1 = (0, 1) -> dist = row width (copy the row above)."""
    from data_lake_skyfit_spark.llm.multimodal import _LsbBitWriter, _vp8l_pixels

    bw = _LsbBitWriter()
    _vp8l_header(bw, 2, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # greens: literal 7 and length symbol 256 + 1 (length prefix value
    # 1 -> length 2): two symbols, one above 255 -> code-length form
    lengths = [0] * (256 + 24)
    lengths[7] = 1
    lengths[257] = 1
    g_codes = _cl_prefix(bw, lengths)
    _simple_code(bw, [3])  # red
    _simple_code(bw, [9])  # blue
    _simple_code(bw, [255])  # alpha
    _simple_code(bw, [0])  # distance: prefix value 0 -> dist_code 1
    c, n = g_codes[7]
    bw.write_code(c, n)  # literal (3,7,9)
    bw.write_code(c, n)  # literal again (fills row 0)
    c, n = g_codes[257]
    bw.write_code(c, n)  # copy length 2, dist_code 1 = (0,1) -> dist 2
    w, h, ch, raw = _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done()))
    assert (w, h, ch) == (2, 2, 4)
    assert raw == bytes((3, 7, 9, 255)) * 4


def test_vp8l_hand_stream_meta_prefix_groups():
    """Decoder-only golden: an entropy image selecting DIFFERENT prefix
    groups for the two halves of an 8-wide row (meta block size 4)."""
    from data_lake_skyfit_spark.llm.multimodal import _LsbBitWriter, _vp8l_pixels

    bw = _LsbBitWriter()
    _vp8l_header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix codes present
    bw.write(0, 3)  # block bits = 2 -> 4-wide blocks -> 2x1 meta image
    # meta image: group ids 0 and 1 in (red<<8 | green)
    bw.write(0, 1)  # no cache (subimage)
    g = _simple_code(bw, [0, 1])  # greens 0 and 1
    _simple_code(bw, [0])  # red
    _simple_code(bw, [0])  # blue
    _simple_code(bw, [0])  # alpha
    _simple_code(bw, [0])  # distance
    for sym in (0, 1):
        c, n = g[sym]
        bw.write_code(c, n)
    # group 0 codes then group 1 codes (all single-symbol)
    for gg, rr, bb in ((11, 12, 13), (21, 22, 23)):
        _simple_code(bw, [gg])
        _simple_code(bw, [rr])
        _simple_code(bw, [bb])
        _simple_code(bw, [255])
        _simple_code(bw, [0])
    # payload: 8 literals, all zero-bit codes
    w, h, ch, raw = _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done()))
    assert (w, h, ch) == (8, 1, 4)
    assert raw == bytes((12, 11, 13, 255)) * 4 + bytes((22, 21, 23, 255)) * 4


def test_vp8l_rejects_corruption_and_lies():
    from data_lake_skyfit_spark.llm.multimodal import (
        _LsbBitWriter,
        _vp8l_pixels,
        encode_webp_lossless,
    )

    good = encode_webp_lossless(6, 5, lambda x, y: (x * 40 % 256, y * 50 % 256, 7))
    with pytest.raises(ValueError):
        _vp8l_pixels(good[:-4])  # truncated chunk
    with pytest.raises(ValueError):
        _vp8l_pixels(b"RIFF\x04\x00\x00\x00WEBP")  # no VP8L chunk
    bad = bytearray(good)
    vp8l_at = bytes(bad).find(b"VP8L") + 8
    bad[vp8l_at] = 0x2E  # wrong signature byte
    with pytest.raises(ValueError):
        _vp8l_pixels(bytes(bad))
    # absurd declared dims must be rejected before allocation
    bw = _LsbBitWriter()
    bw.write((1 << 14) - 1, 14)
    bw.write((1 << 14) - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    with pytest.raises(ValueError, match="absurd"):
        _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done() + b"\x00" * 16))
    # backward reference before any pixel exists
    bw = _LsbBitWriter()
    _vp8l_header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    lengths = [0] * (256 + 24)
    lengths[256] = 1  # only a length symbol: first token is a copy
    _cl_prefix(bw, lengths)
    for syms in ([0], [0], [0], [0]):
        _simple_code(bw, syms)
    with pytest.raises(ValueError, match="out of range|truncated"):
        _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done() + b"\x00" * 4))


def test_vp8l_feeds_image_feature_and_dhash_paths(spark):
    """decode_images and the shared channel-bytes contract gain WebP:
    real pixel sums on Spark, and _image_channel_bytes serves the
    feature tier."""
    from pyspark.sql import functions as F

    from data_lake_skyfit_spark.llm.multimodal import (
        _image_channel_bytes,
        decode_images,
        synthesize_webp_lossless_payloads,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    rows = {
        r["doc_id"]: r
        for r in decode_images(synthesize_webp_lossless_payloads(docs)).collect()
    }
    for rid in range(6):
        w, h = 8 + rid % 9, 6 + rid % 7
        want = 255 * w * h
        for y in range(h):
            for x in range(w):
                bx, by = x // 4, y // 2
                want += (3 * rid + 5 * bx + 7 * by) % 256
                want += (11 * rid + 3 * bx + 13 * by) % 256
                want += (7 * rid + 9 * bx + by) % 256
        r = rows[rid]
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 4)
        assert r["pixel_sum"] == want
    from data_lake_skyfit_spark.llm.multimodal import encode_webp_lossless

    got = _image_channel_bytes(encode_webp_lossless(3, 2, lambda x, y: (x, y, 5)))
    assert got is not None and got[:3] == (3, 2, 4)


def test_flac_rejects_ballooning_streams_before_allocation():
    """Code-review r5: a crafted stream must not expand unbounded
    before the count check — lying STREAMINFO totals are capped, and a
    frame stream overrunning the declared total raises mid-decode."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _MAX_MEDIA_BYTES,
        _flac_samples,
        encode_flac,
    )

    good = bytearray(encode_flac(8000, tuple(range(-150, 150))))
    # STREAMINFO total-samples: declare more than the media cap
    packed = int.from_bytes(good[8 + 10 : 8 + 18], "big")
    lied = (packed & ~((1 << 36) - 1)) | (_MAX_MEDIA_BYTES // 2 + 1)
    good[8 + 10 : 8 + 18] = lied.to_bytes(8, "big")
    with pytest.raises(ValueError, match="cap"):
        _flac_samples(bytes(good))
    # frames overrunning a small declared total raise during the loop
    two = bytearray(encode_flac(8000, tuple(range(-150, 150)) * 2, block_size=256))
    packed = int.from_bytes(two[8 + 10 : 8 + 18], "big")
    two[8 + 10 : 8 + 18] = ((packed & ~((1 << 36) - 1)) | 10).to_bytes(8, "big")
    with pytest.raises(ValueError, match="exceed|differs"):
        _flac_samples(bytes(two))


def test_flac_stereo_decimation_keeps_frames(spark):
    """Code-review r5: stereo FLAC decimates whole FRAMES through the
    real path (a bare [::factor] would interleave channels; the old
    mono guard silently sent stereo to the fake path)."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _flac_samples,
        encode_flac,
        resample_audio,
    )

    frames = [(k * 37 % 1000 - 500, k * 91 % 1000 - 500) for k in range(300)]
    inter = tuple(v for fr in frames for v in fr)
    df = spark.createDataFrame(
        [(1, bytearray(encode_flac(8000, inter, n_channels=2)))],
        "doc_id long, payload binary",
    )
    [r] = resample_audio(df, factor=4).collect()
    assert (r["sample_rate"], r["n_samples"]) == (2000, 150)
    sr, nf, nc, got = _flac_samples(bytes(r["payload"]))
    want = tuple(v for fr in frames[::4] for v in fr)
    assert (sr, nf, nc) == (2000, 75, 2) and got == want


def test_vp8l_uniform_256_symbol_code_and_alpha_roundtrip():
    """Edge wires: (a) a 16x16 image hitting all 256 green values once
    gives a COMPLETE uniform 8-bit code whose code-length stream is a
    single repeated symbol (the zero-bit single-cl-code path on the
    wire); (b) 4-tuple pixels round-trip a varying alpha channel."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _vp8l_pixels,
        encode_webp_lossless,
    )

    data = encode_webp_lossless(16, 16, lambda x, y: (7, y * 16 + x, 9))
    w, h, ch, raw = _vp8l_pixels(data)
    assert (w, h, ch) == (16, 16, 4)
    for y in range(16):
        for x in range(16):
            assert raw[4 * (y * 16 + x) : 4 * (y * 16 + x) + 4] == bytes(
                (7, y * 16 + x, 9, 255)
            )

    def pix(x, y):
        return ((3 * x) % 256, (5 * y) % 256, 11, (40 + 7 * x + y) % 256)

    data = encode_webp_lossless(9, 5, pix)
    w, h, ch, raw = _vp8l_pixels(data)
    assert (w, h, ch) == (9, 5, 4)
    for y in range(5):
        for x in range(9):
            assert raw[4 * (y * 9 + x) : 4 * (y * 9 + x) + 4] == bytes(pix(x, y))


# ------------------------------------------------- r6 advice pins


def test_vp8l_select_predictor_tie_returns_top():
    """Spec/libwebp Select is `(pL < pT) ? L : T` — STRICT, so a tie
    returns TOP. The r5 `<=` returned LEFT on ties (common in gradient
    regions) and only real libwebp-encoded files would have caught it."""
    from data_lake_skyfit_spark.llm.multimodal import _vp8l_predict

    def argb(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    tl = argb(255, 10, 10, 10)
    top = argb(255, 20, 10, 10)  # pL = sum|TL-T| = 10
    left = argb(255, 10, 20, 10)  # pT = sum|TL-L| = 10 -> tie
    assert _vp8l_predict(11, left, top, tl, 0) == top
    # pL = sum|TL-T| is the prediction's distance from LEFT: a TOP
    # near TL (vertical edge) means the pixel tracks LEFT, and vice
    # versa.
    top_near_tl = argb(255, 15, 10, 10)  # pL = 5 < pT = 10 -> left
    assert _vp8l_predict(11, left, top_near_tl, tl, 0) == left
    left_near_tl = argb(255, 10, 15, 10)  # pT = 5 < pL = 10 -> top
    assert _vp8l_predict(11, left_near_tl, top, tl, 0) == top


def test_vp8l_hand_stream_select_predictor_with_tie():
    """Decoder-only golden: PREDICTOR transform, mode 11 (Select),
    residuals computed against the SPEC's strict `(pL < pT) ? L : T`
    rule — pixel (1,1) is an exact tie, so a <= decoder reconstructs
    the wrong pixel and this golden red-flags."""
    from data_lake_skyfit_spark.llm.multimodal import _LsbBitWriter, _vp8l_pixels

    actual = [
        [(10, 10, 10), (20, 10, 10), (30, 10, 10), (40, 10, 10)],
        [(10, 20, 10), (30, 10, 10), (40, 10, 10), (50, 10, 10)],
    ]

    def select(left, top, tl):
        pl = sum(abs(tl[i] - top[i]) for i in range(3))
        pt = sum(abs(tl[i] - left[i]) for i in range(3))
        return left if pl < pt else top  # alpha uniform: drops out

    # Verify the fixture really exercises a tie at (1,1)
    tie_pl = sum(abs(actual[0][0][i] - actual[0][1][i]) for i in range(3))
    tie_pt = sum(abs(actual[0][0][i] - actual[1][0][i]) for i in range(3))
    assert tie_pl == tie_pt and actual[0][1] != actual[1][0]

    resid = []
    for y in range(2):
        for x in range(4):
            r, g, b = actual[y][x]
            if x == 0 and y == 0:
                pr, pg, pb = 0, 0, 0
            elif y == 0:
                pr, pg, pb = actual[0][x - 1]  # top row: L
            elif x == 0:
                pr, pg, pb = actual[y - 1][x]  # left col: T
            else:
                pr, pg, pb = select(
                    actual[y][x - 1], actual[y - 1][x], actual[y - 1][x - 1]
                )
            resid.append(((r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF, 0))
    bw = _LsbBitWriter()
    _vp8l_header(bw, 4, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits=2 -> 4x4 blocks -> 1x1 block image
    bw.write(0, 1)  # no cache (block image)
    _simple_code(bw, [11])  # green channel carries the mode
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    _simple_code(bw, [0])
    bw.write(0, 1)  # end of transforms
    bw.write(0, 1)  # no cache (main image)
    bw.write(0, 1)  # no meta

    def tree(vals, alphabet):
        # fixture keeps every residual channel to <= 2 distinct values
        uniq = sorted(set(vals))
        assert len(uniq) <= 2
        if len(uniq) == 1:
            return _simple_code(bw, [uniq[0]])
        return _simple_code(bw, uniq)

    g_codes = tree([q[1] for q in resid], 256 + 24)
    r_codes = tree([q[0] for q in resid], 256)
    b_codes = tree([q[2] for q in resid], 256)
    a_codes = tree([q[3] for q in resid], 256)
    _simple_code(bw, [0])  # distance
    for rr, gg, bb, aa in resid:
        for codes, sym in ((g_codes, gg), (r_codes, rr), (b_codes, bb), (a_codes, aa)):
            c, n = codes[sym]
            bw.write_code(c, n)
    w, h, ch, raw = _vp8l_pixels(_vp8l_riff(b"\x2f" + bw.done()))
    assert (w, h, ch) == (4, 2, 4)
    want = b"".join(
        bytes((*actual[y][x], 255)) for y in range(2) for x in range(4)
    )
    assert raw == want


def test_vp8l_single_symbol_over_256_code_is_zero_bit_both_sides():
    """A code whose only used symbol is >= 256 can't take the simple
    form; in the code-length-coded form the writer must return the
    decoder's zero-bit single-symbol convention (r5 advice: it
    returned a 1-bit code, a latent payload desync)."""
    from data_lake_skyfit_spark.llm.multimodal import (
        _LsbBitReader,
        _LsbBitWriter,
        _vp8l_read_prefix_code,
        _vp8l_write_prefix_code,
    )

    lengths = [0] * 280
    lengths[260] = 1
    bw = _LsbBitWriter()
    codes = _vp8l_write_prefix_code(bw, lengths)
    assert codes == {260: (0, 0)}
    br = _LsbBitReader(bw.done(), 0)
    code = _vp8l_read_prefix_code(br, 280)
    assert code.single == 260
    pos_before = (br.pos, br.bit)
    assert code.read(br) == 260
    assert (br.pos, br.bit) == pos_before  # zero bits consumed per read


def test_flac_truncation_fuzz_only_raises_valueerror():
    """Every truncation point of a valid multi-frame stream must fail
    with ValueError — bare IndexError out of the frame-header walk
    crashed audio_vad_frames/extract_embeddings tasks (r5 advice)."""
    from data_lake_skyfit_spark.llm.multimodal import _flac_samples, encode_flac

    sam = tuple(((k * 7919 + 104729) % 65536) - 32768 for k in range(300))
    good = encode_flac(8000, sam, block_size=256)
    assert _flac_samples(good)[3] == sam
    for cut in range(4, len(good)):
        try:
            _flac_samples(good[:cut])
        except ValueError:
            pass  # the ONLY acceptable failure type


def test_flac_truncated_frame_takes_vad_fake_path(spark):
    """audio_vad_frames on a mid-frame-truncated FLAC payload must not
    kill the Spark task — it takes the deterministic fake path."""
    from data_lake_skyfit_spark.llm.multimodal import audio_vad_frames, encode_flac

    sam = tuple(((k * 31) % 65536) - 32768 for k in range(300))
    good = encode_flac(8000, sam, block_size=256)
    # cut inside the first audio frame's header region
    meta_end = good.index(b"\xff\xf8", 4)
    bad = good[: meta_end + 6]
    df = spark.createDataFrame(
        [(1, bytearray(bad))], "doc_id long, payload binary"
    )
    rows = audio_vad_frames(df, frame_size=50).collect()
    assert rows  # fake-path frames, task alive
    assert all(r["energy"] >= 1000 for r in rows)  # fake energies are 1000+d


def test_flac_24bit_streaminfo_keeps_metadata_contract():
    """A valid-but-unsupported (24-bit) frame-bearing stream keeps the
    exact STREAMINFO metadata contract instead of regressing to the
    fully-fake path (r5 advice)."""
    import pytest as _pytest

    from data_lake_skyfit_spark.llm.multimodal import (
        _FlacUnsupported,
        _decode_flac,
        _flac_samples,
        encode_flac,
    )

    sam = tuple(((k * 31) % 65536) - 32768 for k in range(200))
    raw = bytearray(encode_flac(8000, sam))
    # STREAMINFO packed word = bytes 18..26 (4 sig + 4 block hdr + 10)
    packed = int.from_bytes(raw[18:26], "big")
    assert (packed >> 36) & 0x1F == 15  # bps-1 for 16-bit
    packed = (packed & ~(0x1F << 36)) | (23 << 36)  # declare 24-bit
    raw[18:26] = packed.to_bytes(8, "big")
    data = bytes(raw)
    with _pytest.raises(_FlacUnsupported):
        _flac_samples(data)
    sr, n, dur, ssum, rms = _decode_flac(data)
    assert (sr, n, dur) == (8000, 200, 200 * 1000 // 8000)
    assert ssum is None and rms is None


def test_video_pixel_neardup_ignores_null_moment_frames(spark):
    """Two UNRELATED foreign-codec payloads whose fake paths happen to
    agree on dims must not pair up: concat_ws silently dropped the
    NULL moments and collapsed them to a dims-only fingerprint (r5
    advice). Null-moment frames are excluded from the pixel tier."""
    import hashlib

    from data_lake_skyfit_spark.llm.multimodal import video_neardup_pairs

    def fake_dims(payload: bytes):
        h = hashlib.md5(payload).digest()
        return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 3)

    base = b"foreign-codec-payload-"
    a = base + b"0"
    b = None
    for i in range(1, 100000):
        cand = base + str(i).encode()
        if fake_dims(cand) == fake_dims(a):
            b = cand
            break
    assert b is not None, "no fake-dims collision found in range"
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b))], "doc_id long, payload binary"
    )
    pairs = video_neardup_pairs(
        df, fingerprint="pixels", threshold_num=1, threshold_den=10
    ).collect()
    assert pairs == []


# ------------------------------------------------------- WebP VP8 lossy (r6)
# Reference-encoded goldens: the system libwebp (1.2.4) encoded these
# payloads and its own decoder produced the pinned plane digests — so
# this test validates the pure-Python decoder against the REFERENCE
# implementation's wire form with no libwebp needed at run time.

_VP8_GOLDEN1 = bytes.fromhex(  # 32x24 gradient, q50: segmentation + loop filter
    "524946468a00000057454250565038207e0000007005009d012a200018003ec9"
    "54a34ba7a4a321b0180c00f019096c009d328474978b6f4d98d384a064707c67"
    "2844d57ae173380000fefb79a8b2420b9e7c5db51b54e6a9731880f2a673f40c"
    "e0ec205e922b514d138cf47514127fa9b55cffbe95457f513f64c9b0df1cea01"
    "71e56408709341332b1eb5eed222d11a0000"
)

_VP8_GOLDEN2 = bytes.fromhex(  # 16x16 noise, q75: B_PRED-heavy single MB
    "52494646040100005745425056503820f80000007004009d012a100010000200"
    "3425b002747f03d81c94b5e25fe66ff39ee01faa1d0807878cbadaaf143a7000"
    "00fc8efb96be8c500adc1dcf0bd6f74e907b0be5075e5d4e48a88b2016f73692"
    "d951819a17d981189e2eaf387d2b8b9258ffcfbd5e13e8f33e784bda2eff82f2"
    "7fd753fff182d333f1cfd0ff9d98715b4999b2973813bd9fe6cc779ce2699577"
    "674d7ed51d50057d71ce3b7804fd7ee38ffeb7e33ebb573df6fc852c3cb4a140"
    "a772a194df01ca57884a03ec19c0087e605c0e9c9a12dfcca317b287e902e119"
    "3faffc71fe9fb40abf6cb8ef7a2504682d5e46f156ab0b346d7e3a90799e92ac"
    "1fccd5fc6fcb7031aa5c0000"
)


def _vp8_chunk_of(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        cid = webp[pos : pos + 4]
        (size,) = struct.unpack_from("<I", webp, pos + 4)
        if cid == b"VP8 ":
            return webp[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def test_vp8_reference_golden_segmented_gradient():
    import hashlib

    from data_lake_skyfit_spark.llm.vp8 import decode_vp8_keyframe

    w, h, y, u, v = decode_vp8_keyframe(_vp8_chunk_of(_VP8_GOLDEN1))
    assert (w, h) == (32, 24)
    assert hashlib.md5(y).hexdigest() == "08c40ea88f2045532254df7c828f752d"
    assert hashlib.md5(u).hexdigest() == "ca24d2ab36b4bb4f2d10092084982160"
    assert hashlib.md5(v).hexdigest() == "b71128618830ea01425c0f1d0e7d0bfb"
    assert (sum(y), sum(u), sum(v)) == (94727, 22650, 24816)


def test_vp8_reference_golden_bpred_noise():
    import hashlib

    from data_lake_skyfit_spark.llm.vp8 import decode_vp8_keyframe

    w, h, y, u, v = decode_vp8_keyframe(_vp8_chunk_of(_VP8_GOLDEN2))
    assert (w, h) == (16, 16)
    assert hashlib.md5(y).hexdigest() == "84782a40fd55f592bd9632769c3d5446"
    assert hashlib.md5(u).hexdigest() == "afb792afffa3860968c402c598356f25"
    assert hashlib.md5(v).hexdigest() == "4766ddb5c8e88a5976e2cd129c3e4467"
    assert (sum(y), sum(u), sum(v)) == (32076, 8057, 8239)


def test_vp8_bool_decoder_hand_stream():
    """Hand-derived §7.3 arithmetic: bytes 80 00 under prob 128.
    Step 1: value=0x8000, range=255 → split=1+((254*128)>>8)=128,
    big=0x8000; value>=big → bit 1, range=127, value=0; renorm doubles
    once.  Step 2: split=1+((253*128)>>8)=127, big=0x7F00; value 0 <
    big → bit 0.  All further reads see zero-fed value → 0 bits."""
    from data_lake_skyfit_spark.llm.vp8 import _BoolDecoder

    bd = _BoolDecoder(b"\x80\x00")
    assert bd.read(128) == 1
    assert bd.read(128) == 0
    assert [bd.read(128) for _ in range(6)] == [0] * 6


def test_vp8_bool_coder_roundtrip_exact():
    """Encoder interval math must reproduce arbitrary (prob, bit)
    sequences through the decoder, including carry-heavy runs."""
    import random

    from data_lake_skyfit_spark.llm.vp8 import _BoolDecoder, _BoolEncoder

    rnd = random.Random(42)
    for trial in range(25):
        seq = [
            (rnd.choice([1, 32, 128, 200, 254]), rnd.randrange(2))
            for _ in range(rnd.randrange(1, 400))
        ]
        be = _BoolEncoder()
        for p, b in seq:
            be.write(p, b)
        bd = _BoolDecoder(be.done())
        assert [bd.read(p) for p, _ in seq] == [b for _, b in seq], f"trial {trial}"


def test_vp8_flat_encoder_decoder_closed_form():
    from data_lake_skyfit_spark.llm.vp8 import (
        decode_vp8_keyframe,
        encode_webp_vp8_flat,
        vp8_flat_expected,
    )

    for rid in (0, 7, 23, 101, 555):
        w, h = 16 + rid % 49, 16 + rid % 33
        qi = (8, 24, 48, 80)[rid % 4]
        ty, tu, tv = 1 + rid % 40, 1 + rid % 12, 1 + (rid // 3) % 12
        data = encode_webp_vp8_flat(w, h, qindex=qi, y2dc_token=ty, u_token=tu, v_token=tv)
        ey, eu, ev = vp8_flat_expected(qi, ty, tu, tv)
        mw, mh, y, u, v = decode_vp8_keyframe(_vp8_chunk_of(data))
        assert (mw, mh) == (w, h)
        assert set(y) == {ey} and set(u) == {eu} and set(v) == {ev}


def test_vp8_decoder_rejects_malformed():
    import pytest as _pytest

    from data_lake_skyfit_spark.llm.vp8 import decode_vp8_keyframe

    good = _vp8_chunk_of(_VP8_GOLDEN1)
    # magic-prefixed junk, truncations, giant dims, interframe
    for bad in (
        b"",
        b"\x00" * 5,
        good[:9],
        good[:12],                                  # inside first partition
        bytes([good[0] | 1]) + good[1:],            # interframe bit
        good[:3] + b"\x9d\x01\x2b" + good[6:],      # bad start code
        good[:6] + b"\xff\x3f\xff\x3f" + good[10:], # 16383x16383 > pixel cap
        good[:6] + b"\x00\x00\x10\x00" + good[10:], # zero width
    ):
        with _pytest.raises(ValueError):
            decode_vp8_keyframe(bad)
    # corrupted interior bytes must decode-or-ValueError, never hang/crash
    for k in range(20, len(good), 13):
        mutated = bytearray(good)
        mutated[k] ^= 0x5A
        try:
            decode_vp8_keyframe(bytes(mutated))
        except ValueError:
            pass


def test_vp8_channel_bytes_contract():
    from data_lake_skyfit_spark.llm.multimodal import _image_channel_bytes
    from data_lake_skyfit_spark.llm.vp8 import encode_webp_vp8_flat, vp8_flat_expected

    data = encode_webp_vp8_flat(21, 19, qindex=40, y2dc_token=12, u_token=5, v_token=9)
    w, h, ch, raw = _image_channel_bytes(data)
    ey, eu, ev = vp8_flat_expected(40, 12, 5, 9)
    assert (w, h, ch) == (21, 19, 3)
    assert len(raw) == 21 * 19 * 3
    assert set(raw[0::3]) == {ey}
    assert set(raw[1::3]) == {eu}
    assert set(raw[2::3]) == {ev}


# --------------------------------------------------------- animated WebP (r6)


def test_webp_animation_container_layout():
    """Byte-level pin of the VP8X/ANIM/ANMF framing: flags, 24-bit
    canvas fields, duration, and the lifted image subchunk."""
    from data_lake_skyfit_spark.llm.multimodal import (
        encode_webp_animation,
        encode_webp_lossless,
    )

    still = encode_webp_lossless(3, 2, lambda x, y: (9, 8, 7))
    anim = encode_webp_animation(3, 2, [(250, still)], loop_count=5)
    assert anim[:4] == b"RIFF" and anim[8:12] == b"WEBP"
    assert anim[12:16] == b"VP8X"
    body = anim[20:30]
    assert body[0] == 0x02  # ANIM flag
    assert body[4:7] == (3 - 1).to_bytes(3, "little")
    assert body[7:10] == (2 - 1).to_bytes(3, "little")
    a = anim.find(b"ANIM")
    assert anim[a + 8 : a + 14] == b"\x00\x00\x00\x00\x05\x00"  # bg + loop 5
    m = anim.find(b"ANMF")
    hdr = anim[m + 8 : m + 24]
    assert hdr[0:6] == b"\x00" * 6  # x/2, y/2
    assert hdr[6:9] == (3 - 1).to_bytes(3, "little")
    assert hdr[9:12] == (2 - 1).to_bytes(3, "little")
    assert hdr[12:15] == (250).to_bytes(3, "little")
    assert hdr[15] == 2  # bit1 = do-not-blend, bit0 clear = dispose-none
    # the still's VP8L chunk rides verbatim inside the ANMF
    vl = still.find(b"VP8L")
    assert anim[m + 24 : m + 28] == b"VP8L"
    (sz,) = struct.unpack_from("<I", still, vl + 4)
    assert anim[m + 24 : m + 24 + 8 + sz] == still[vl : vl + 8 + sz]


def test_webp_animation_frames_decode_and_timing():
    from data_lake_skyfit_spark.llm.multimodal import (
        _webp_animation_frames,
        encode_webp_animation,
        encode_webp_lossless,
        encode_webp_vp8_flat,
    )
    from data_lake_skyfit_spark.llm.vp8 import vp8_flat_expected

    w, h = 11, 7
    s1 = encode_webp_lossless(w, h, lambda x, y: (10, 20, 30))
    s2 = encode_webp_vp8_flat(w, h, qindex=24, y2dc_token=5, u_token=3, v_token=4)
    anim = encode_webp_animation(w, h, [(100, s1), (250, s2), (40, s1)])
    recs = _webp_animation_frames(anim)
    y, u, v = vp8_flat_expected(24, 5, 3, 4)
    assert recs == [
        (0, 0, 100, w, h, 4, w * h * (10 + 20 + 30 + 255)),
        (1, 100, 250, w, h, 3, w * h * (y + u + v)),
        (2, 350, 40, w, h, 4, w * h * (10 + 20 + 30 + 255)),
    ]


def test_webp_animation_rejects_malformed():
    import pytest as _pytest

    from data_lake_skyfit_spark.llm.multimodal import (
        _webp_animation_frames,
        encode_webp_animation,
        encode_webp_lossless,
    )

    still = encode_webp_lossless(4, 4, lambda x, y: (1, 2, 3))
    anim = encode_webp_animation(4, 4, [(100, still)])
    for bad in (
        still,                 # no ANIM chunks at all
        anim[:30],             # truncated inside VP8X/ANIM
        anim[:-6],             # truncated inside the frame subchunk
    ):
        with _pytest.raises(ValueError):
            _webp_animation_frames(bad)
    # size-field corruption must never over-slice
    m = anim.find(b"ANMF")
    mutated = bytearray(anim)
    mutated[m + 4] = 0xFF  # ANMF declares more than the payload holds
    with _pytest.raises(ValueError):
        _webp_animation_frames(bytes(mutated))
