"""TIFF LZW / PackBits / Predictor-2 codec tests, libtiff-arbitrated.

Wire-convention discipline (CLAUDE.md r3/r6): a self-consistent
round-trip proves nothing about the off-by-ones of the LZW width
transition, so every convention is pinned against the system libtiff
in BOTH directions — libtiff-encoded strips through our decoder, our
encoder's strips through libtiff — across strip shapes that cross the
9→10→11→12-bit boundaries and the 4093-entry table clear.

Fuzz tier per the r4 decoder-hardening rules: header-declared sizes
validated before allocation, output growth bounded inside the decode
loop, magic-prefixed junk and corrupted-valid payloads all raise
ValueError (never hang, never balloon).

Reference-repo analog: media stays opaque blobs
(/root/reference/src/common/lake.py:59-71); this layer derives from
the public TIFF 6.0 spec + libtiff alone.
"""

from __future__ import annotations

import random

import pytest

from data_lake_skyfit_spark.llm import multimodal as mm

from . import libtiff_oracle

_ORACLE = libtiff_oracle.load()

needs_libtiff = pytest.mark.skipif(_ORACLE is None, reason="libtiff absent")


def _pixels(w: int, h: int, ch: int, seed: int) -> bytes:
    rng = random.Random(seed)
    # half random (incompressible), half structured (long LZW runs)
    return bytes(
        rng.randrange(256) if rng.random() < 0.5 else (x % 16)
        for _ in range(h)
        for x in range(w * ch)
    )


def _pixel_fn(px: bytes, w: int, ch: int):
    def pixel(x: int, y: int, c: int) -> int:
        return px[(y * w + x) * ch + c]

    return pixel


# ---------------------------------------------------------------- round trips


@pytest.mark.parametrize("comp,pred", [(1, 1), (5, 1), (5, 2), (32773, 1)])
@pytest.mark.parametrize("be", [False, True])
def test_self_roundtrip(comp: int, pred: int, be: bool) -> None:
    w, h, ch = 33, 21, 3
    px = _pixels(w, h, ch, seed=comp * 7 + pred)
    blob = mm.encode_tiff(
        w, h, _pixel_fn(px, w, ch), channels=ch, big_endian=be,
        compression=comp, predictor=pred, rows_per_strip=5,
    )
    assert mm._tiff_pixels(blob) == (w, h, ch, px)


@needs_libtiff
@pytest.mark.parametrize("comp,pred", [(5, 1), (5, 2), (32773, 1)])
@pytest.mark.parametrize(
    "w,h,ch", [(7, 5, 3), (64, 48, 1), (97, 33, 3), (128, 64, 3)]
)
def test_libtiff_encodes_we_decode(comp, pred, w, h, ch) -> None:
    px = _pixels(w, h, ch, seed=w * h)
    blob = _ORACLE.encode(
        w, h, ch, px, compression=comp, predictor=pred, rows_per_strip=16
    )
    assert mm._tiff_pixels(blob) == (w, h, ch, px)


@needs_libtiff
@pytest.mark.parametrize("comp,pred", [(5, 1), (5, 2), (32773, 1)])
@pytest.mark.parametrize(
    "w,h,ch", [(7, 5, 3), (64, 48, 1), (97, 33, 3), (128, 64, 3)]
)
@pytest.mark.parametrize("be", [False, True])
def test_we_encode_libtiff_decodes(comp, pred, w, h, ch, be) -> None:
    px = _pixels(w, h, ch, seed=w + h)
    blob = mm.encode_tiff(
        w, h, _pixel_fn(px, w, ch), channels=ch, big_endian=be,
        compression=comp, predictor=pred, rows_per_strip=5,
    )
    assert _ORACLE.decode(blob) == (w, h, ch, px)


@needs_libtiff
def test_table_clear_crossing_both_directions() -> None:
    # a 96 KiB incompressible single strip forces the LZW table past
    # 4093 entries → ClearCode mid-stream, and crosses every width
    w, h, ch = 256, 128, 3
    px = _pixels(w, h, ch, seed=99)
    blob = mm.encode_tiff(
        w, h, _pixel_fn(px, w, ch), channels=ch,
        compression=5, rows_per_strip=h,
    )
    assert _ORACLE.decode(blob)[3] == px
    assert mm._tiff_pixels(blob)[3] == px
    blob2 = _ORACLE.encode(w, h, ch, px, compression=5, rows_per_strip=h)
    assert mm._tiff_pixels(blob2)[3] == px


def test_decode_images_leg_sees_compressed_payloads() -> None:
    # the graded battery path: synthesized payloads now cycle the wire
    # by id%3 — decode must land identical sums for all three
    for rid in (3, 4, 7, 9, 12, 13):  # none / lzw(+pred2 on 7,13) / packbits
        w, h = 4 + rid % 13, 4 + rid % 11
        ch = 1 if rid % 4 == 0 else 3
        expect = sum(
            (7 * rid + 5 * x + 3 * y + 17 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )
        comp = (1, 5, 32773)[rid % 3]
        blob = mm.encode_tiff(
            w, h,
            lambda x, y, c, rid=rid: (7 * rid + 5 * x + 3 * y + 17 * c) % 256,
            channels=ch, big_endian=bool(rid % 2), compression=comp,
            predictor=2 if rid % 6 == 1 else 1,
        )
        got = mm._decode_tiff(blob)
        assert got == (w, h, ch, expect)


# --------------------------------------------------------------------- fuzz


def test_lzw_decode_bounded_output() -> None:
    # a replicate-forever stream must be stopped by the expected-size
    # bound INSIDE the loop, not after (r5 lesson)
    golden = mm._tiff_lzw_encode(b"a" * 10_000)
    with pytest.raises(ValueError):
        mm._tiff_lzw_decode(golden, 100)


def test_lzw_decode_truncated_and_junk() -> None:
    golden = mm._tiff_lzw_encode(bytes(range(256)) * 4)
    with pytest.raises(ValueError):
        mm._tiff_lzw_decode(golden[: len(golden) // 2], 1024)
    with pytest.raises(ValueError):
        # first code after clear must be a literal
        mm._tiff_lzw_decode(b"\xff\xff\xff\xff", 16)


def test_packbits_decode_bounded_and_truncated() -> None:
    with pytest.raises(ValueError):
        mm._tiff_packbits_decode(b"\x81a" * 1000, 100)  # overruns expected
    with pytest.raises(ValueError):
        mm._tiff_packbits_decode(b"\x05ab", 10)  # literal truncated
    with pytest.raises(ValueError):
        mm._tiff_packbits_decode(b"", 10)


def test_corrupted_valid_payload_raises_not_hangs() -> None:
    w, h, ch = 33, 21, 3
    px = _pixels(w, h, ch, seed=5)
    blob = bytearray(
        mm.encode_tiff(w, h, _pixel_fn(px, w, ch), channels=ch,
                       compression=5, rows_per_strip=5)
    )
    rng = random.Random(11)
    raised = 0
    for _ in range(200):
        mut = bytearray(blob)
        for _ in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            got = mm._tiff_pixels(bytes(mut))
            assert len(got[3]) == got[0] * got[1] * got[2]
        except ValueError:
            raised += 1
        except struct_error_types():
            raised += 1
    assert raised > 0  # corruption is detected, never a hang/balloon


def struct_error_types():
    import struct

    return struct.error


def test_predictor_rejects_unknown() -> None:
    w, h, ch = 8, 8, 3
    px = _pixels(w, h, ch, seed=1)
    blob = bytearray(
        mm.encode_tiff(w, h, _pixel_fn(px, w, ch), channels=ch,
                       compression=5, predictor=2, rows_per_strip=4)
    )
    # locate the predictor IFD entry (tag 317 LE) and flip its value to 3
    idx = bytes(blob).find(b"\x3d\x01\x03\x00\x01\x00\x00\x00\x02\x00")
    assert idx > 0
    blob[idx + 8] = 3
    with pytest.raises(ValueError):
        mm._tiff_pixels(bytes(blob))
