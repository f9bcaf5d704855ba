"""Cross-validation of the pure-Python WebP codecs against the system
libwebp (the reference implementation), via tests/libwebp_oracle.py.

This is the strongest wire-convention pin the sandbox allows: the r3
GIF lesson ("a self-consistent round-trip proves nothing") means every
codec needs an INDEPENDENT check, and for WebP the independent check
is libwebp itself.  Direction 1 (libwebp encodes, we decode) exercises
the reference encoder's full transform repertoire — predictor, color
transform, palette, subtract-green, color cache, 2-D LZ77 — against
our decoder; direction 2 (we encode, libwebp decodes) proves our
emitted streams follow the convention real-world decoders implement.

Skips cleanly when libwebp.so is absent (import-gated per the repo's
no-install rule); the hand-assembled byte goldens in
test_multimodal_codecs.py remain the always-on tier.
"""

from __future__ import annotations

import random

import pytest

from data_lake_skyfit_spark.llm.multimodal import (
    _vp8l_pixels,
    encode_webp_lossless,
)

from .libwebp_oracle import load

_LW = load()

pytestmark = pytest.mark.skipif(_LW is None, reason="libwebp not available")


def _pattern_rgba(seed: int, w: int, h: int) -> bytes:
    """Deterministic content families chosen to push the libwebp
    encoder into each transform: noise (entropy), gradients
    (predictor), few-colors (palette), correlated channels (color
    transform)."""
    rnd = random.Random(seed)
    kind = seed % 4
    out = bytearray()
    for y in range(h):
        for x in range(w):
            if kind == 0:
                out += bytes(
                    (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256), 255)
                )
            elif kind == 1:
                out += bytes(
                    (x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1), (x + y) % 256, 255)
                )
            elif kind == 2:
                out += bytes([(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 128)][(x + y) % 3])
            else:
                g = (x * 3 + y * 5) % 256
                out += bytes(((g + 30) % 256, g, (g + 200) % 256, 255))
    return bytes(out)


@pytest.mark.parametrize("seed", range(12))
def test_vp8l_decoder_matches_libwebp_encoder(seed: int) -> None:
    w = 1 + seed * 7 % 40 + (3 if seed else 0)
    h = 1 + seed * 5 % 33
    rgba = _pattern_rgba(seed, w, h)
    data = _LW.encode_lossless_rgba(w, h, rgba)
    ow, oh, oracle = _LW.decode_rgba(data)
    assert (ow, oh) == (w, h)
    mw, mh, ch, mine = _vp8l_pixels(data)
    assert (mw, mh, ch) == (w, h, 4)
    assert mine == oracle == rgba  # lossless: everyone agrees on the source


@pytest.mark.parametrize("seed", range(8))
def test_vp8l_encoder_accepted_by_libwebp(seed: int) -> None:
    rnd = random.Random(100 + seed)
    w, h = 1 + seed * 3 % 17, 1 + seed * 11 % 13
    grid = {}
    for y in range(h):
        for x in range(w):
            if seed % 2:
                grid[(x, y)] = ((x * 17 + y * 31) % 256, (x + y * 7) % 256, (x * 5) % 256)
            else:
                grid[(x, y)] = (
                    rnd.randrange(256),
                    rnd.randrange(256),
                    rnd.randrange(256),
                )
    data = encode_webp_lossless(w, h, lambda x, y: grid[(x, y)])
    ow, oh, oracle = _LW.decode_rgba(data)
    exp = bytes(v for y in range(h) for x in range(w) for v in (*grid[(x, y)], 255))
    assert (ow, oh) == (w, h)
    assert oracle == exp


# --------------------------------------------------------------- VP8 (lossy)

import math
import struct

from data_lake_skyfit_spark.llm.vp8 import (
    decode_vp8_keyframe,
    encode_webp_vp8_flat,
    vp8_flat_expected,
)


def _vp8_chunk(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        cid = webp[pos : pos + 4]
        (size,) = struct.unpack_from("<I", webp, pos + 4)
        if cid == b"VP8 ":
            return webp[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _lossy_rgb(seed: int, w: int, h: int) -> bytes:
    """Content families that drive the reference encoder through
    B_PRED vs 16x16 modes, segmentation, and loop-filter levels."""
    rnd = random.Random(1000 + seed)
    kind = seed % 6
    out = bytearray()
    for y in range(h):
        for x in range(w):
            if kind == 0:
                out += bytes((rnd.randrange(256),) * 3)
            elif kind == 1:
                out += bytes((x * 7 % 256, y * 11 % 256, (x ^ y) % 256))
            elif kind == 2:
                v = int(128 + 120 * math.sin(x / 5.0) * math.cos(y / 7.0))
                out += bytes((v, 255 - v, (v * 3) % 256))
            elif kind == 3:
                out += bytes((250 if (x + y) % 2 else 5,) * 3)
            elif kind == 4:
                out += bytes((30, 60, 90) if x < w // 2 else (200, 150, 100))
            else:
                out += bytes(
                    (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
                )
    return bytes(out)


@pytest.mark.parametrize("seed", range(18))
def test_vp8_decoder_matches_libwebp_reference(seed: int) -> None:
    rnd = random.Random(seed)
    w = rnd.choice([16, 17, 24, 31, 48, 63, 80, 120])
    h = rnd.choice([16, 19, 20, 33, 48, 60, 96])
    q = [0.0, 15.0, 35.0, 55.0, 80.0, 100.0][seed % 6]
    data = _LW.encode_lossy_rgb(w, h, _lossy_rgb(seed, w, h), q)
    ow, oh, oy, ou, ov = _LW.decode_yuv(data)
    mw, mh, my, mu, mv = decode_vp8_keyframe(_vp8_chunk(data))
    assert (mw, mh) == (ow, oh) == (w, h)
    assert my == oy
    assert mu == ou
    assert mv == ov


@pytest.mark.parametrize("rid", [0, 9, 31, 77, 200, 444])
def test_vp8_encoder_accepted_by_libwebp(rid: int) -> None:
    w, h = 16 + rid % 49, 16 + rid % 33
    qi = (8, 24, 48, 80)[rid % 4]
    ty, tu, tv = 1 + rid % 40, 1 + rid % 12, 1 + (rid // 3) % 12
    data = encode_webp_vp8_flat(w, h, qindex=qi, y2dc_token=ty, u_token=tu, v_token=tv)
    ow, oh, oy, ou, ov = _LW.decode_yuv(data)
    ey, eu, ev = vp8_flat_expected(qi, ty, tu, tv)
    assert (ow, oh) == (w, h)
    assert set(oy) == {ey}
    assert set(ou) == {eu}
    assert set(ov) == {ev}


@pytest.mark.parametrize("trial", range(12))
def test_vp8_loop_filters_match_libwebp(trial: int) -> None:
    """Per-MB level steps + explicit filter configs: the only way to
    exercise the SIMPLE loop filter (libwebp's encoder never emits it)
    and the normal filter's sharpness/hev branches on content they
    actually modify.  libwebp's decoder is the arbiter."""
    from data_lake_skyfit_spark.llm.vp8 import decode_vp8_keyframe, encode_vp8_mb_frame

    rnd = random.Random(500 + trial)
    w = rnd.choice([32, 48, 33, 64])
    h = rnd.choice([32, 48, 35])
    mbs = ((w + 15) // 16) * ((h + 15) // 16)
    data = encode_vp8_mb_frame(
        w,
        h,
        qindex=rnd.choice([8, 24, 48, 80, 120]),
        y2_tokens=[rnd.randrange(0, 40) for _ in range(mbs)],
        u_token=rnd.randrange(0, 12),
        v_token=rnd.randrange(0, 12),
        filter_level=rnd.choice([1, 10, 32, 63]),
        filter_type=trial % 2,
        sharpness=rnd.choice([0, 3, 7]),
    )
    ow, oh, oy, ou, ov = _LW.decode_yuv(data)
    (size,) = struct.unpack_from("<I", data, 16)
    mw, mh, my, mu, mv = decode_vp8_keyframe(data[20 : 20 + size])
    assert (mw, mh) == (ow, oh) == (w, h)
    assert my == oy
    assert mu == ou
    assert mv == ov
