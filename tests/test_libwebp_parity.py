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
