"""AVIF container-layer tests (r9): the av01/av1C HEIF path,
arbitrated in BOTH directions against the system references —

  * libheif (with its aom encoder plugin) writes REAL lossless AVIF
    files; our walker must resolve the container and parse the AV1
    headers to the same structural facts, and dav1d must reproduce
    the original pixels from OUR extracted (av1C config + item data)
    stream — proving the byte plumbing is lossless end-to-end;
  * our fixture writer's containers must be readable by libheif
    (primary handle + dimensions).

The AV1 SYMBOL tier is the r10 frontier; these tests pin every layer
beneath it.
"""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

from data_lake_skyfit_spark.llm import av1
from data_lake_skyfit_spark.llm import multimodal as mm

from . import libav1_oracle, libheif_oracle

_HEIF = libheif_oracle.load()
_DAV1D = libav1_oracle.load_dav1d()

needs_heif = pytest.mark.skipif(_HEIF is None, reason="libheif absent")
needs_both = pytest.mark.skipif(_HEIF is None or _DAV1D is None,
                                reason="libheif/dav1d absent")


def _encode_real_avif(w: int, h: int, y: bytes, cb: bytes,
                      cr: bytes) -> bytes:
    """Lossless AVIF via libheif's aom plugin (min-q/max-q → qindex 0
    → CodedLossless).  NOTE the r9 finding: libheif's own DECODE
    readback of these files is NOT bit-exact (its still pipeline
    normalizes through RGB — the r7d lesson), but the ENCODED stream
    IS lossless: dav1d on the extracted OBUs reproduces the input
    exactly, which is what these tests pin."""
    lib = _HEIF._lib
    lib.heif_encoder_set_parameter.restype = libheif_oracle._HeifError
    lib.heif_encoder_set_parameter.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    ctx = lib.heif_context_alloc()
    enc = ctypes.c_void_p()
    _HEIF._check(lib.heif_context_get_encoder_for_format(
        ctx, 4, ctypes.byref(enc)), "av1 encoder")
    for k, v in ((b"lossless", b"true"), (b"chroma", b"420")):
        _HEIF._check(lib.heif_encoder_set_parameter(enc, k, v), "param")
    img = ctypes.c_void_p()
    _HEIF._check(lib.heif_image_create(w, h, 0, 1, ctypes.byref(img)),
                 "image")
    for ch, (pw, ph, buf) in enumerate(((w, h, y),
                                        (w // 2, h // 2, cb),
                                        (w // 2, h // 2, cr))):
        _HEIF._check(lib.heif_image_add_plane(img, ch, pw, ph, 8), "plane")
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane(img, ch, ctypes.byref(stride))
        for r in range(ph):
            ctypes.memmove(ctypes.addressof(ptr.contents) + r * stride.value,
                           buf[r * pw : (r + 1) * pw], pw)
    handle = ctypes.c_void_p()
    _HEIF._check(lib.heif_context_encode_image(
        ctx, img, enc, None, ctypes.byref(handle)), "encode")
    import os
    import tempfile
    fd, path = tempfile.mkstemp(suffix=".avif")
    os.close(fd)
    try:
        _HEIF._check(lib.heif_context_write_to_file(ctx, path.encode()),
                     "write")
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def _planes(seed: int, w: int, h: int):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes(),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8).tobytes(),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8).tobytes())


@needs_both
@pytest.mark.parametrize("w,h", [(32, 32), (64, 48), (96, 80)])
def test_real_avif_walk_and_lossless_payload_extraction(w, h):
    y, cb, cr = _planes(w + h, w, h)
    data = _encode_real_avif(w, h, y, cb, cr)
    info = mm.parse_avif_info(data)
    assert (info["width"], info["height"]) == (w, h)
    assert info["bit_depth"] == 8 and not info["monochrome"]
    assert (info["subsampling_x"], info["subsampling_y"]) == (1, 1)
    assert info["coded_lossless"] == 1
    # the byte plumbing: config + item data through dav1d == input
    meta = mm._HeifMeta(data)
    props = dict(meta.item_properties(meta.primary))
    stream = mm._parse_av1c(props[b"av1C"]) + meta.item_data(meta.primary)
    got = _DAV1D.decode(stream)[0]
    assert got[2] == y and got[3] == cb and got[4] == cr


@needs_heif
@pytest.mark.parametrize("w,h", [(16, 16), (48, 36), (640, 360)])
def test_libheif_reads_our_fixture_containers(w, h):
    data = mm.encode_avif_fixture(w, h, b"\x55" * 99)
    lib = _HEIF._lib
    ctx = lib.heif_context_alloc()
    try:
        _HEIF._check(lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None), "read")
        handle = ctypes.c_void_p()
        _HEIF._check(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle)), "primary")
        assert lib.heif_image_handle_get_width(handle) == w
        assert lib.heif_image_handle_get_height(handle) == h
    finally:
        lib.heif_context_free(ctx)


def test_fixture_roundtrip_and_battery_closed_forms():
    for rid in (0, 7, 28, 155, 319):
        w, h = 16 + rid % 29, 16 + rid % 23
        n = 40 + rid % 57
        payload = bytes((31 * rid + 7 * i) % 256 for i in range(n))
        data = mm.encode_avif_fixture(w, h, payload)
        info = mm.parse_avif_info(data)
        assert (info["width"], info["height"]) == (w, h)
        assert info["tile_bytes"] == n
        assert info["coded_lossless"] == 1 and info["n_obus"] == 4


def test_avif_rejections():
    with pytest.raises(ValueError):
        mm.parse_avif_info(b"\x00" * 32)
    # a HEIC (hvc1) file is not AVIF
    y, cb, cr = _planes(1, 16, 16)
    heic = mm.encode_heic_fixture(16, 16, y, cb, cr)
    with pytest.raises(ValueError, match="not av01"):
        mm.parse_avif_info(heic)
    # ispe/header disagreement is detected
    good = mm.encode_avif_fixture(32, 32, b"x" * 10)
    idx = good.find(b"ispe")
    bad = bytearray(good)
    bad[idx + 11] = 33  # widen the ispe width byte
    with pytest.raises(ValueError, match="disagrees"):
        mm.parse_avif_info(bytes(bad))


def test_corrupted_avif_raises_not_hangs():
    data = bytearray(mm.encode_avif_fixture(32, 32, b"p" * 80))
    rng = np.random.default_rng(3)
    raised = 0
    for _ in range(300):
        mut = bytearray(data)
        for _ in range(rng.integers(1, 6)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            info = mm.parse_avif_info(bytes(mut))
            assert 0 < info["width"] <= 1 << 16
        except (ValueError, KeyError, IndexError) as _e:
            raised += 1
        except Exception as e:  # struct.error etc — dispatch-ladder types
            import struct as _s
            assert isinstance(e, _s.error), e
            raised += 1
    assert raised > 0
