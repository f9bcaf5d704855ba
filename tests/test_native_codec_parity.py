"""Cross-validation of the pure-Python JPEG / PNG / GIF codecs against
the system reference libraries via tests/libgd_oracle.py (libgd wraps
libjpeg.so.62 and libpng16; GIF is gd's own reference-grade codec).

Extends the r6 libwebp-oracle discipline (CLAUDE.md: check for a
system reference implementation BEFORE trusting hand goldens alone)
to three more graded formats, in BOTH directions:

* repo-ENCODED payloads must decode correctly in the reference
  (pins the emitted wire form — the GIF-LZW-width-transition lesson),
* reference-ENCODED payloads must decode correctly in the repo
  (pins every table/convention the decoder assumes).

Tolerance contract: GIF and PNG are lossless — byte-exact both ways.
JPEG decoding is spec-conforming within IDCT rounding, so same-stream
cross-decoder comparisons allow ±1; chroma upsampling is a decoder
CHOICE (libjpeg fancy/triangle vs this repo's box/replicate — both
conforming), so color 4:2:0 comparisons use gray or smooth chroma
where the upsampler contributes ≤ a few codes, and the gray-content
case (flat chroma) isolates the luma Huffman/dequant/IDCT wire to ±1.
"""

import pytest

import data_lake_skyfit_spark.llm.multimodal as M

from .libgd_oracle import load

_GD = load()

pytestmark = pytest.mark.skipif(_GD is None, reason="libgd not present")


def _grid(w, h, fn):
    return [fn(x, y) for y in range(h) for x in range(w)]


# ---------------------------------------------------------------------------
# GIF — lossless, byte-exact both directions


def test_gif_repo_encode_reference_decode_exact():
    pal = [((7 * i) % 256, (11 * i) % 256, (13 * i) % 256) for i in range(256)]
    for w, h, pix in [
        (23, 17, lambda x, y: (x * 5 + y * 9) % 256),
        (8, 64, lambda x, y: (x * x + y) % 256),
        (1, 1, lambda x, y: 77),
    ]:
        data = M.encode_gif(w, h, pix, palette=pal)
        assert _GD.decode_rgb("gif", data, w, h) == _grid(w, h, lambda x, y: pal[pix(x, y)])


def test_gif_reference_encode_repo_decode_exact():
    for w, h, rgb in [
        (19, 13, lambda x, y: ((x * 16) % 256, (y * 24) % 256, ((x + y) * 8) % 256)),
        (33, 7, lambda x, y: (255 - x * 7 % 256, x % 2 * 255, y * 30 % 256)),
    ]:
        payload = _GD.encode("gif", w, h, rgb)
        gw, gh, palette, idx = M._gif_pixels(payload)
        assert (gw, gh) == (w, h)
        mine = [tuple(palette[i]) for i in idx]
        # gd's palettizer quantizes, so ground truth is gd's OWN
        # read-back of the same bytes — both decoders must agree on
        # what the stream says, whatever the encoder chose to write
        assert mine == _GD.decode_rgb("gif", payload, w, h)


# ---------------------------------------------------------------------------
# PNG — lossless, byte-exact both directions


def test_png_repo_encode_reference_decode_exact():
    # RGB
    data = M.encode_png(11, 9, lambda x, y, c: (x * 3 + y * 7 + c * 31) % 256, channels=3)
    assert _GD.decode_rgb("png", data, 11, 9) == _grid(
        11, 9, lambda x, y: tuple((x * 3 + y * 7 + c * 31) % 256 for c in range(3))
    )
    # grayscale (color type 0) → reference sees r=g=b
    g = M.encode_png(13, 5, lambda x, y, c: (x * 17 + y * 3) % 256, channels=1)
    assert _GD.decode_rgb("png", g, 13, 5) == _grid(
        13, 5, lambda x, y: ((x * 17 + y * 3) % 256,) * 3
    )
    # palette (color type 3)
    pal = [(i, (i * 3) % 256, (i * 7) % 256) for i in range(64)]
    p = M.encode_png(10, 10, lambda x, y, c: (x + y) % 64, palette=pal)
    assert _GD.decode_rgb("png", p, 10, 10) == _grid(
        10, 10, lambda x, y: pal[(x + y) % 64]
    )


def test_png_reference_encode_repo_decode_exact():
    rgb = lambda x, y: ((x * 16) % 256, (y * 24) % 256, ((x + y) * 8) % 256)
    payload = _GD.encode("png", 14, 10, rgb)
    pw, ph, ch, rows = M._png_pixels(payload)
    assert (pw, ph, ch) == (14, 10, 3)
    mine = [tuple(rows[y][x * 3 : x * 3 + 3]) for y in range(ph) for x in range(pw)]
    assert mine == _grid(14, 10, rgb)


# ---------------------------------------------------------------------------
# JPEG — reference = libjpeg.so.62 behind gd


def test_jpeg_repo_encode_reference_decode_within_idct_rounding():
    # grayscale: reference must agree within ±1 and keep r=g=b
    jd = M.encode_jpeg(24, 16, lambda x, y: (x * 7 + y * 11) % 256)
    _, _, _, mine = M._jpeg_pixels(jd)
    got = _GD.decode_rgb("jpeg", jd, 24, 16)
    assert max(max(p) - min(p) for p in got) == 0
    assert max(abs(got[i][0] - mine[i]) for i in range(24 * 16)) <= 1
    # color 4:4:4 with constant chroma: no upsampling in play
    jc = M.encode_jpeg(24, 16, lambda x, y: (x * 5 + y * 3) % 256, color=True, cb=90, cr=160)
    _, _, _, mine = M._jpeg_pixels(jc)
    got = _GD.decode_rgb("jpeg", jc, 24, 16)
    assert max(abs(got[i][c] - mine[3 * i + c]) for i in range(24 * 16) for c in range(3)) <= 1
    # 4:2:0 with restart markers, constant chroma (both upsamplers
    # are exact on flat chroma)
    js = M.encode_jpeg(32, 32, lambda x, y: (x * x + y * 5) % 256,
                       color=True, subsample=True, cb=100, cr=140,
                       restart_interval=2)
    _, _, _, mine = M._jpeg_pixels(js)
    got = _GD.decode_rgb("jpeg", js, 32, 32)
    assert max(abs(got[i][c] - mine[3 * i + c]) for i in range(32 * 32) for c in range(3)) <= 1


def test_jpeg_reference_encode_repo_decode():
    # gray content → flat chroma → the luma wire (Huffman tables,
    # zigzag, dequant, IDCT) is isolated to IDCT rounding
    for q in (70, 85, 95):
        g = lambda x, y: ((x * 13 + y * 7) % 200 + 20,) * 3
        jg = _GD.encode("jpeg", 24, 24, g, quality=q)
        mw, mh, mch, mine = M._jpeg_pixels(jg)
        assert (mw, mh, mch) == (24, 24, 3)
        got = _GD.decode_rgb("jpeg", jg, 24, 24)
        assert max(
            abs(got[i][c] - mine[3 * i + c]) for i in range(24 * 24) for c in range(3)
        ) <= 1, f"quality {q}"
    # smooth color: upsampler divergence (fancy vs box, both
    # conforming) bounded to a few codes
    smooth = lambda x, y: (100 + x * 2 + y, 80 + x, 60 + y * 2)
    js = _GD.encode("jpeg", 20, 20, smooth, quality=85)
    _, _, _, mine = M._jpeg_pixels(js)
    got = _GD.decode_rgb("jpeg", js, 20, 20)
    assert max(
        abs(got[i][c] - mine[3 * i + c]) for i in range(400) for c in range(3)
    ) <= 5
    # flat color decodes identically
    jf = _GD.encode("jpeg", 16, 16, lambda x, y: (90, 140, 200), quality=90)
    _, _, _, mine = M._jpeg_pixels(jf)
    got = _GD.decode_rgb("jpeg", jf, 16, 16)
    assert all(got[i] == tuple(mine[3 * i : 3 * i + 3]) for i in range(256))


# ---------------------------------------------------------------------------
# TIFF — reference = libtiff.so.6 (file-based API; the callback/varargs
# ABI is avoided except TIFFSetField's int-promoted scalars)


def _load_libtiff():
    try:
        lib = ctypes.CDLL(ctypes.util.find_library("tiff") or "libtiff.so.6")
    except OSError:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFSetField.restype = ctypes.c_int
    lib.TIFFWriteScanline.restype = ctypes.c_int
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint16,
    ]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
    ]
    lib.TIFFClose.restype = None
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    return lib


import ctypes
import ctypes.util

_TIFF = _load_libtiff()


@pytest.mark.skipif(_TIFF is None, reason="libtiff not present")
def test_tiff_repo_encode_reference_decode_exact(tmp_path):
    w, h = 13, 9
    fn = lambda x, y, c: (x * 7 + y * 11 + c * 29) % 256
    for be in (False, True):
        data = M.encode_tiff(w, h, fn, channels=3, big_endian=be)
        p = tmp_path / f"t{be}.tif"
        p.write_bytes(data)
        tif = ctypes.c_void_p(_TIFF.TIFFOpen(str(p).encode(), b"r"))
        assert tif.value, "reference rejected the repo-encoded TIFF"
        buf = (ctypes.c_uint32 * (w * h))()
        ok = _TIFF.TIFFReadRGBAImageOriented(tif, w, h, buf, 1, 0)
        _TIFF.TIFFClose(tif)
        assert ok
        for y in range(h):
            for x in range(w):
                v = buf[y * w + x]
                assert (v & 255, (v >> 8) & 255, (v >> 16) & 255) == (
                    fn(x, y, 0), fn(x, y, 1), fn(x, y, 2)
                ), (be, x, y)


@pytest.mark.skipif(_TIFF is None, reason="libtiff not present")
def test_tiff_reference_encode_repo_decode_exact(tmp_path):
    w, h = 13, 9
    fn = lambda x, y, c: (x * 7 + y * 11 + c * 29) % 256
    p = tmp_path / "ref.tif"
    tif = ctypes.c_void_p(_TIFF.TIFFOpen(str(p).encode(), b"w"))
    assert tif.value

    def setf(tag, val):
        # C varargs promote shorts to int — EVERY scalar tag value must
        # go through c_int or the call reads garbage off the register
        assert _TIFF.TIFFSetField(tif, ctypes.c_uint32(tag), ctypes.c_int(val)) == 1

    setf(256, w); setf(257, h); setf(258, 8); setf(259, 1)  # dims/8bit/none
    setf(262, 2); setf(277, 3); setf(278, 1); setf(284, 1)  # RGB contig
    for y in range(h):
        row = bytes(fn(x, y, c) for x in range(w) for c in range(3))
        assert _TIFF.TIFFWriteScanline(tif, row, y, 0) == 1
    _TIFF.TIFFClose(tif)
    mw, mh, mch, mbytes = M._tiff_pixels(p.read_bytes())
    assert (mw, mh, mch) == (w, h, 3)
    assert all(
        mbytes[(y * w + x) * 3 + c] == fn(x, y, c)
        for y in range(h) for x in range(w) for c in range(3)
    )
